"""Time _fused_emit_packed + chain sort with and without lag_sizes at
140 Mbp scale, on synthetic compacted reliable rows with a realistic
count distribution."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from bella_tpu.overlap import pairs as pp

rng = np.random.default_rng(0)
n = 13_359_903
size = min(pp._size_bucket(max(n, 1 << 14)), 1 << 31)
# segment counts: geometric-ish over [2..8] matching the bench S_d decay
cnts = rng.choice(np.arange(2, 9), size=n // 3,
                  p=np.array([0.62, 0.22, 0.08, 0.04, 0.02, 0.013, 0.007]))
cnts = cnts[np.cumsum(cnts) <= n]
rows_c = np.repeat(cnts, cnts)
n = len(rows_c)  # actual rows from whole segments
# count-DESC order as _compact_sort produces
order = np.argsort(-rows_c, kind="stable")
rows_c = rows_c[order]
rank = np.concatenate([np.arange(c) for c in cnts])[order].astype(np.int32)
sr = rng.integers(0, 23000, size).astype(np.int32)
sp = rng.integers(0, 16000, size).astype(np.int32)
sc = rng.random(size) < 0.5
rk = np.zeros(size, np.int32); rk[:n] = rank
lens = rng.integers(1000, 19000, 23338).astype(np.int32)

size = min(pp._size_bucket(max(n, 1 << 14)), 1 << 31)
S = [n] + [int((rows_c > d).sum()) for d in range(2, 8)]
print("S_d:", S)
lag_sizes, prev = [], size
for d in range(1, 8):
    sd = S[d - 1] if d - 1 < len(S) else 0
    b = 1 << max(10, int(sd - 1).bit_length()) if sd > 0 else 1 << 10
    b = min(b, prev, size)
    lag_sizes.append(b)
    prev = b
print("lag_sizes:", lag_sizes)

srd = jnp.asarray(sr); spd = jnp.asarray(sp); scd = jnp.asarray(sc)
rkd = jnp.asarray(rk); ld = jnp.asarray(lens)
nr = jnp.int32(n)


def run(tag, lag):
    def f():
        hv, k3, pv, nl = pp._fused_emit_packed(
            nr, srd, spd, scd, rkd, ld, kmer_size=17, upper=8,
            bin_size=500, lag_sizes=lag)
        hv, k3, pv = pp._chain_sort_packed(hv, k3, pv)
        return hv
    out = f(); np.asarray(out[:1])
    t0 = time.time()
    out = f(); np.asarray(out[:1])
    print(f"{tag}: {(time.time()-t0)*1e3:.0f} ms  rows={out.shape[0]}")


run("emit+chainsort FULL ", ())
run("emit+chainsort SLICED", tuple(lag_sizes))
