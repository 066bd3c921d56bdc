"""Focused packed-kernel timing probe for step-body experiments.

Usage: python scripts/kernel_probe.py [band [bb [B]]]
Times extend_batch_pallas_packed on the standard 8192-pair mixed-length
batch (the align_regress_probe workload) and prints ms/call + checksum
(the score sum — variants must keep it identical)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

band = int(sys.argv[1]) if len(sys.argv) > 1 else 256
bb = int(sys.argv[2]) if len(sys.argv) > 2 else 0
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
if bb:
    os.environ["BELLA_PALLAS_BB"] = str(bb)

from bella_tpu.align import xdrop as xd
from bella_tpu.align.pallas_xdrop import extend_batch_pallas_packed

rng = np.random.default_rng(0)
L = 8192
T = rng.integers(0, 4, (B, L), dtype=np.int8)
Q = T.copy()
mut = rng.random((B, L)) < 0.15
Q[mut] = rng.integers(0, 4, mut.sum(), dtype=np.int8)
tl = rng.integers(500, 4000, B).astype(np.int32)
ql = (tl + rng.integers(-200, 200, B)).clip(16, L).astype(np.int32)
order = np.argsort(tl + ql)
T, Q, tl, ql = T[order], Q[order], tl[order], ql[order]

Twd = jnp.asarray(xd.pack_words(T))
Qwd = jnp.asarray(xd.pack_words(Q))
tld, qld = jnp.asarray(tl), jnp.asarray(ql)
jax.block_until_ready((Twd, Qwd, tld, qld))


def _sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return out


def run():
    return extend_batch_pallas_packed(
        Twd, tld, Qwd, qld, 7, band=band, max_steps=2 * L
    )


t0 = time.time()
out = _sync(run())
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
dts = []
for _ in range(5):
    t0 = time.time()
    out = _sync(run())
    dts.append(time.time() - t0)
dt = sorted(dts)[2]
s = np.asarray(out["score"])
te = np.asarray(out["t_end"]); qe = np.asarray(out["q_end"])
print(
    f"band={band} bb={bb or 'default'} B={B}: {dt*1e3:.1f} ms "
    f"(all: {' '.join(f'{d*1e3:.0f}' for d in sorted(dts))})\n"
    f"checksum score={int(s.sum())} te={int(te.sum())} qe={int(qe.sum())}"
)
