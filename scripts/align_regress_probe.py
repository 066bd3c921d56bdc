"""Isolate the packed-word aligner regression: time prep and kernel
separately for the char and packed paths on identical data."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from bella_tpu.align import xdrop as xd
from bella_tpu.align.pallas_xdrop import (
    extend_batch_pallas, extend_batch_pallas_packed,
)

rng = np.random.default_rng(0)
B, L = 8192, 8192  # one bench-like kernel batch (2*align_batch rows)
T = rng.integers(0, 4, (B, L), dtype=np.int8)
Q = T.copy()
# mutate ~15% and random lengths so pairs die at realistic steps
mut = rng.random((B, L)) < 0.15
Q[mut] = rng.integers(0, 4, mut.sum(), dtype=np.int8)
tl = rng.integers(500, 4000, B).astype(np.int32)
ql = (tl + rng.integers(-200, 200, B)).clip(16, L).astype(np.int32)
order = np.argsort(tl + ql)
T, Q, tl, ql = T[order], Q[order], tl[order], ql[order]

Tw = xd.pack_words(T)
Qw = xd.pack_words(Q)

Td, Qd = jnp.asarray(T), jnp.asarray(Q)
tld, qld = jnp.asarray(tl), jnp.asarray(ql)
Twd, Qwd = jnp.asarray(Tw), jnp.asarray(Qw)
jax.block_until_ready((Td, Qd, Twd, Qwd, tld, qld))


def _sync(out):
    # relay arrays: block_until_ready returns early; a readback is the sync
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0].ravel()[:1])
    return out


def timeit(name, fn, n=3):
    out = _sync(fn())
    t0 = time.time()
    for _ in range(n):
        out = _sync(fn())
    dt = (time.time() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms")
    return out


o1 = timeit("kernel char  ", lambda: extend_batch_pallas(
    Td, tld, Qd, qld, 7, band=256, max_steps=2 * L))
o2 = timeit("kernel packed", lambda: extend_batch_pallas_packed(
    Twd, tld, Qwd, qld, 7, band=256, max_steps=2 * L))
s1 = np.asarray(o1["score"]); s2 = np.asarray(o2["score"])
print("score agree:", int((s1 == s2).sum()), "/", B)

# prep-only comparison at the bench's tier width
R = 1250
reads8 = rng.integers(0, 4, (R, L), dtype=np.int8)
lens = rng.integers(1000, 8000, R).astype(np.int32)
readsw = xd.pack_words(reads8)
bh = rng.integers(0, R, 4096)
bv = rng.integers(0, R, 4096)
ph = rng.integers(0, 500, 4096).astype(np.int32)
pv = rng.integers(0, 500, 4096).astype(np.int32)
rc = rng.random(4096) < 0.5
r8d = jnp.asarray(reads8); rwd = jnp.asarray(readsw)
lend = jnp.asarray(lens)
bhd, bvd, phd, pvd, rcd = map(jnp.asarray, (bh, bv, ph, pv, rc))
jax.block_until_ready((r8d, rwd))

prep_c = jax.jit(lambda: xd._prepare_extensions(
    r8d, lend, bhd, bvd, phd, pvd, rcd, 17))
prep_w = jax.jit(lambda: xd._prepare_extensions_packed(
    rwd, lend, bhd, bvd, phd, pvd, rcd, 17))
timeit("prep char  ", prep_c)
timeit("prep packed", prep_w)
