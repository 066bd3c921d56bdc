"""Measure sort primitives on the TPU to size the bitonic-merge design:
1. lax.sort 4-operand 1-D (current pipeline primitive)
2. lax.sort along last axis of (T, B) tiles (tile-sort stage)
3. one jnp compare-exchange pass (merge-pass building block)
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

N = 1 << 23  # 8.4M
rng = np.random.default_rng(0)
k1 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
k2 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
p1 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
p2 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))

def _sync(out):
    # the axon relay's block_until_ready is a no-op: force completion
    # with a tiny readback of every result leaf
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0][..., :8])

def timeit(f, *args, reps=3):
    out = f(*args); _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        _sync(out)
    return (time.perf_counter() - t0) / reps

@jax.jit
def sort4(a, b, c, d):
    return jax.lax.sort((a, b, c, d), num_keys=2)

@jax.jit
def sort1(a):
    return jax.lax.sort(a)

@partial(jax.jit, static_argnames=("bt",))
def tile_sort(a, b, c, d, bt):
    sh = (-1, bt)
    o = jax.lax.sort(tuple(x.reshape(sh) for x in (a, b, c, d)), num_keys=2, dimension=1)
    return tuple(x.reshape(-1) for x in o)

def lex_gt(a1, a2, b1, b2):
    return (a1 > b1) | ((a1 == b1) & (a2 > b2))

@partial(jax.jit, static_argnames=("d", "passes"))
def cmp_exchange(a, b, c, e, d, passes):
    # straight compare-exchange at distance d, repeated `passes` times
    for _ in range(passes):
        sh = (-1, 2, d)
        ops = [x.reshape(sh) for x in (a, b, c, e)]
        A = [o[:, 0, :] for o in ops]
        B = [o[:, 1, :] for o in ops]
        swap = lex_gt(A[0], A[1], B[0], B[1])
        lo = [jnp.where(swap, y, x) for x, y in zip(A, B)]
        hi = [jnp.where(swap, x, y) for x, y in zip(A, B)]
        a, b, c, e = [
            jnp.stack([l, h], axis=1).reshape(-1) for l, h in zip(lo, hi)
        ]
    return a, b, c, e

print("devices:", jax.devices())
t = timeit(sort4, k1, k2, p1, p2)
print(f"lax.sort 4-op 1-D {N} rows: {t*1e3:.1f} ms  ({t/N*1e9:.2f} ns/row)")
t = timeit(sort1, k1)
print(f"lax.sort 1-op 1-D: {t*1e3:.1f} ms")
for bt in (1 << 13, 1 << 16):
    t = timeit(partial(tile_sort, bt=bt), k1, k2, p1, p2)
    print(f"tile lax.sort 4-op ({N//bt}x{bt}): {t*1e3:.1f} ms")
for d in (1 << 4, 1 << 10, 1 << 16, 1 << 20):
    t = timeit(partial(cmp_exchange, d=d, passes=8), k1, k2, p1, p2)
    print(f"cmp-exchange 4-op d={d} (8 passes): {t*1e3:.1f} ms -> {t/8*1e3:.2f} ms/pass")
