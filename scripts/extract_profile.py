"""Piecewise profile of _extract_kmers_phased internals on the TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from bella_tpu.io.simulate import random_genome, sample_reads
from bella_tpu.overlap import pairs as pp
from bella_tpu.seq.encode import canonical_from_window

_U64 = pp._U64

g = random_genome(300_000, seed=0)
reads, _ = sample_reads(g, 300_000 * 25 // 6000, mean_len=6000,
                        min_len=1000, error_rate=0.15, seed=1)
k = 17
total = len(reads.codes)
total_p = pp._size_bucket(total)
codes = np.concatenate([reads.codes, np.zeros(total_p - total, reads.codes.dtype)])
lengths = np.append(reads.lengths.astype(np.int32), np.int32(total_p - total))
offsets = np.append(reads.offsets.astype(np.int32), np.int32(total_p))
c4 = codes.reshape(-1, 4).astype(np.uint8)
cb = np.concatenate([c4[:, 0] | (c4[:, 1] << 2) | (c4[:, 2] << 4) | (c4[:, 3] << 6),
                     np.zeros(8, np.uint8)])
cbj = jnp.asarray(cb)
off32 = jnp.asarray(offsets.astype(np.int32))
mb = cb.shape[0] - 8
print("mb:", mb)


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(leaves[0].ravel()[:1])
    return x


def t(label, f, *a, **kw):
    sync(f(*a, **kw))
    t0 = time.perf_counter()
    out = sync(f(*a, **kw))
    print(f"{label}: {(time.perf_counter()-t0)*1e3:.1f} ms")
    return out


@jax.jit
def build_w(codes_bytes):
    b64 = codes_bytes.astype(_U64)
    def body(tt, w):
        return w | (jax.lax.dynamic_slice(b64, (tt,), (mb,)) << (_U64(8) * tt.astype(_U64)))
    return jax.lax.fori_loop(0, 8, body, jnp.zeros((mb,), _U64))


@jax.jit
def rid_scatter4(off32):
    ind4 = jnp.zeros((4, mb), jnp.int32)
    for s in range(4):
        j0 = jnp.maximum(off32[:-1] - s + 3, 0) >> 2
        ind4 = ind4.at[s, j0].add(1, mode="drop")
    return ind4


@jax.jit
def rid_scatter1(off32):
    o = off32[:-1]
    idx = jnp.concatenate([
        (jnp.maximum(o - s + 3, 0) >> 2) + jnp.int32(s * mb) for s in range(4)
    ])
    flat = jnp.zeros((4 * mb,), jnp.int32).at[idx].add(1, mode="drop")
    return flat.reshape(4, mb)


@jax.jit
def scan4(ind4):
    x = ind4
    d = 1
    while d < mb:
        x = x + jnp.concatenate(
            [jnp.zeros((4, d), jnp.int32), x[:, :-d]], axis=1)
        d <<= 1
    return x


@partial(jax.jit, static_argnames=("s",))
def canon_phase(W, s: int):
    return canonical_from_window(W >> _U64(2 * s), k)


@jax.jit
def canon_all(W):
    outs = [canonical_from_window(W >> _U64(2 * s), k) for s in range(4)]
    khi = jnp.concatenate([(c >> _U64(32)).astype(jnp.uint32) for c, _ in outs])
    klo = jnp.concatenate([c.astype(jnp.uint32) for c, _ in outs])
    rc = jnp.concatenate([r for _, r in outs])
    return khi, klo, rc


W = t("W build", build_w, cbj)
i4 = t("rid scatter x4", rid_scatter4, off32)
i1 = t("rid scatter x1 flat", rid_scatter1, off32)
print("scatter agree:", bool(jnp.array_equal(i4, i1)))
x = t("rid scan (4,mb)", scan4, i4)
t("canon 1 phase", canon_phase, W, s=0)
t("canon all + concat", canon_all, W)
t("full extractor", pp._extract_kmers_phased, cbj,
  jnp.asarray(lengths), off32, jnp.int32(reads.num_reads),
  kmer_size=k, pack_ridpos=True)
