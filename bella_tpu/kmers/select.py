"""Sparse k-mer selection: canonical-strand minimizers and syncmers.

Replaces the reference's sequential monotone-deque winnowing
(include/minimizer.hpp:49-77) and per-kmer syncmer test
(include/syncmer.hpp:49-79) with vectorized sliding-window reductions
over the flat occurrence stream. Selection runs BEFORE counting, so the
fused count+build pipeline then operates on the sparser stream — the
same observable behavior as MinimizerCount/SyncmerCount feeding the
reliable dictionary (include/kmercount.hpp:691-832,846-986) plus the
minimizer-only tuple build (src/main.cpp:363-389).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bella_tpu.config import BellaConfig
from bella_tpu.io.fastq import ReadSet
from bella_tpu.kmers.count import SENTINEL, KmerOccurrences
from bella_tpu.seq.encode import hash64, pack_kmers, revcomp_kmer

_U64 = jnp.uint64
_MAXU64 = jnp.asarray(np.uint64(0xFFFFFFFFFFFFFFFF))


def minimizer_mask(occ: KmerOccurrences, window: int) -> jnp.ndarray:
    """True at positions selected as robust-winnowing canonical-strand
    minimizers (order = hash of the canonical k-mer, ties -> rightmost,
    include/minimizer.hpp:23-26 + furtherPop semantics)."""
    n = occ.size
    valid = occ.kmers != jnp.asarray(SENTINEL)
    key = jnp.where(valid, hash64(occ.kmers), _MAXU64)
    pos = jnp.arange(n, dtype=jnp.int32)

    best_key = key
    best_pos = pos
    # windowed rightmost-argmin: w-1 shifted comparisons
    for t in range(1, window):
        cand_key = jnp.concatenate([jnp.full((t,), _MAXU64, _U64), key[:-t]])
        cand_pos = jnp.concatenate([jnp.full((t,), -1, jnp.int32), pos[:-t]])
        cand_read = jnp.concatenate(
            [jnp.full((t,), -1, jnp.int32), occ.read_ids[:-t]]
        )
        ok = cand_read == occ.read_ids
        cand_key = jnp.where(ok, cand_key, _MAXU64)
        # min by key; ties keep the RIGHTmost position = current best
        # (cand is always to the left, so strict < only)
        take = cand_key < best_key
        best_key = jnp.where(take, cand_key, best_key)
        best_pos = jnp.where(take, cand_pos, best_pos)

    # a position is sampled if it wins the window ending at any valid i
    # (index n = definitely out of bounds -> dropped by the scatter)
    winners = jnp.where(valid, best_pos, n)
    mask = jnp.zeros((n,), bool).at[winners].set(True, mode="drop")
    return mask & valid


def syncmer_mask(occ: KmerOccurrences, reads: ReadSet, config: BellaConfig) -> jnp.ndarray:
    """True where the canonical k-mer is an (open-ish) syncmer: no
    interior s-mer hashes strictly below both boundary s-mers
    (include/syncmer.hpp:49-68). s-mers are taken on the canonical
    strand, so for reverse-canonical positions the s-mer at offset i is
    the reverse complement of the forward s-mer at offset k-s-i."""
    k, s = config.kmer_size, config.smer_len
    codes = jnp.asarray(reads.codes)
    n = occ.size
    if n == 0:
        return jnp.zeros((0,), bool)
    fw = pack_kmers(codes, s)
    rc = revcomp_kmer(fw, s)
    hf = hash64(fw)
    hr = hash64(rc)
    m = int(hf.shape[0])

    def smer_hash(i: int):
        # hash of the canonical k-mer's s-mer at offset i, per position p
        idx_f = jnp.arange(n, dtype=jnp.int64) + i
        idx_r = jnp.arange(n, dtype=jnp.int64) + (k - s - i)
        a = hf[jnp.clip(idx_f, 0, m - 1)]
        b = hr[jnp.clip(idx_r, 0, m - 1)]
        return jnp.where(occ.is_rc, b, a)

    first = smer_hash(0)
    last = smer_hash(k - s)
    interior = jnp.full((n,), 0xFFFFFFFFFFFFFFFF, dtype=_U64)
    for i in range(1, k - s):
        interior = jnp.minimum(interior, smer_hash(i))
    reject = (interior < first) & (interior < last)
    return (~reject) & (occ.kmers != jnp.asarray(SENTINEL))


def select_occurrences(
    occ: KmerOccurrences, reads: ReadSet, config: BellaConfig
) -> KmerOccurrences:
    """Apply the configured sparse selection to the occurrence stream
    (non-selected positions become SENTINEL padding)."""
    if config.use_syncmer:
        mask = syncmer_mask(occ, reads, config)
    elif config.use_minimizer:
        mask = minimizer_mask(occ, config.window_len)
    else:
        return occ
    return dataclasses.replace(
        occ,
        kmers=jnp.where(mask, occ.kmers, jnp.asarray(SENTINEL)),
        is_rc=occ.is_rc & mask,
    )
