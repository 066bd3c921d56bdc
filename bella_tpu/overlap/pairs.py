"""Candidate-pair generation: the A @ A^T SpGEMM with a positional semiring.

TPU-first re-design of the reference HashSpGEMM + chaining stack
(include/overlap.hpp:651, include/chain.hpp, include/common/common.h:119-183).

Key observation: reliable k-mers have multiplicity <= upper_freq (8 by
default), so each k-mer segment of the k-mer-major occurrence stream
expands into at most U*(U-1)/2 read pairs. The whole SpGEMM is therefore:

  1. EMIT   - for lag d in 1..U-1, pair occurrence i with occurrence i-d
              of the same k-mer segment (static U-1 shifted slices; no
              hash tables, no dynamic shapes),
  2. SORT   - one lexicographic device sort by (pair, bin, posH),
  3. REDUCE - segmented scans implement the chainop/choose semiring:
              bin shared k-mers by overlap estimate, majority-vote the
              bin, emit one seed per pair.

Lower-triangular-only output (row read > column read) mirrors
include/overlap.hpp:315-316. The semiring semantics follow chain.hpp:
  - overlapop (chain.hpp:48-71): strand via seed equality, overlap
    estimate = min margins + k,
  - chainop  (chain.hpp:101-150): k-mers whose estimates agree within
    bin_size vote together; k-mers closer than kmer_size in both
    coordinates are duplicates,
  - choose/chain (common.h:142-170): the most-supported bin wins, its
    first k-mer is the alignment seed.
Binning here is by quantized estimate (ov // bin_size) instead of the
reference's data-order greedy merge: deterministic, order-free, and
equivalent in aggregate (validated by recall/precision parity tests).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bella_tpu.config import BellaConfig
from bella_tpu.kmers.count import ReliableTriples
from bella_tpu.utils import segments as seg

_U64 = jnp.uint64
PAIR_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


@dataclasses.dataclass
class CandidatePairs:
    """One row per candidate read pair (H = larger read id = "row" read,
    V = smaller = "column" read, matching RunPairWiseAlignments rid/cid,
    include/overlap.hpp:533-537)."""

    read_h: np.ndarray    # (P,) int32
    read_v: np.ndarray    # (P,) int32
    pos_h: np.ndarray     # (P,) int32 seed k-mer start on H (raw coords)
    pos_v: np.ndarray     # (P,) int32 seed k-mer start on V
    count: np.ndarray     # (P,) int32 total shared k-mer occurrences
    matches: np.ndarray   # (P,) int32 support of the winning bin
    overlap_est: np.ndarray  # (P,) int32 overlap estimate of the seed
    seed_rc: np.ndarray   # (P,) bool  seed strands disagree -> 'c' strand

    @property
    def num_pairs(self) -> int:
        return int(self.read_h.shape[0])


@partial(jax.jit, static_argnames=("upper_freq", "kmer_size", "bin_size"))
def _emit_and_chain(
    kmer_ids, read_ids, positions, is_rc, read_lengths,
    upper_freq: int, kmer_size: int, bin_size: int,
):
    """Device kernel: occurrence stream (k-mer-major) -> per-element
    chained pair stream + seed mask. See module docstring."""
    m = kmer_ids.shape[0]
    k = kmer_size

    kb = seg.boundaries(kmer_ids)
    rank = seg.seg_rank(kb)
    valid_occ = kmer_ids >= 0

    # ---- EMIT: U-1 shifted slices ----
    keys, phs, pvs, rchs, rcvs = [], [], [], [], []
    for d in range(1, upper_freq):
        ra, rb = read_ids[d:], read_ids[:-d]
        pa, pb = positions[d:], positions[:-d]
        ca, cb = is_rc[d:], is_rc[:-d]
        ok = (rank[d:] >= d) & (ra != rb) & valid_occ[d:]
        h_is_a = ra > rb
        h = jnp.where(h_is_a, ra, rb)
        v = jnp.where(h_is_a, rb, ra)
        key = (h.astype(_U64) << _U64(32)) | v.astype(_U64)
        keys.append(jnp.where(ok, key, jnp.asarray(PAIR_SENTINEL)))
        phs.append(jnp.where(h_is_a, pa, pb))
        pvs.append(jnp.where(h_is_a, pb, pa))
        rchs.append(jnp.where(h_is_a, ca, cb))
        rcvs.append(jnp.where(h_is_a, cb, ca))

    key = jnp.concatenate(keys)
    pos_h = jnp.concatenate(phs).astype(jnp.int32)
    pos_v = jnp.concatenate(pvs).astype(jnp.int32)
    rc_h = jnp.concatenate(rchs)
    rc_v = jnp.concatenate(rcvs)

    # ---- per-candidate semiring "multiply": strand + overlap estimate
    # (overlapop, chain.hpp:48-71) ----
    h = (key >> _U64(32)).astype(jnp.int32)
    v = key.astype(jnp.int32)  # low 32 bits; junk for sentinels (masked)
    len_h = read_lengths[jnp.clip(h, 0, read_lengths.shape[0] - 1)]
    len_v = read_lengths[jnp.clip(v, 0, read_lengths.shape[0] - 1)]
    flip = rc_h != rc_v
    beg_h = jnp.where(flip, len_h - pos_h - k, pos_h)
    ov = (
        jnp.minimum(beg_h, pos_v)
        + jnp.minimum(len_h - (beg_h + k), len_v - (pos_v + k))
        + k
    ).astype(jnp.int32)
    bin_id = (ov // bin_size).astype(jnp.int32)

    # ---- SORT by (pair, bin, posH) ----
    key, bin_id, pos_h, pos_v, flip, ov = jax.lax.sort(
        (key, bin_id, pos_h, pos_v, flip, ov), num_keys=3
    )
    live = key != jnp.asarray(PAIR_SENTINEL)

    # ---- REDUCE: chainop + choose via segmented scans ----
    pair_b = seg.boundaries(key)
    bin_b = seg.boundaries2(key, bin_id)

    # support counts well-separated k-mers: the reference only counts a
    # k-mer when it is > kmer_size from the bin's kept k-mers in both
    # coordinates (distance predicate, chain.hpp:89-97,121). Order-free
    # TPU equivalent: count distinct posH // (k+1) buckets per bin
    # (a dense run of n consecutive shared k-mers contributes ~n/(k+1)
    # support, matching the greedy-spacing count).
    bucket = pos_h // (k + 1)
    prev_bucket = jnp.concatenate([bucket[:1], bucket[:-1]])
    dup = (~bin_b) & (bucket == prev_bucket)
    kept = (~dup) & live

    support = seg.seg_sum(kept.astype(jnp.int32), bin_b).astype(jnp.int32)
    count = seg.seg_sum(live.astype(jnp.int32), pair_b).astype(jnp.int32)

    # majority vote: max support, tie -> lowest bin (deterministic stand-in
    # for the reference's insertion-order tie-break, common.h:142-148)
    pair_start, _ = seg.seg_bounds(pair_b)
    binidx = seg.seg_ids(bin_b)
    bin_rank = binidx - binidx[pair_start]
    score = support.astype(jnp.int64) * (1 << 31) + ((1 << 31) - 1 - bin_rank)
    best = seg.seg_max(score, pair_b)
    seed_mask = (score == best) & bin_b & live

    return dict(
        seed_mask=seed_mask,
        read_h=(key >> _U64(32)).astype(jnp.int32),
        read_v=key.astype(jnp.int32),
        pos_h=pos_h,
        pos_v=pos_v,
        count=count.astype(jnp.int32),
        matches=support,
        overlap_est=ov,
        seed_rc=flip,
    )


def generate_candidates(
    triples: ReliableTriples, read_lengths: np.ndarray, config: BellaConfig
) -> CandidatePairs:
    """Host driver: run the device kernel, compact seeds to one row/pair."""
    if triples.nnz == 0:
        z = np.zeros(0, np.int32)
        return CandidatePairs(z, z, z, z, z, z, z, np.zeros(0, bool))
    out = _emit_and_chain(
        jnp.asarray(triples.kmer_ids),
        jnp.asarray(triples.read_ids),
        jnp.asarray(triples.positions),
        jnp.asarray(triples.is_rc),
        jnp.asarray(np.asarray(read_lengths, dtype=np.int32)),
        upper_freq=config.upper_freq,
        kmer_size=config.kmer_size,
        bin_size=config.bin_size,
    )
    mask = np.asarray(out["seed_mask"])
    return CandidatePairs(
        read_h=np.asarray(out["read_h"])[mask],
        read_v=np.asarray(out["read_v"])[mask],
        pos_h=np.asarray(out["pos_h"])[mask],
        pos_v=np.asarray(out["pos_v"])[mask],
        count=np.asarray(out["count"])[mask],
        matches=np.asarray(out["matches"])[mask],
        overlap_est=np.asarray(out["overlap_est"])[mask],
        seed_rc=np.asarray(out["seed_rc"])[mask],
    )
