"""Wide-id packed path (> 65,535 reads): must match the 16-bit packed
path on identical data and run end-to-end on a real > 64k-read corpus
(the reference's KMERINDEX uint32/64 switch, src/main.cpp:60-61)."""

import numpy as np

import jax.numpy as jnp

from bella_tpu import BellaConfig
from bella_tpu.io.fastq import ReadSet
from bella_tpu.io.simulate import random_genome, sample_reads
from bella_tpu.overlap.pairs import (
    _chain_packed, _chain_wide, _compact_reliable,
    _compact_reliable_wide, _fused_count, _fused_count_wide,
    _fused_emit_packed, _fused_emit_wide, _size_bucket, detect_overlaps,
)


def _as_map(p):
    return {
        (int(p.read_h[i]), int(p.read_v[i])): (
            int(p.count[i]), int(p.matches[i]), int(p.overlap_est[i]),
            int(p.pos_h[i]), int(p.pos_v[i]), bool(p.seed_rc[i]),
        )
        for i in range(p.num_pairs)
    }


def test_wide_stages_match_packed():
    """Same counted stream through the wide (rid/possc, h/v split) and
    16-bit packed stages yields identical pairs."""
    g = random_genome(6000, seed=61)
    reads, _ = sample_reads(
        g, 25, mean_len=900, min_len=400, error_rate=0.1, seed=62,
        circular=False,
    )
    cfg = BellaConfig()
    k = cfg.kmer_size
    lengths = jnp.asarray(reads.lengths.astype(np.int32))
    args = (
        jnp.asarray(reads.codes),
        lengths,
        jnp.asarray(reads.offsets.astype(np.int32)),
    )
    kw = dict(kmer_size=k, lower=cfg.lower_freq, upper=cfg.upper_freq)

    live, sr, sp, sc, rank, cnt, nnzs, nk = _fused_count(*args, pack_ridpos=True, **kw)
    n = int(nnzs[0])
    size = min(_size_bucket(max(n, 1 << 14)), int(sr.shape[0]))
    csr, csp, csc, crank = _compact_reliable(live, sr, sp, sc, rank, size)
    hv, k3, pv, _ = _fused_emit_packed(
        jnp.int32(n), csr, csp, csc, crank, lengths,
        kmer_size=k, upper=cfg.upper_freq, bin_size=cfg.bin_size,
    )
    packed = _chain_packed(hv, k3, pv, lengths, kmer_size=k,
                           bin_size=cfg.bin_size)

    rel, wsr, wsp, wsc, wrank, wcnt, wnnzs, wnk = _fused_count_wide(*args, **kw)
    assert (int(wnnzs[0]), int(wnk)) == (n, int(nk))
    wsize = min(_size_bucket(max(int(wnnzs[0]), 1 << 14)), int(wsr.shape[0]))
    csr2, csp2, csc2, crank2 = _compact_reliable_wide(
        rel, wsr, wsp, wsc, wrank, wsize
    )
    h, v, k3w, pvw, _ = _fused_emit_wide(
        jnp.int32(n), csr2, csp2, csc2, crank2, lengths,
        kmer_size=k, upper=cfg.upper_freq, bin_size=cfg.bin_size,
    )
    wide = _chain_wide(h, v, k3w, pvw, lengths, kmer_size=k,
                       bin_size=cfg.bin_size)
    assert _as_map(packed) == _as_map(wide)


def _big_corpus(num_reads=70_000, seed=71):
    """> 64k tiny reads covering a genome so every read overlaps its
    neighbours (positions stay well under 16 bits)."""
    rng = np.random.default_rng(seed)
    g = random_genome(40_000, seed=seed)
    L = 160
    starts = rng.integers(0, len(g) - L, num_reads)
    seqs = [np.asarray(g[s : s + L], np.uint8) for s in starts]
    names = [f"r{i}" for i in range(num_reads)]
    offsets = np.zeros(num_reads + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    return ReadSet(names, np.concatenate(seqs), offsets)


def test_wide_end_to_end_70k_reads():
    """A 70,000-read corpus runs the device wide path (not host-staged)
    end-to-end; subsampled pair spot-check against brute force."""
    reads = _big_corpus()
    # high coverage of a small genome: wide bounds keep some k-mers
    cfg = BellaConfig(lower_freq=2, upper_freq=40, bin_size=500)
    pairs, nk, nnz = detect_overlaps(reads, cfg)
    assert reads.num_reads > 0xFFFF
    assert nk > 0 and nnz > 0 and pairs.num_pairs > 0
    # ids beyond 16 bits must appear
    assert int(pairs.read_h.max()) > 0xFFFF
    # invariants
    assert (pairs.read_h > pairs.read_v).all()
    assert (pairs.matches >= 1).all()
    assert (pairs.count >= pairs.matches).all()
    assert (pairs.overlap_est >= cfg.kmer_size).all()


def test_wide_split_matches_wide_fused():
    """The beyond-HBM split path in wide mode == the in-budget wide
    path."""
    reads = _big_corpus(num_reads=68_000, seed=81)
    cfg = BellaConfig(lower_freq=2, upper_freq=40)
    ref_pairs, ref_nk, ref_nnz = detect_overlaps(reads, cfg)
    from bella_tpu.overlap import pairs as pp

    m = len(reads.codes)
    cfg2 = BellaConfig(lower_freq=2, upper_freq=40,
                       total_memory_mb=m * 50 / 1e6)
    split_pairs, nk, nnz = pp._detect_overlaps_split(
        reads, cfg2, cfg2.total_memory_mb * 1e6, wide=True
    )
    assert (nk, nnz) == (ref_nk, ref_nnz)
    assert _as_map(split_pairs) == _as_map(ref_pairs)
    # the public driver routes a > 64k-read beyond-budget corpus through
    # the wide split path (not host staging)
    drv_pairs, drv_nk, _ = detect_overlaps(reads, cfg2)
    assert drv_nk == ref_nk and _as_map(drv_pairs) == _as_map(ref_pairs)
