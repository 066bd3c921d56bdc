"""Staged (memory-bounded) pair generation must match single-stage."""

import dataclasses

import numpy as np

from bella_tpu import BellaConfig
from bella_tpu.io.simulate import random_genome, sample_reads
from bella_tpu.kmers import build_reliable_triples, extract_occurrences
from bella_tpu.overlap import generate_candidates


def _as_map(p):
    return {
        (int(p.read_h[i]), int(p.read_v[i])): (
            int(p.count[i]), int(p.matches[i]), int(p.overlap_est[i]),
            int(p.pos_h[i]), int(p.pos_v[i]), bool(p.seed_rc[i]),
        )
        for i in range(p.num_pairs)
    }


def test_staged_matches_single_stage():
    g = random_genome(8000, seed=13)
    reads, _ = sample_reads(
        g, 30, mean_len=1200, min_len=500, error_rate=0.1, seed=14, circular=False
    )
    cfg = BellaConfig()
    tri = build_reliable_triples(reads, cfg, extract_occurrences(reads, cfg))
    single = generate_candidates(tri, reads.lengths, cfg)

    # force staging with a tiny memory budget (but keep the 1<<20 floor
    # from kicking in by checking stage count indirectly via equality)
    from bella_tpu.overlap import pairs as pairs_mod

    tiny = dataclasses.replace(cfg, total_memory_mb=0.001)
    staged = pairs_mod._generate_candidates_staged(
        tri, np.asarray(reads.lengths, np.int32), tiny,
        budget_rows=4096 * (cfg.upper_freq - 1),
    )
    ms, mm = _as_map(single), _as_map(staged)
    assert set(ms) == set(mm)
    for k in ms:
        assert ms[k] == mm[k], (k, ms[k], mm[k])


def test_hv_range_staged_chain_packed():
    """hv-range staged chaining (beyond the fused candidate-stream
    gate): per-pass packed reliable slices stay resident, pairs chain
    one h-range at a time — the result must EXACTLY match the ordinary
    fused path (ranges partition pairs; chaining is per-pair)."""
    from bella_tpu.overlap import pairs as pm
    from bella_tpu.overlap.pairs import detect_overlaps

    g = random_genome(12000, seed=61)
    reads, _ = sample_reads(
        g, 60, mean_len=1200, min_len=500, error_rate=0.12, seed=62,
        circular=False,
    )
    cfg = BellaConfig()
    ref, nk_ref, nnz_ref = detect_overlaps(reads, cfg)
    # a small budget yields several splits AND >= 2 ranges
    budget = len(reads.codes) * 60.0
    got, nk, nnz = pm._detect_overlaps_split(
        reads, cfg, budget, wide=False, staged_chain=True
    )
    assert (nk, nnz) == (nk_ref, nnz_ref)
    ms, mg = _as_map(ref), _as_map(got)
    assert set(ms) == set(mg)
    for k in ms:
        assert ms[k] == mg[k], (k, ms[k], mg[k])


def test_hv_range_staged_chain_wide():
    """Same parity on the wide-id layout (the >64k-read shape)."""
    from bella_tpu.overlap import pairs as pm
    from bella_tpu.overlap.pairs import detect_overlaps

    g = random_genome(12000, seed=63)
    reads, _ = sample_reads(
        g, 60, mean_len=1200, min_len=500, error_rate=0.12, seed=64,
        circular=False,
    )
    cfg = BellaConfig()
    ref, nk_ref, nnz_ref = detect_overlaps(reads, cfg)
    budget = len(reads.codes) * 60.0
    got, nk, nnz = pm._detect_overlaps_split(
        reads, cfg, budget, wide=True, staged_chain=True
    )
    assert (nk, nnz) == (nk_ref, nnz_ref)
    ms, mg = _as_map(ref), _as_map(got)
    assert set(ms) == set(mg)
    for k in ms:
        assert ms[k] == mg[k], (k, ms[k], mg[k])


def test_split_grouped_midscale_parity():
    """Pass-grouped re-extraction at NON-toy shape: a ~6 Mbp corpus with
    force_group=2 and a budget small enough for multiple chunks AND
    multiple pass groups — the riskiest code in the split path (chunk
    re-extraction per group, per-pass emission, accumulator reuse) must
    reproduce the fused path exactly on both row layouts. (The 50+ Mbp
    variant runs on hardware: scripts/split_group_probe.py.)"""
    from bella_tpu.overlap import pairs as pm
    from bella_tpu.overlap.pairs import detect_overlaps

    g = random_genome(200_000, seed=65)
    reads, _ = sample_reads(
        g, 2_000, mean_len=3000, min_len=1000, error_rate=0.12, seed=66,
        circular=False,
    )
    assert int(reads.offsets[-1]) > 5_000_000
    cfg = BellaConfig()
    ref, nk_ref, nnz_ref = detect_overlaps(reads, cfg)
    ms = _as_map(ref)
    budget = len(reads.codes) * 60.0  # several chunks + splits
    for wide in (False, True):
        got, nk, nnz = pm._detect_overlaps_split(
            reads, cfg, budget, wide=wide, force_group=2
        )
        assert (nk, nnz) == (nk_ref, nnz_ref), (wide, nk, nnz)
        mg = _as_map(got)
        assert set(ms) == set(mg), wide
        for k in ms:
            assert ms[k] == mg[k], (wide, k, ms[k], mg[k])
