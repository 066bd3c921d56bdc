"""Fused single-dispatch overlap detection must match the modular path."""

import numpy as np

from bella_tpu import BellaConfig
from bella_tpu.io.simulate import random_genome, sample_reads
from bella_tpu.kmers import build_reliable_triples, extract_occurrences
from bella_tpu.overlap import generate_candidates
from bella_tpu.overlap.pairs import detect_overlaps


def _as_map(p):
    return {
        (int(p.read_h[i]), int(p.read_v[i])): (
            int(p.count[i]), int(p.matches[i]), int(p.overlap_est[i]),
            int(p.pos_h[i]), int(p.pos_v[i]), bool(p.seed_rc[i]),
        )
        for i in range(p.num_pairs)
    }


def test_fused_matches_modular():
    g = random_genome(9000, seed=31)
    reads, _ = sample_reads(
        g, 35, mean_len=1200, min_len=500, error_rate=0.12, seed=32, circular=False
    )
    cfg = BellaConfig()
    tri = build_reliable_triples(reads, cfg, extract_occurrences(reads, cfg))
    modular = generate_candidates(tri, reads.lengths, cfg)
    fused, num_kmers, nnz = detect_overlaps(reads, cfg)
    assert num_kmers == tri.num_kmers
    assert nnz == tri.nnz
    mm, mf = _as_map(modular), _as_map(fused)
    assert set(mm) == set(mf)
    for k in mm:
        assert mm[k] == mf[k], (k, mm[k], mf[k])


def test_chunked_extract_matches_unchunked(monkeypatch):
    """The pipelined chunked upload+extract path (reads split at read
    boundaries, zero-length read-count padding, global rid offsets)
    yields the exact pairs of the single-upload path."""
    from bella_tpu.overlap import pairs as pp

    g = random_genome(9000, seed=35)
    reads, _ = sample_reads(
        g, 40, mean_len=1100, min_len=500, error_rate=0.12, seed=36,
        circular=False,
    )
    cfg = BellaConfig()
    ref, nk_ref, nnz_ref = detect_overlaps(reads, cfg)
    # force ~4 chunks on this tiny corpus
    monkeypatch.setattr(pp, "_CHUNK_BASES", len(reads.codes) // 4)
    chk, nk, nnz = detect_overlaps(reads, cfg)
    assert (nk, nnz) == (nk_ref, nnz_ref)
    assert _as_map(chk) == _as_map(ref)


def test_chunked_extract_matches_unchunked_wide(monkeypatch):
    """Chunked extraction on the wide-id (> 64k-read layout) path."""
    from bella_tpu.overlap import pairs as pp

    g = random_genome(9000, seed=37)
    reads, _ = sample_reads(
        g, 40, mean_len=1100, min_len=500, error_rate=0.12, seed=38,
        circular=False,
    )
    cfg = BellaConfig(upper_freq=300)  # > 255 forces the wide path
    ref, nk_ref, nnz_ref = detect_overlaps(reads, cfg)
    monkeypatch.setattr(pp, "_CHUNK_BASES", len(reads.codes) // 4)
    chk, nk, nnz = detect_overlaps(reads, cfg)
    assert (nk, nnz) == (nk_ref, nnz_ref)
    assert _as_map(chk) == _as_map(ref)


def test_fused_hopc_runs():
    g = random_genome(4000, seed=33)
    reads, _ = sample_reads(g, 15, mean_len=800, min_len=400, error_rate=0.05, seed=34)
    cfg = BellaConfig(use_hopc=True)
    pairs, num_kmers, nnz = detect_overlaps(reads, cfg)
    assert num_kmers > 0 and nnz > 0


def test_packed_stages_match_unpacked():
    """The 3-operand packed sort path == the 7-operand path on the same
    counted stream (same pairs, seeds, counts)."""
    import jax.numpy as jnp
    from bella_tpu.overlap.pairs import (
        _chain_packed, _chain_stage32, _compact, _compact_reliable,
        _fused_count, _fused_emit, _fused_emit_packed,
    )

    g = random_genome(6000, seed=41)
    reads, _ = sample_reads(
        g, 25, mean_len=900, min_len=400, error_rate=0.1, seed=42, circular=False
    )
    cfg = BellaConfig()
    k = cfg.kmer_size
    live, sr, sp, sc, rank, cnt, nnzs, num_kmers = _fused_count(
        jnp.asarray(reads.codes),
        jnp.asarray(reads.lengths.astype(np.int32)),
        jnp.asarray(reads.offsets.astype(np.int32)),
        kmer_size=k, lower=cfg.lower_freq, upper=cfg.upper_freq, use_hopc=False,
    )
    lengths = jnp.asarray(reads.lengths.astype(np.int32))
    n = int(nnzs[0])
    size = min(1 << max(14, (n - 1).bit_length()), int(sr.shape[0]))
    csr, csp, csc, crank = _compact_reliable(live, sr, sp, sc, rank, size)
    hv, k3, pv, n_live = _fused_emit_packed(
        jnp.int32(n), csr, csp, csc, crank, lengths,
        kmer_size=k, upper=cfg.upper_freq, bin_size=cfg.bin_size,
    )
    assert int(n_live) == int(np.asarray(hv != np.uint32(0xFFFFFFFF)).sum())
    packed = _chain_packed(hv, k3, pv, lengths, kmer_size=k, bin_size=cfg.bin_size)
    h, v, b, ph, pvv, fl, ov = _fused_emit(
        live, sr, sp, sc, rank, lengths,
        kmer_size=k, upper=cfg.upper_freq, bin_size=cfg.bin_size,
    )
    unpacked = _compact(_chain_stage32(h, v, b, ph, pvv, fl, ov, kmer_size=k))
    mp, mu = _as_map(packed), _as_map(unpacked)
    assert mp == mu


def test_phased_extractor_matches_per_position():
    """The 4-phase packed extractor (sliding u64 windows over 2-bit
    bytes) yields exactly the canonical k-mer multiset + (rid, pos, rc)
    rows of the per-position extractor, for several k including the
    k = 28 phase-3 boundary and reads whose lengths are not multiples
    of 4."""
    import jax.numpy as jnp
    from bella_tpu.overlap.pairs import (
        PAIR_SENTINEL, _extract_kmers, _extract_kmers_phased,
    )

    rng = np.random.default_rng(77)
    for k in (5, 17, 28):
        # ragged reads, lengths deliberately not multiples of 4
        lens = [13, 50, k, k + 1, 31, 77]
        codes = rng.integers(0, 4, sum(lens)).astype(np.int8)
        total = codes.size
        total_p = ((total + 3) // 4) * 4
        lengths = np.array(lens, np.int32)
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
        n_real = len(lens)
        if total_p > total:  # phantom read pads to a byte boundary
            codes = np.concatenate([codes, np.zeros(total_p - total, np.int8)])
            lengths = np.append(lengths, np.int32(total_p - total))
            offsets = np.append(offsets, np.int32(total_p))

        c4 = codes.reshape(-1, 4).astype(np.uint8)
        packed = np.concatenate([
            c4[:, 0] | (c4[:, 1] << 2) | (c4[:, 2] << 4) | (c4[:, 3] << 6),
            np.zeros(8, np.uint8),
        ])
        args = (jnp.asarray(lengths), jnp.asarray(offsets), jnp.int32(n_real))
        khi_p, klo_p, rid_p, rc_p, pos_p = _extract_kmers_phased(
            jnp.asarray(packed), *args, kmer_size=k, pack_ridpos=False
        )
        khi_r, klo_r, rid_r, rc_r, pos_r = _extract_kmers(
            jnp.asarray(codes), *args, kmer_size=k, pack_ridpos=False
        )

        def rows(khi, klo, rid, rc, pos):
            canon = (np.asarray(khi).astype(np.uint64) << np.uint64(32)) | np.asarray(klo)
            keep = canon != PAIR_SENTINEL
            r = np.stack([
                canon[keep].astype(np.uint64),
                np.asarray(rid)[keep].astype(np.uint64),
                np.asarray(pos)[keep].astype(np.uint64),
                np.asarray(rc)[keep].astype(np.uint64),
            ], axis=1)
            return r[np.lexsort(r.T[::-1])]

        a = rows(khi_p, klo_p, rid_p, rc_p, pos_p)
        b = rows(khi_r, klo_r, rid_r, rc_r, pos_r)
        assert a.shape == b.shape, (k, a.shape, b.shape)
        assert (a == b).all(), k


def test_split_fused_matches_fused():
    """The beyond-HBM split path (chunked partition -> per-pass count ->
    one emit+chain) produces exactly the fused path's pairs: the chain
    sorts key on all operands, so seeds are order-independent."""
    g = random_genome(12_000, seed=55)
    reads, _ = sample_reads(
        g, 60, mean_len=900, min_len=300, error_rate=0.08, seed=56,
        circular=False,
    )
    ref_pairs, ref_nk, ref_nnz = detect_overlaps(reads, BellaConfig())
    # a budget small enough to force the split path (m*100 > budget) but
    # large enough for its accumulator gate (30 B/position)
    m = len(reads.codes)
    cfg = BellaConfig(total_memory_mb=m * 50 / 1e6)
    from bella_tpu.overlap import pairs as pp

    split_pairs, nk, nnz = pp._detect_overlaps_split(
        reads, cfg, cfg.total_memory_mb * 1e6
    )
    assert nk == ref_nk and nnz == ref_nnz
    assert split_pairs.num_pairs == ref_pairs.num_pairs

    def key(p):
        order = np.lexsort((p.read_v, p.read_h))
        return {
            f: getattr(p, f)[order]
            for f in ("read_h", "read_v", "pos_h", "pos_v", "count",
                      "matches", "overlap_est", "seed_rc")
        }

    a, b = key(split_pairs), key(ref_pairs)
    for f in a:
        assert (a[f] == b[f]).all(), f

    # the public driver routes through the split path at that budget
    drv_pairs, drv_nk, drv_nnz = detect_overlaps(reads, cfg)
    assert drv_nk == ref_nk and drv_pairs.num_pairs == ref_pairs.num_pairs


def test_split_multipass_groups_match_fused():
    """Grouped multipass split (accumulator smaller than splits *
    region_cap: chunks re-extracted once per pass group — the
    reference's --split-count re-scan, include/kmercount.hpp:478-534)
    produces exactly the fused path's pairs."""
    g = random_genome(12_000, seed=55)
    reads, _ = sample_reads(
        g, 60, mean_len=900, min_len=300, error_rate=0.08, seed=56,
        circular=False,
    )
    ref_pairs, ref_nk, ref_nnz = detect_overlaps(reads, BellaConfig())
    m = len(reads.codes)
    cfg = BellaConfig(total_memory_mb=m * 50 / 1e6)
    from bella_tpu.overlap import pairs as pp

    split_pairs, nk, nnz = pp._detect_overlaps_split(
        reads, cfg, cfg.total_memory_mb * 1e6, force_group=1
    )
    assert nk == ref_nk and nnz == ref_nnz
    assert split_pairs.num_pairs == ref_pairs.num_pairs

    def key(p):
        order = np.lexsort((p.read_v, p.read_h))
        return {
            f: getattr(p, f)[order]
            for f in ("read_h", "read_v", "pos_h", "pos_v", "count",
                      "matches", "overlap_est", "seed_rc")
        }

    a, b = key(split_pairs), key(ref_pairs)
    for f in a:
        assert (a[f] == b[f]).all(), f


def test_compact_stable_branch_matches(monkeypatch):
    """Streams beyond _STABLE_SORT_ROWS use the short stable-sort
    compact key (no room for the iota tiebreak): force that branch on a
    small corpus and require identical detection output."""
    from bella_tpu.overlap import pairs as pp

    g = random_genome(9000, seed=23)
    reads, _ = sample_reads(
        g, 60, mean_len=1200, min_len=500, error_rate=0.12, seed=24,
        circular=False,
    )
    cfg = BellaConfig()
    ref, nk_ref, nnz_ref = detect_overlaps(reads, cfg)
    monkeypatch.setattr(pp, "_STABLE_SORT_ROWS", 1024)
    pp._compact_sort.clear_cache()
    try:
        chk, nk, nnz = detect_overlaps(reads, cfg)
    finally:
        pp._compact_sort.clear_cache()
    assert (nk, nnz) == (nk_ref, nnz_ref)
    assert _as_map(chk) == _as_map(ref)


def test_size_hints_repeat_and_redo():
    """Speculative-size repeat runs: the second detect_overlaps on the
    same corpus dispatches with the first run's size buckets (no
    blocking size readbacks) and must return identical pairs; poisoned
    (too-small) hints must be detected and redone exactly."""
    from bella_tpu.overlap import pairs as pp

    g = random_genome(9000, seed=41)
    reads, _ = sample_reads(
        g, 40, mean_len=1100, min_len=500, error_rate=0.12, seed=42,
        circular=False,
    )
    cfg = BellaConfig()
    pp._SIZE_HINTS.clear()
    ref, nk_ref, nnz_ref = detect_overlaps(reads, cfg)
    key = pp._hints_key(reads, cfg)
    assert key in pp._SIZE_HINTS  # first run recorded the sizes
    rec = dict(pp._SIZE_HINTS[key])
    hinted, nk, nnz = detect_overlaps(reads, cfg)  # hinted run
    assert (nk, nnz) == (nk_ref, nnz_ref)
    assert _as_map(hinted) == _as_map(ref)

    # poisoned hints: every size too small -> the verification must
    # catch the truncation and re-run the exact flow
    pp._SIZE_HINTS[key] = dict(
        narr=np.maximum(rec["narr"] // 7, 1),
        n_cand=max(rec["n_cand"] // 7, 1),
        nseed=max(rec["nseed"] // 7, 1),
    )
    redone, nk2, nnz2 = detect_overlaps(reads, cfg)
    assert (nk2, nnz2) == (nk_ref, nnz_ref)
    assert _as_map(redone) == _as_map(ref)
    pp._SIZE_HINTS.clear()


def test_size_hints_wide_path():
    """Speculative sizes on the wide-id branch (upper_freq > 255)."""
    from bella_tpu.overlap import pairs as pp

    g = random_genome(9000, seed=43)
    reads, _ = sample_reads(
        g, 40, mean_len=1100, min_len=500, error_rate=0.12, seed=44,
        circular=False,
    )
    cfg = BellaConfig(upper_freq=300)  # forces the wide path
    pp._SIZE_HINTS.clear()
    ref, nk_ref, nnz_ref = detect_overlaps(reads, cfg)
    assert pp._hints_key(reads, cfg) in pp._SIZE_HINTS
    hinted, nk, nnz = detect_overlaps(reads, cfg)
    assert (nk, nnz) == (nk_ref, nnz_ref)
    assert _as_map(hinted) == _as_map(ref)
    pp._SIZE_HINTS.clear()


def test_size_hints_overestimate_trimmed():
    """Overestimated hints (stale on-disk record / key collision): the
    hinted run must trim to the TRUE seed count before unpacking —
    sentinel rows past it would otherwise index out of range in
    _unpack_pairs (packed hv=0xFFFFFFFF -> read id 65535) — and still
    return exact results without a redo."""
    from bella_tpu.overlap import pairs as pp

    g = random_genome(9000, seed=45)
    reads, _ = sample_reads(
        g, 40, mean_len=1100, min_len=500, error_rate=0.12, seed=46,
        circular=False,
    )
    cfg = BellaConfig()
    pp._SIZE_HINTS.clear()
    ref, nk_ref, nnz_ref = detect_overlaps(reads, cfg)
    key = pp._hints_key(reads, cfg)
    rec = dict(pp._SIZE_HINTS[key])
    # every size inflated: verification passes (nothing undersized), so
    # the run must succeed on the hinted path itself
    pp._SIZE_HINTS[key] = dict(
        narr=rec["narr"] * 3 + 64,
        n_cand=rec["n_cand"] * 3 + 64,
        nseed=rec["nseed"] * 3 + 64,
    )
    hinted, nk, nnz = detect_overlaps(reads, cfg)
    assert (nk, nnz) == (nk_ref, nnz_ref)
    assert _as_map(hinted) == _as_map(ref)
    pp._SIZE_HINTS.clear()


def test_hints_key_content_sensitive():
    """Two corpora with identical read-length profiles but different
    base content must map to distinct hint records."""
    from bella_tpu.overlap import pairs as pp

    g = random_genome(9000, seed=47)
    reads, _ = sample_reads(
        g, 30, mean_len=1000, min_len=500, error_rate=0.1, seed=48,
        circular=False,
    )
    cfg = BellaConfig()
    k1 = pp._hints_key(reads, cfg)
    edited = reads.__class__(
        reads.names, ((reads.codes + 1) % 4).astype(np.uint8), reads.offsets
    )
    k2 = pp._hints_key(edited, cfg)
    assert k1 != k2
