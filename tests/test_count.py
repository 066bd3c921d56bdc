"""Counting vs a pure-Python Counter oracle (SURVEY §4 test plan)."""

import collections

import numpy as np
import pytest

from bella_tpu import BellaConfig
from bella_tpu.io import ReadSet
from bella_tpu.kmers import (
    build_reliable_triples,
    compute_lower,
    compute_upper,
    count_kmers,
    extract_occurrences,
)


def py_canonical_kmers(seq: str, k: int):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    out = []
    for i in range(len(seq) - k + 1):
        fwd = seq[i : i + k]
        rc = "".join(comp[c] for c in reversed(fwd))
        out.append(min(fwd, rc))
    return out


def random_reads(n, lo, hi, seed):
    rng = np.random.default_rng(seed)
    return [
        "".join("ACGT"[b] for b in rng.integers(0, 4, rng.integers(lo, hi)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("k", [5, 17])
def test_counts_match_python_counter(k):
    from bella_tpu.seq.encode import kmer_to_string

    seqs = random_reads(20, 30, 120, seed=k)
    rs = ReadSet.from_sequences(seqs)
    cfg = BellaConfig(kmer_size=k, lower_freq=1, upper_freq=10**9)
    occ = extract_occurrences(rs, cfg)
    uniq, counts = count_kmers(occ)
    got = {kmer_to_string(int(u), k): int(c) for u, c in zip(uniq, counts)}
    oracle = collections.Counter()
    for s in seqs:
        oracle.update(py_canonical_kmers(s, k))
    assert got == dict(oracle)


def test_reliable_filter_bounds():
    # 4 copies of read A, 1 copy of read B: A-kmers count>=4, B-kmers ==1
    a = "ACGTTGCATTGGACCATAGCAGTCAGTCGATTGCAACGGTCATTTACCGA"
    b = "TTGCCGGAACCTTGGCAACCGGTTAAGGCCTTAAGGCCAACCGGTTACAG"
    rs = ReadSet.from_sequences([a, a, a, a, b])
    cfg = BellaConfig(kmer_size=17, lower_freq=2, upper_freq=8)
    occ = extract_occurrences(rs, cfg)
    uniq, counts = count_kmers(occ, 2, 8)
    assert (counts >= 2).all() and (counts <= 8).all()
    # b's unique kmers must be gone
    oracle = collections.Counter(py_canonical_kmers(a, 17) * 4 + py_canonical_kmers(b, 17))
    expect = {km for km, c in oracle.items() if 2 <= c <= 8}
    from bella_tpu.seq.encode import kmer_to_string

    assert {kmer_to_string(int(u), 17) for u in uniq} == expect


def test_triples_positions_and_ids():
    seqs = random_reads(10, 50, 100, seed=9)
    rs = ReadSet.from_sequences(seqs)
    cfg = BellaConfig(kmer_size=11, lower_freq=1, upper_freq=10**9)
    tri = build_reliable_triples(rs, cfg)
    # every (read, pos) appears exactly once; ids dense in [0, num_kmers)
    assert tri.nnz == sum(len(s) - 10 for s in seqs)
    assert tri.kmer_ids.min() == 0
    assert tri.kmer_ids.max() == tri.num_kmers - 1
    assert set(np.unique(tri.kmer_ids)) == set(range(tri.num_kmers))
    # positions within read bounds
    lens = np.array([len(s) for s in seqs])
    assert (tri.positions >= 0).all()
    assert (tri.positions <= lens[tri.read_ids] - 11).all()
    # kmer-major sorted
    assert (np.diff(tri.kmer_ids) >= 0).all()


def test_split_count_matches_single_pass():
    seqs = random_reads(15, 60, 150, seed=3)
    rs = ReadSet.from_sequences(seqs)
    one = build_reliable_triples(rs, BellaConfig(kmer_size=13, lower_freq=2, upper_freq=20))
    four = build_reliable_triples(
        rs, BellaConfig(kmer_size=13, lower_freq=2, upper_freq=20, split_count=4)
    )
    assert one.nnz == four.nnz
    assert one.num_kmers == four.num_kmers
    # same (read, pos) set regardless of pass partitioning
    a = set(zip(one.read_ids.tolist(), one.positions.tolist()))
    b = set(zip(four.read_ids.tolist(), four.positions.tolist()))
    assert a == b


def test_reliable_bounds_math():
    # coverage 30, 15% error, k=17: lower should stay near 2, upper well
    # below coverage (most k-mers carry an error)
    lo = compute_lower(30, 0.15, 17, 0.002)
    up = compute_upper(30, 0.15, 17, 0.002)
    assert 2 <= lo < up <= 30
    # HiFi-like: almost all kmers correct -> upper near coverage
    up_hifi = compute_upper(30, 0.005, 17, 0.002)
    assert up_hifi > up


def test_estimate_coverage():
    """Depth estimation from exact multiplicity stats (the reference's
    HyperLogLog sizing role, kmercode/hyperloglog.hpp:49-108, done with
    exact counters): estimate within ~25% of true depth across error
    regimes, and degenerate corpora return 0 (caller must ask for
    --coverage)."""
    from bella_tpu.io.simulate import random_genome, sample_reads
    from bella_tpu.kmers.bound import estimate_coverage

    g = random_genome(30000, seed=9)
    for err in (0.15, 0.005):
        reads, _ = sample_reads(
            g, 30 * 30000 // 2500, mean_len=2500, min_len=1200,
            error_rate=err, seed=10, circular=False,
        )
        true_cov = float(reads.offsets[-1]) / 30000
        est = estimate_coverage(reads, BellaConfig(error_rate=err))
        assert abs(est - true_cov) / true_cov < 0.25, (err, est, true_cov)

    # no multiplicity signal: a handful of disjoint random reads
    solo, _ = sample_reads(
        random_genome(200000, seed=11), 5, mean_len=1000, min_len=800,
        error_rate=0.15, seed=12, circular=False,
    )
    assert estimate_coverage(solo, BellaConfig()) == 0


def test_multiplicity_stats_sampled_matches_exact_ratio():
    """The hash-slice sampled path (big-corpus estimator) must agree
    with the exact path on the multiplicity RATIO that drives coverage
    estimation (slices keep full per-k-mer counts, so truncated means
    are unbiased)."""
    from bella_tpu.io.simulate import random_genome, sample_reads
    from bella_tpu.kmers.bound import estimate_coverage
    from bella_tpu.kmers.count import multiplicity_stats

    g = random_genome(30000, seed=9)
    reads, _ = sample_reads(
        g, 30 * 30000 // 2500, mean_len=2500, min_len=1200,
        error_rate=0.15, seed=10, circular=False,
    )
    cfg = BellaConfig()
    d, m, d2, m2 = multiplicity_stats(reads, cfg)
    # force the sampled path with a tiny max_rows (several chunks + a
    # real slice factor)
    ds, ms, d2s, m2s = multiplicity_stats(reads, cfg, max_rows=120_000)
    assert d2s > 0
    exact_ratio = m2 / d2
    sampled_ratio = m2s / d2s
    assert abs(sampled_ratio - exact_ratio) / exact_ratio < 0.05
    # scaled totals in the right ballpark (slice-sampling noise only)
    assert 0.5 < ds / d < 2.0

    # estimate_coverage through the sampled path stays accurate
    true_cov = float(reads.offsets[-1]) / 30000
    import bella_tpu.kmers.bound as bound_mod
    import bella_tpu.kmers.count as count_mod

    orig = count_mod.multiplicity_stats
    try:
        count_mod.multiplicity_stats = (
            lambda r, c: orig(r, c, max_rows=120_000)
        )
        est = estimate_coverage(reads, cfg)
    finally:
        count_mod.multiplicity_stats = orig
    assert abs(est - true_cov) / true_cov < 0.3, (est, true_cov)
