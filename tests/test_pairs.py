"""Candidate-pair generation vs a brute-force Python oracle implementing
the documented chaining semantics (quantized-bin variant of chain.hpp)."""

import collections

import numpy as np
import pytest

from bella_tpu import BellaConfig
from bella_tpu.io import ReadSet
from bella_tpu.io.simulate import random_genome, sample_reads
from bella_tpu.kmers import build_reliable_triples, extract_occurrences
from bella_tpu.overlap import generate_candidates

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def rc(s):
    return "".join(COMP[c] for c in reversed(s))


def oracle_pairs(seqs, cfg):
    """Brute-force: reliable canonical k-mers -> all lower-tri pairs ->
    quantized binning -> majority vote -> seed (min posH in best bin)."""
    k, L, U, B = cfg.kmer_size, cfg.lower_freq, cfg.upper_freq, cfg.bin_size
    occ = collections.defaultdict(list)  # canon -> [(read, pos, is_rc)]
    for r, s in enumerate(seqs):
        for p in range(len(s) - k + 1):
            fwd = s[p : p + k]
            rcs = rc(fwd)
            canon = min(fwd, rcs)
            occ[canon].append((r, p, rcs < fwd))
    pairs = collections.defaultdict(list)
    for canon, lst in occ.items():
        if not (L <= len(lst) <= U):
            continue
        for i in range(len(lst)):
            for j in range(i):
                (r1, p1, c1), (r2, p2, c2) = lst[i], lst[j]
                if r1 == r2:
                    continue
                (h, ph, ch), (v, pv, cv) = max(
                    [(r1, p1, c1), (r2, p2, c2)]
                ), min([(r1, p1, c1), (r2, p2, c2)])
                flip = ch != cv
                lh, lv = len(seqs[h]), len(seqs[v])
                bh = lh - ph - k if flip else ph
                ov = min(bh, pv) + min(lh - (bh + k), lv - (pv + k)) + k
                pairs[(h, v)].append((ph, pv, flip, ov))
    out = {}
    for (h, v), lst in pairs.items():
        lst.sort(key=lambda t: (t[3] // B, t[0], t[1]))
        bins = collections.defaultdict(list)
        for t in lst:
            bins[t[3] // B].append(t)
        support = {
            b: len({ph // (k + 1) for ph, pv, flip, ov in items})
            for b, items in bins.items()
        }
        best = max(support, key=lambda b: (support[b], -b))
        seed = bins[best][0]
        out[(h, v)] = dict(
            count=len(lst), matches=support[best],
            seed=(seed[0], seed[1]), ov=seed[3], flip=seed[2],
        )
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_pairs_match_oracle(seed):
    g = random_genome(4000, seed=seed)
    reads, _ = sample_reads(
        g, 14, mean_len=700, min_len=300, error_rate=0.08, seed=seed + 10, circular=False
    )
    seqs = [reads.sequence(r) for r in range(reads.num_reads)]
    cfg = BellaConfig(kmer_size=17, lower_freq=2, upper_freq=8)
    tri = build_reliable_triples(reads, cfg, extract_occurrences(reads, cfg))
    got = generate_candidates(tri, reads.lengths, cfg)
    exp = oracle_pairs(seqs, cfg)

    got_map = {
        (int(got.read_h[i]), int(got.read_v[i])): i for i in range(got.num_pairs)
    }
    assert set(got_map) == set(exp), (
        f"pair sets differ: extra={set(got_map)-set(exp)} missing={set(exp)-set(got_map)}"
    )
    for key, e in exp.items():
        i = got_map[key]
        assert int(got.count[i]) == e["count"], (key, int(got.count[i]), e)
        assert int(got.matches[i]) == e["matches"], (key, int(got.matches[i]), e)
        assert int(got.overlap_est[i]) == e["ov"], (key, int(got.overlap_est[i]), e)
        assert (int(got.pos_h[i]), int(got.pos_v[i])) == e["seed"], (key, e)
        assert bool(got.seed_rc[i]) == e["flip"]


def test_no_self_pairs_and_triangular():
    g = random_genome(2000, seed=5)
    reads, _ = sample_reads(g, 10, mean_len=600, min_len=300, error_rate=0.05, seed=6, circular=False)
    cfg = BellaConfig()
    tri = build_reliable_triples(reads, cfg, extract_occurrences(reads, cfg))
    got = generate_candidates(tri, reads.lengths, cfg)
    assert (got.read_h > got.read_v).all()
    keys = got.read_h.astype(np.int64) << 32 | got.read_v
    assert len(np.unique(keys)) == got.num_pairs  # one row per pair


def test_generate_candidates_packed_matches_u64():
    """The packed uint32 triples path == the u64 key path (forced by a
    tiny memory budget pushing the staged branch... no — by disabling
    packing via bin_size < 3)."""
    import numpy as np
    from bella_tpu import BellaConfig
    from bella_tpu.io.simulate import random_genome, sample_reads
    from bella_tpu.kmers import build_reliable_triples, extract_occurrences
    from bella_tpu.overlap.pairs import generate_candidates

    g = random_genome(8000, seed=51)
    reads, _ = sample_reads(
        g, 30, mean_len=1000, min_len=500, error_rate=0.1, seed=52, circular=False
    )
    cfg = BellaConfig()
    tri = build_reliable_triples(reads, cfg, extract_occurrences(reads, cfg))
    a = generate_candidates(tri, reads.lengths, cfg)  # packed

    cfg2 = BellaConfig(bin_size=2)  # < 3 disables packing -> u64 path
    cfg_pack2 = BellaConfig(bin_size=2)
    b = generate_candidates(tri, reads.lengths, cfg2)  # u64 path, bin 2
    # compare like-for-like: rerun packed-eligible config at bin 500 vs
    # u64 path at bin 500 by lowering the memory budget to skip packing
    cfg3 = BellaConfig(total_memory_mb=0.001)
    c = generate_candidates(tri, reads.lengths, cfg3)  # staged u64 path

    def as_map(p):
        return {
            (int(p.read_h[i]), int(p.read_v[i])): (
                int(p.count[i]), int(p.matches[i]), int(p.overlap_est[i]),
                int(p.pos_h[i]), int(p.pos_v[i]), bool(p.seed_rc[i]),
            )
            for i in range(p.num_pairs)
        }

    assert as_map(a) == as_map(c)
    assert b.num_pairs > 0


def test_lag_sizes_invariants(monkeypatch):
    """_lag_sizes tuples must upper-bound the actual count>d rows,
    stay monotone nonincreasing, cap at size, and honor the escape
    hatch — the emission slices silently drop pairs otherwise."""
    import numpy as np

    from bella_tpu.overlap.pairs import _lag_sizes

    monkeypatch.delenv("BELLA_NO_LAG_SLICES", raising=False)
    rng = np.random.default_rng(7)
    for _ in range(50):
        upper = int(rng.integers(2, 12))
        size = int(rng.integers(1 << 10, 1 << 22))
        nnz = int(rng.integers(0, size))
        # nonincreasing random S_d
        s = np.sort(rng.integers(0, nnz + 1, upper - 1))[::-1]
        narr = np.concatenate([[nnz], s]).astype(np.int64)
        out = _lag_sizes(narr, size, upper)
        assert len(out) == upper - 1
        assert all(out[i] >= out[i + 1] for i in range(len(out) - 1))
        assert all(v <= size for v in out)
        # every actual count>d row count is covered
        for d in range(1, upper):
            i = min(d, len(narr) - 1)
            assert out[d - 1] >= min(int(narr[i]), size)
    monkeypatch.setenv("BELLA_NO_LAG_SLICES", "1")
    assert _lag_sizes(narr, size, upper) == (size,) * (upper - 1)
