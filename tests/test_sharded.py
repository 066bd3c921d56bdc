"""Sharded candidate generation on a virtual 8-device CPU mesh must
match the single-chip result exactly."""

import numpy as np
import pytest

import jax

from bella_tpu import BellaConfig
from bella_tpu.io.simulate import random_genome, sample_reads
from bella_tpu.kmers import build_reliable_triples, extract_occurrences
from bella_tpu.overlap import generate_candidates
from bella_tpu.parallel import make_mesh, sharded_candidates


@pytest.fixture(scope="module")
def data():
    g = random_genome(10000, seed=3)
    reads, _ = sample_reads(
        g, 40, mean_len=1500, min_len=600, error_rate=0.1, seed=4, circular=False
    )
    cfg = BellaConfig()
    tri = build_reliable_triples(reads, cfg, extract_occurrences(reads, cfg))
    return reads, cfg, tri


def _as_map(p):
    return {
        (int(p.read_h[i]), int(p.read_v[i])): (
            int(p.count[i]), int(p.matches[i]), int(p.overlap_est[i]),
            int(p.pos_h[i]), int(p.pos_v[i]), bool(p.seed_rc[i]),
        )
        for i in range(p.num_pairs)
    }


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_matches_single_chip(data, ndev):
    reads, cfg, tri = data
    assert len(jax.devices()) >= ndev, "test mesh needs forced host devices"
    single = generate_candidates(tri, reads.lengths, cfg)
    mesh = make_mesh(ndev)
    multi = sharded_candidates(tri, reads.lengths, cfg, mesh)
    ms, mm = _as_map(single), _as_map(multi)
    assert set(ms) == set(mm)
    for key in ms:
        assert ms[key] == mm[key], (key, ms[key], mm[key])


def test_sharded_u64_path_matches_single(data):
    """upper_freq > 255 forces the u64 row path; parity must hold."""
    reads, cfg, _ = data
    from bella_tpu import BellaConfig
    from bella_tpu.kmers import build_reliable_triples, extract_occurrences

    cfg2 = BellaConfig(upper_freq=300, lower_freq=2)
    tri = build_reliable_triples(reads, cfg2, extract_occurrences(reads, cfg2))
    single = generate_candidates(tri, reads.lengths, cfg2)
    multi = sharded_candidates(tri, reads.lengths, cfg2, make_mesh(4))
    assert _as_map(single) == _as_map(multi)


def test_sharded_overflow_retry(data):
    """Starved capacities must trigger the doubling retry on both the
    packed and u64 paths with exact parity (never drop)."""
    reads, cfg, tri = data
    single = generate_candidates(tri, reads.lengths, cfg)
    multi = sharded_candidates(
        tri, reads.lengths, cfg, make_mesh(8), cap_occ=64, cap_pair=128
    )
    assert _as_map(single) == _as_map(multi)

    from bella_tpu import BellaConfig
    from bella_tpu.kmers import build_reliable_triples, extract_occurrences

    cfg2 = BellaConfig(upper_freq=300, lower_freq=2)
    tri2 = build_reliable_triples(reads, cfg2, extract_occurrences(reads, cfg2))
    single2 = generate_candidates(tri2, reads.lengths, cfg2)
    multi2 = sharded_candidates(
        tri2, reads.lengths, cfg2, make_mesh(8), cap_occ=64, cap_pair=128
    )
    assert _as_map(single2) == _as_map(multi2)
