import numpy as np
import pytest

from bella_tpu.sparse import (
    CSC,
    csc_from_triples,
    read_matrix_market,
    rmat_triples,
    spgemm_count,
    write_matrix_market,
)
from bella_tpu.utils.markov import expected_steps_to_shared_kmer, min_overlap_for_detection


def test_csc_roundtrip_and_transpose():
    rng = np.random.default_rng(0)
    r = rng.integers(0, 10, 50)
    c = rng.integers(0, 8, 50)
    v = rng.integers(1, 5, 50)
    a = csc_from_triples(r, c, v, 10, 8, merge=lambda x, y: x)
    d = a.to_dense()
    at = a.transpose()
    assert np.array_equal(at.to_dense(), d.T)
    assert a.sorted_within_columns()
    # dense check against numpy scatter with keep-first merge
    expect = np.zeros((10, 8))
    seen = set()
    for i in range(50):
        if (r[i], c[i]) not in seen:
            expect[r[i], c[i]] = v[i]
            seen.add((r[i], c[i]))
    assert np.array_equal(d, expect)


def test_matrix_market_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    a = csc_from_triples(
        rng.integers(0, 6, 20), rng.integers(0, 5, 20),
        rng.integers(1, 9, 20).astype(float), 6, 5,
    )
    p = tmp_path / "m.mtx"
    write_matrix_market(str(p), a)
    b = read_matrix_market(str(p))
    assert np.array_equal(a.to_dense(), b.to_dense())


def test_spgemm_count_oracle():
    rng = np.random.default_rng(2)
    a = csc_from_triples(rng.integers(0, 7, 30), rng.integers(0, 6, 30), None, 7, 6)
    b = csc_from_triples(rng.integers(0, 6, 25), rng.integers(0, 5, 25), None, 6, 5)
    c = spgemm_count(a, b)
    assert np.array_equal(c.to_dense(), a.to_dense() @ b.to_dense())


def test_rmat_shapes_and_skew():
    r, c = rmat_triples(scale=8, edge_factor=8, seed=3)
    assert len(r) == 256 * 8
    assert r.max() < 256 and c.max() < 256
    # R-MAT is skewed: top vertex has far more than average degree
    counts = np.bincount(r, minlength=256)
    assert counts.max() > 4 * counts.mean()


def test_markov_expected_overlap():
    # error-free: expect exactly k bases
    assert abs(expected_steps_to_shared_kmer(17, 0.0) - 17.0) < 1e-9
    # noisy: far more than k
    e15 = expected_steps_to_shared_kmer(17, 0.15)
    assert e15 > 100
    assert min_overlap_for_detection(17, 0.15) > e15


def test_device_spgemm_matches_oracle():
    rng = np.random.default_rng(7)
    from bella_tpu.sparse.spgemm import spgemm

    a = csc_from_triples(
        rng.integers(0, 40, 300), rng.integers(0, 30, 300),
        rng.integers(1, 5, 300).astype(float), 40, 30,
        merge=lambda x, y: x + y,
    )
    b = csc_from_triples(
        rng.integers(0, 30, 250), rng.integers(0, 35, 250),
        rng.integers(1, 5, 250).astype(float), 30, 35,
        merge=lambda x, y: x + y,
    )
    c = spgemm(a, b)
    assert np.allclose(c.to_dense(), a.to_dense() @ b.to_dense())


def test_device_spgemm_rmat():
    from bella_tpu.sparse.spgemm import spgemm

    r, c = rmat_triples(scale=6, edge_factor=4, seed=9)
    n = 64
    a = csc_from_triples(r, c, np.ones(len(r)), n, n, merge=lambda x, y: x + y)
    got = spgemm(a, a)
    assert np.allclose(got.to_dense(), a.to_dense() @ a.to_dense())
