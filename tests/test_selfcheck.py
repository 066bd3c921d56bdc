"""--selfcheck host oracles vs the device pipeline (the sanitizer/
consistency-switch role of makefile-nersc:17-23,70)."""

import numpy as np
import pytest

from bella_tpu import BellaConfig
from bella_tpu.io.simulate import random_genome, sample_reads
from bella_tpu.overlap.pairs import detect_overlaps
from bella_tpu.pipeline import run_pipeline
from bella_tpu.utils import selfcheck


def _reads(seed=41):
    g = random_genome(8000, seed=seed)
    reads, _ = sample_reads(
        g, 30, mean_len=1100, min_len=500, error_rate=0.1,
        seed=seed + 1, circular=False,
    )
    return reads


def test_recount_matches_device():
    reads = _reads()
    cfg = BellaConfig()
    pairs, nk, nnz = detect_overlaps(reads, cfg)
    selfcheck.check_detection(reads, cfg, nk, nnz)
    selfcheck.check_pairs(reads, pairs, cfg)


def test_recount_matches_device_hopc():
    reads = _reads(seed=43)
    cfg = BellaConfig(use_hopc=True)
    pairs, nk, nnz = detect_overlaps(reads, cfg)
    selfcheck.check_detection(reads, cfg, nk, nnz)
    selfcheck.check_pairs(reads, pairs, cfg)


def test_detects_corruption():
    reads = _reads(seed=45)
    cfg = BellaConfig()
    pairs, nk, nnz = detect_overlaps(reads, cfg)
    with pytest.raises(selfcheck.SelfCheckError):
        selfcheck.check_detection(reads, cfg, nk + 1, nnz)
    assert pairs.num_pairs > 0
    # shift every seed's V position one base: the canonical k-mer there
    # no longer matches the H seed
    pairs.pos_v = np.where(pairs.pos_v > 0, pairs.pos_v - 1, pairs.pos_v + 1)
    with pytest.raises(selfcheck.SelfCheckError):
        selfcheck.check_pairs(reads, pairs, cfg)


def test_pipeline_selfcheck_flag():
    reads = _reads(seed=47)
    res = run_pipeline(reads, BellaConfig(selfcheck=True))
    assert res.num_output > 0


def test_pipeline_selfcheck_modular_path():
    # minimizer selection routes through the modular path; the recount
    # is skipped there but the seed spot-check still runs
    reads = _reads(seed=49)
    res = run_pipeline(
        reads, BellaConfig(selfcheck=True, window_len=5, skip_alignment=True)
    )
    assert res.pairs.num_pairs > 0
