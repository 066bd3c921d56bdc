"""Background compile prewarm (align/xdrop.py prewarm_align_kernels).

The prewarm thread mirrors align_candidates' shape derivation; these
tests pin the shared helpers and the join/cancel handshake so the two
can't drift silently (drift = wasted compiles, never wrong results).
"""

import threading

import numpy as np
import pytest

from bella_tpu.align import xdrop
from bella_tpu.align.xdrop import (
    _batch_bucket,
    _length_tier,
    _sync_prewarm,
    prewarm_align_kernels,
)
from bella_tpu.config import BellaConfig


def test_length_tier_pow4_ladder():
    lens = np.array([1, 256, 300, 512, 1000, 1024, 1100, 4096, 5000, 20000])
    tiers = _length_tier(lens, 16384)
    assert tiers.tolist() == [
        512, 512, 1024, 1024, 1024, 1024, 4096, 4096, 16384, 16384,
    ]
    # cap at lmax
    assert _length_tier(np.array([20000]), 4096).tolist() == [4096]


def test_length_tier_matches_dispatch_superset():
    # a pair's tier = tier of its longer read, so read-length tiers are
    # a superset of pair tiers (the prewarm invariant)
    rng = np.random.default_rng(0)
    lens = rng.integers(200, 30000, size=300)
    lmax = int(((lens.max() + 511) // 512) * 512)
    read_tiers = set(_length_tier(lens, lmax).tolist())
    h = rng.integers(0, 300, size=1000)
    v = rng.integers(0, 300, size=1000)
    pair_tiers = set(
        _length_tier(np.maximum(lens[h], lens[v]), lmax).tolist()
    )
    assert pair_tiers <= read_tiers


def test_batch_bucket():
    assert _batch_bucket(10, 4096) == 64      # tiny run: floor bucket
    assert _batch_bucket(100, 4096) == 128    # pow2 >= P
    assert _batch_bucket(10**6, 4096) == 4096 # big run: full batch
    assert _batch_bucket(1, 4096, ndev=8) == 64


class _FakeThread:
    def __init__(self):
        self.joined = False

    def join(self):
        self.joined = True


def _install_fake(key):
    t = _FakeThread()
    ev = threading.Event()
    xdrop._PREWARM.update(thread=t, key=key, cancel=ev)
    return t, ev


def test_sync_prewarm_joins_on_match_and_subset():
    key = (100, 64, 4096, frozenset({512, 1024}), 7, 17, 256, 0)
    t, ev = _install_fake(key)
    # identical key
    _sync_prewarm(key)
    assert t.joined and not ev.is_set()
    assert xdrop._PREWARM["thread"] is None
    # pair tiers a strict subset of prewarmed read tiers: still a match
    t, ev = _install_fake(key)
    _sync_prewarm((100, 64, 4096, frozenset({512}), 7, 17, 256, 0))
    assert t.joined and not ev.is_set()


@pytest.mark.parametrize("fg_key", [
    None,                                                   # non-pallas path
    (101, 64, 4096, frozenset({512}), 7, 17, 256, 0),       # R mismatch
    (100, 64, 2048, frozenset({512}), 7, 17, 256, 0),       # batch mismatch
    (100, 64, 4096, frozenset({512, 4096}), 7, 17, 256, 0), # missing tier
    (100, 64, 4096, frozenset({512}), 9, 17, 256, 0),       # xdrop mismatch
])
def test_sync_prewarm_cancels_on_mismatch(fg_key):
    key = (100, 64, 4096, frozenset({512, 1024}), 7, 17, 256, 0)
    t, ev = _install_fake(key)
    _sync_prewarm(fg_key)
    assert not t.joined and ev.is_set()
    assert xdrop._PREWARM["thread"] is None


def test_sync_prewarm_noop_without_thread():
    assert xdrop._PREWARM["thread"] is None
    _sync_prewarm((1, 2, 3, frozenset(), 7, 17, 256, 0))  # must not raise


def test_prewarm_noop_off_tpu():
    # CPU test mesh: pallas_available() is False -> prewarm declines
    cfg = BellaConfig()
    assert prewarm_align_kernels(np.array([1000, 2000]), cfg) is False
    assert xdrop._PREWARM["thread"] is None
    # disabled knob declines regardless of backend
    cfg2 = BellaConfig(prewarm=False, aligner_backend="pallas")
    assert prewarm_align_kernels(np.array([1000]), cfg2) is False
