import numpy as np
import pytest

import jax.numpy as jnp

from bella_tpu.utils import segments as seg


def _random_sorted_keys(n, nseg, seed):
    rng = np.random.default_rng(seed)
    keys = np.sort(rng.integers(0, nseg, n))
    vals = rng.integers(-50, 50, n)
    return keys, vals


@pytest.mark.parametrize("n,nseg", [(1, 1), (37, 5), (256, 40)])
def test_segment_reductions_match_numpy(n, nseg):
    keys, vals = _random_sorted_keys(n, nseg, seed=n)
    b = np.asarray(seg.boundaries(jnp.asarray(keys)))
    jb = jnp.asarray(b)
    jv = jnp.asarray(vals)

    got_sum = np.asarray(seg.seg_sum(jv, jb))
    got_max = np.asarray(seg.seg_max(jv, jb))
    got_min = np.asarray(seg.seg_min(jv, jb))
    got_cnt = np.asarray(seg.seg_count(jb))
    got_rank = np.asarray(seg.seg_rank(jb))
    got_ids = np.asarray(seg.seg_ids(jb))

    uniq = np.unique(keys)
    for i, k in enumerate(keys):
        m = keys == k
        assert got_sum[i] == vals[m].sum()
        assert got_max[i] == vals[m].max()
        assert got_min[i] == vals[m].min()
        assert got_cnt[i] == m.sum()
        assert got_ids[i] == np.searchsorted(uniq, k)
    # ranks are 0..len-1 within each segment
    for k in uniq:
        m = keys == k
        assert list(got_rank[m]) == list(range(m.sum()))


def test_boundaries2():
    a = jnp.asarray(np.array([0, 0, 0, 1, 1, 2]))
    b = jnp.asarray(np.array([5, 5, 6, 6, 6, 6]))
    got = np.asarray(seg.boundaries2(a, b))
    assert list(got) == [True, False, True, True, False, True]
