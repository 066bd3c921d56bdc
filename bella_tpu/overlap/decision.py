"""Post-alignment decision: adaptive Chernoff-bound score threshold.

Port of PostAlignDecision (include/overlap.hpp:413-497) and slope()
(include/align.hpp:72-80): a pair passes when

    score >= (1 - delta) * ratiophi * ov,
    ratiophi = (1-e)^2 - (1 - (1-e)^2),
    ov = min(begV, begH) + min(lenV-endV, lenH-endH) + (lenAlnV+lenAlnH)/2

or score >= fixed_threshold when one is set (debug path,
include/overlap.hpp:462-466).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def slope(error_rate: float) -> float:
    p_mat = (1.0 - error_rate) ** 2
    return p_mat - (1.0 - p_mat)


def post_align_decision(
    aln,
    read_h: np.ndarray,
    read_v: np.ndarray,
    read_lengths: np.ndarray,
    config,
) -> Dict[str, np.ndarray]:
    """Vectorized pass/fail + overlap length for aligned pairs."""
    len_h = read_lengths[read_h].astype(np.int64)
    len_v = read_lengths[read_v].astype(np.int64)
    aln_len_v = aln.end_v - aln.beg_v
    aln_len_h = aln.end_h - aln.beg_h
    min_left = np.minimum(aln.beg_v, aln.beg_h)
    min_right = np.minimum(len_v - aln.end_v, len_h - aln.end_h)
    ov = min_left + min_right + (aln_len_v + aln_len_h) // 2

    if config.fixed_threshold == -1:
        ratiophi = slope(config.effective_error_rate)
        threshold = (1.0 - config.delta_chernoff) * (ratiophi * ov.astype(np.float64))
        passed = aln.score.astype(np.float64) >= threshold
    else:
        passed = aln.score >= config.fixed_threshold
    return dict(passed=passed, overlap=ov.astype(np.int64))
