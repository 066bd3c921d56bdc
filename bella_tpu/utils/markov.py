"""Absorbing-Markov-chain model of expected overlap per correct k-mer.

Port of include/markov.hpp (an analysis artifact of the BELLA paper,
not wired into the reference driver either — kept as a utility):
states track the run of consecutive correct bases on both reads; a
shared k-mer requires k consecutive correct bases on both. The expected
number of steps to absorption (from the fundamental matrix
N = (I - Q)^-1) gives the expected overlap length needed to observe one
correct shared k-mer at error rate e.
"""

from __future__ import annotations

import numpy as np


def transition_matrix(k: int, p_correct: float) -> np.ndarray:
    """(k+1)x(k+1) chain over the current shared-correct run length;
    state k is absorbing (markov.hpp:105-158 structure)."""
    n = k + 1
    P = np.zeros((n, n))
    for s in range(k):
        P[s, s + 1] = p_correct
        P[s, 0] = 1.0 - p_correct
    P[k, k] = 1.0
    return P


def expected_steps_to_shared_kmer(k: int, error_rate: float) -> float:
    """Expected bases until both reads have a correct shared k-mer.
    Both reads must be correct at a base: p = (1-e)^2 (markovstep,
    markov.hpp:160-187)."""
    p = (1.0 - error_rate) ** 2
    P = transition_matrix(k, p)
    Q = P[:-1, :-1]
    N = np.linalg.inv(np.eye(k) - Q)
    # expected absorption time from state 0 = row sum of N
    return float(N[0].sum())


def min_overlap_for_detection(k: int, error_rate: float, confidence: float = 0.95) -> int:
    """Overlap length at which >= `confidence` probability of at least
    one shared correct k-mer (geometric tail on the expected rate)."""
    mean = expected_steps_to_shared_kmer(k, error_rate)
    # waiting times are approx geometric with mean `mean`
    n = int(np.ceil(-np.log(1.0 - confidence) * mean))
    return max(n, k)
