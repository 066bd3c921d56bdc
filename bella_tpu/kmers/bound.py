"""Reliable k-mer frequency bounds from the binomial coverage model.

Port of the math in reference kmercode/bound.cpp:40-95: given sequencing
depth d, per-base error rate e, and k-mer length k, a correct k-mer
occurrence at one genome position is Binomial(d, (1-e)^k). The bounds
bracket the central probability mass `min_probability`; the driver uses
-u/-l flags by default (src/main.cpp:173-174) but this path is kept for
parity (and used by `--auto-bounds`).

Implemented with log-gamma instead of long-double factorials.
"""

from __future__ import annotations

from math import exp, lgamma, log


def _log_binom_pmf(n: int, m: int, p_kmer_correct: float) -> float:
    if p_kmer_correct <= 0.0:
        return float("-inf")
    log_choose = lgamma(n + 1) - lgamma(m + 1) - lgamma(n - m + 1)
    # note: reference computes (1-e)^(m*k) * (1-(1-e)^k)^(n-m), i.e. the
    # binomial pmf in success probability (1-e)^k
    return (
        log_choose
        + m * log(p_kmer_correct)
        + (n - m) * log(max(1.0 - p_kmer_correct, 1e-300))
    )


def compute_upper(coverage: int, error_rate: float, kmer_size: int, min_probability: float) -> int:
    """Largest reliable multiplicity: walk m downward from `coverage`
    accumulating pmf mass until it reaches min_probability
    (kmercode/bound.cpp:40-65). Returns m+1 as the reference does."""
    p = (1.0 - error_rate) ** kmer_size
    total = 0.0
    m = coverage
    prev = None
    while total < min_probability and m >= 0:
        total += exp(_log_binom_pmf(coverage, m, p))
        if prev is not None and total == prev and total < min_probability:
            break
        prev = total
        m -= 1
    return m + 1  # the last multiplicity whose mass was included


def compute_lower(coverage: int, error_rate: float, kmer_size: int, min_probability: float) -> int:
    """Smallest reliable multiplicity, walking m upward from 2
    (kmercode/bound.cpp:68-95); never below 2 (singletons are noise)."""
    p = (1.0 - error_rate) ** kmer_size
    total = 0.0
    m = 2
    prev = None
    while total < min_probability and m <= coverage:
        total += exp(_log_binom_pmf(coverage, m, p))
        if prev is not None and total == prev and total < min_probability:
            break
        prev = total
        m += 1
    return max(m - 1, 2)


def estimate_coverage(reads, config) -> int:
    """Estimate sequencing depth from the corpus itself, replacing the
    reference's requirement that the user supply `--coverage`.

    Model: a genomic k-mer locus at depth d yields ~Poisson(lam)
    error-free occurrences with lam = d * (1-e)^k (each copy survives
    intact with probability (1-e)^k, bound.cpp's success probability).
    Error k-mers are overwhelmingly singletons, so the multiplicity-
    >= 2 population is dominated by genomic k-mers and its mean
    multiplicity is the zero-and-one-truncated Poisson mean
        m2(lam) = lam * (1 - exp(-lam)) / (1 - exp(-lam) - lam*exp(-lam)).
    The exact (D_ge2, M_ge2) counters (kmers/count.multiplicity_stats
    — the statistics the reference approximates with HyperLogLog,
    kmercode/hyperloglog.hpp:49-108) give the observed mean; solving
    m2(lam) = M_ge2/D_ge2 by bisection and dividing by (1-e)^k yields
    the depth. Returns 0 when the corpus carries no usable signal
    (callers must then require an explicit --coverage)."""
    from bella_tpu.kmers.count import multiplicity_stats

    _, _, d2, m2_mass = multiplicity_stats(reads, config)
    if d2 < 16:
        return 0
    m_obs = m2_mass / d2
    if m_obs <= 2.0005:
        return 0

    def trunc_mean(lam: float) -> float:
        if lam < 1e-9:
            return 2.0
        z = exp(-lam)
        denom = 1.0 - z - lam * z
        if denom <= 0:
            return 2.0
        return lam * (1.0 - z) / denom

    lo, hi = 1e-6, 4.0
    while trunc_mean(hi) < m_obs and hi < 1e6:
        hi *= 2.0
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        if trunc_mean(mid) < m_obs:
            lo = mid
        else:
            hi = mid
    lam = 0.5 * (lo + hi)
    p = (1.0 - config.effective_error_rate) ** config.kmer_size
    if p <= 0:
        return 0
    return max(int(round(lam / p)), 1)
