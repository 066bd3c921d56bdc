from bella_tpu.kmers.count import (
    KmerOccurrences,
    extract_occurrences,
    count_kmers,
    build_reliable_triples,
    ReliableTriples,
)
from bella_tpu.kmers.bound import compute_lower, compute_upper, estimate_coverage

__all__ = [
    "KmerOccurrences",
    "extract_occurrences",
    "count_kmers",
    "build_reliable_triples",
    "ReliableTriples",
    "compute_lower",
    "compute_upper",
    "estimate_coverage",
]
