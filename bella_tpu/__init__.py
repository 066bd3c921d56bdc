"""bella_tpu — a TPU-native long-read overlap/alignment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of PASSIONLab/BELLA
(reference: /root/reference, a C++/OpenMP/CUDA shared-memory pipeline).

Pipeline (mirrors reference README.md:97-109, re-architected TPU-first):
  1. ingest FASTQ reads                         (host, numpy + native C parser)
  2. k-mer extraction + reliable-k-mer counting (device, sort-based exact)
  3. reads x kmers sparse matrix                (device, sort + prefix sums)
  4. candidate-pair generation = A @ A^T with a positional semiring
     (device, sort-based SpGEMM over bounded-occurrence k-mer segments)
  5. chaining/binning -> one seed per pair      (device, segment ops)
  6. batched banded x-drop seed-and-extend      (device, wavefront kernel)
  7. adaptive Chernoff-bound score threshold + M4/PAF output (host)

The library uses 64-bit integers for packed k-mers (k <= 32, 2 bits/base,
reference kmercode/Kmer.hpp:30-132), so x64 mode is enabled at import.
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: compiles on this environment's tunneled
# TPU take minutes, so cache aggressively across processes.
_cache_dir = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/jax_bella")
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without these flags
    pass

from bella_tpu.config import BellaConfig  # noqa: E402

__version__ = "0.1.0"
__all__ = ["BellaConfig", "__version__"]
