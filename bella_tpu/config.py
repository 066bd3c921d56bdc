"""Run configuration.

Mirrors the reference's ``BELLApars`` struct (include/common/common.h:46-74)
and the CLI flag set (src/main.cpp:74-94), plus TPU-specific knobs
(capacities, band width, batch sizes) that replace the reference's
free-RAM probing (include/overlap.hpp:365-404).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class BellaConfig:
    # --- reference BELLApars (include/common/common.h:46-74) ---
    kmer_size: int = 17            # -k
    bin_size: int = 500            # -b  chaining bin width
    fixed_threshold: int = -1      # debug-only fixed alignment score cutoff
    xdrop: int = 7                 # -x
    split_count: int = 1           # --split-count  k-mer-space passes
    estimate_err: bool = False     # --estimate  (error rate from quals)
    skip_alignment: bool = False   # --skip-alignment  overlap-only output
    output_paf: bool = False       # --paf
    use_hopc: bool = False         # --hopc homopolymer-compressed k-mers
    delta_chernoff: float = 0.10   # --score-deviation
    total_memory_mb: float = 0.0   # -m  staging budget; 0 = probe the
                                   # device (the reference probes free
                                   # RAM the same way unless -m is
                                   # given, include/overlap.hpp:365-404)
    error_rate: float = 0.15       # -e
    hopc_error_rate: float = 0.035 # error rate used when use_hopc is on
    use_syncmer: bool = False      # -s
    use_minimizer: bool = False    # set when window_len > 0
    window_len: int = 0            # -w  minimizer window
    lower_freq: int = 2            # -l  reliable k-mer lower bound
    upper_freq: int = 8            # -u  reliable k-mer upper bound
    smer_len: int = 5              # syncmer s-mer length (include/syncmer.hpp:47)
    auto_bounds: bool = False      # --auto-bounds  derive [lower,upper] from
                                   # coverage via the binomial model
                                   # (kmercode/bound.cpp:40-95)
    coverage: int = 0              # --coverage for --auto-bounds; 0 =
                                   # estimate depth from the corpus's exact
                                   # multiplicity stats (kmers/bound.py
                                   # estimate_coverage)

    # --- TPU-native knobs (no reference equivalent; replace RAM probing) ---
    band_width: int = 128          # x-drop aligner band (lanes); ref uses 31
                                   # (xavier/simdutils.h:22-31); 128 = VPU lane dim
    aligner_backend: str = "auto"  # auto | pallas | jax  (auto = pallas on TPU,
                                   # adaptive-band pure-JAX elsewhere)
    pallas_band: int = 128         # static centered band of the Pallas kernel
                                   # (128 measured best with the cascade
                                   # rescue: 85.2 vs 76.0 Mbases/s at 256 on
                                   # the bench corpus, identical pass set;
                                   # ~5% of pairs drift past W/2 and re-extend
                                   # at 256/512)
    band_rescue: bool = True       # re-extend pairs that saturate the static
                                   # band through a cascade of 2x-band kernel
                                   # passes up to rescue_ceiling; whatever
                                   # still saturates the widest pass re-runs
                                   # through the adaptive-band jax backend on
                                   # a compacted read set (exactness for
                                   # arbitrary indel drift, matching the
                                   # reference's unbounded adaptive band,
                                   # xavier/simdutils.h:263-289)
    rescue_predict: bool = True    # drift predictor: route each saturated
                                   # pair straight to its predicted terminal
                                   # rescue band (drift-rate extrapolation
                                   # from the truncated first extension x the
                                   # overlapop estimate) instead of walking
                                   # every cascade level; mispredicting low
                                   # falls back to the doubling walk,
                                   # mispredicting high costs one wider pass
                                   # (score still max-of-visited-bands)
    rescue_ceiling: int = 2048     # widest static rescue band (>= 2x
                                   # pallas_band is always tried).
                                   # Measured on the bench corpus: 2048
                                   # resolves every drifted pair in-kernel
                                   # AND is fastest (2.38 s vs 2.80 at 512,
                                   # where 70 pairs took the jax tail);
                                   # the tail remains as the terminal
                                   # exactness guarantee for longer drift
    align_batch: int = 4096        # alignment pairs per device batch
                                   # (ref: 30000/GPU, include/align.hpp:35)
    max_steps: Optional[int] = None  # wavefront step cap; None = len-derived
                                   # (2 * padded read length, xdrop.py)
    prewarm: bool = True           # compile align-kernel tier variants in a
                                   # background thread during detection
                                   # (cold-start jit overlap; xdrop.py
                                   # prewarm_align_kernels)
    selfcheck: bool = False        # --selfcheck  cross-validate device
                                   # results against host numpy oracles
                                   # (utils/selfcheck.py; the sanitizer/
                                   # serial-mode role of makefile-nersc:
                                   # 17-23,70) — debug mode, O(corpus)
                                   # host work
    devices: int = 0               # --devices  mesh size for distributed
                                   # detection + data-parallel alignment
                                   # (0/1 = single-device pipeline)
    seed: int = 0                  # PRNG seed for synthetic generators
    write_matrix: Optional[str] = None  # dump reads x kmers matrix (bellaio)
    checkpoint: Optional[str] = None    # save/resume reliable triples (npz)
    profile_dir: Optional[str] = None   # jax.profiler trace directory

    def __post_init__(self):
        if self.kmer_size < 1 or self.kmer_size > 32:
            raise ValueError("kmer_size must be in [1, 32] (2-bit packed uint64)")
        if self.window_len:
            self.use_minimizer = True
        if self.use_syncmer:
            self.use_minimizer = False
        if not (0.0 <= self.delta_chernoff <= 1.0):
            raise ValueError("delta_chernoff must be in [0, 1]")

    @property
    def effective_error_rate(self) -> float:
        """Error rate driving the adaptive threshold (src/main.cpp:307-314)."""
        return self.hopc_error_rate if self.use_hopc else self.error_rate

    @property
    def effective_memory_mb(self) -> float:
        """Staging budget: the -m flag when given, else the accelerator's
        memory (estimateMemory parity, include/overlap.hpp:365-404;
        falls back to the reference's 8 GB default off-accelerator)."""
        if self.total_memory_mb > 0:
            return self.total_memory_mb
        global _PROBED_MEMORY_MB
        if _PROBED_MEMORY_MB is None:
            probed = 8000.0
            try:
                import jax

                dev = jax.devices()[0]
                stats = dev.memory_stats() or {}
                limit = stats.get("bytes_limit")
                if limit:
                    probed = limit / 1e6
                elif dev.platform == "tpu":
                    # some TPU runtimes (e.g. tunneled PJRT plugins)
                    # report no memory stats; fall back to the HBM of
                    # the device kind
                    kind = dev.device_kind.lower()
                    hbm_gb = {
                        "tpu v5 lite": 16, "tpu v5e": 16, "tpu v4": 32,
                        "tpu v5": 95, "tpu v5p": 95, "tpu v6 lite": 32,
                        "tpu v6e": 32,
                    }.get(kind)
                    if hbm_gb:
                        probed = hbm_gb * 1e3
            except Exception:
                pass
            _PROBED_MEMORY_MB = probed
        return _PROBED_MEMORY_MB


_PROBED_MEMORY_MB: Optional[float] = None
