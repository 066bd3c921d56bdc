"""A/B probe for the rescue-cascade drift predictor (config.rescue_predict).

Builds a bench-protocol corpus (size via BELLA_BENCH_GENOME etc.), runs
detection once, then measures the align+decide phase with the predictor
ON vs OFF on the same pairs. The predictor routes early-truncated
saturated pairs straight to their predicted terminal rescue band
(align/xdrop.py:_predict_due), skipping intermediate cascade levels those
pairs would saturate anyway.

Measured r5 caveat: at 15% error most saturated pairs EDGE-RIDE the
corridor (extension reaches ~full overlap extent, drift censored at the
corridor max), so the predictor is a deliberate no-op for them and the
A/B is ~1.0x at the bench shape. To study the routing signal directly,
set BELLA_RESCUE_DUMP=/path.npz on any aligning run — the cascade dumps
(pair idx, initial sat, terminal band, overlap_est, final score) for
offline analysis; the r5 dump showed initial sat is only weakly
correlated with terminal band (means 82 vs ~94, heavily overlapped),
which is why censored pairs keep the doubling walk.

Single-chip protocol: run alone on a quiet chip (see
memory/tpu-toolchain-rules: never share the tunneled chip).

  BELLA_BENCH_GENOME=1200000 python scripts/rescue_predict_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GENOME = int(os.environ.get("BELLA_BENCH_GENOME", 1_200_000))
COVERAGE = int(os.environ.get("BELLA_BENCH_COVERAGE", 25))
MEAN_LEN = int(os.environ.get("BELLA_BENCH_MEAN_LEN", 6000))
REPS = int(os.environ.get("BELLA_PROBE_REPS", 3))


def main():
    from bella_tpu import BellaConfig
    from bella_tpu.align.xdrop import align_candidates
    from bella_tpu.io.simulate import random_genome, sample_reads
    from bella_tpu.overlap.decision import post_align_decision
    from bella_tpu.overlap.pairs import detect_overlaps

    cfg = BellaConfig()
    g = random_genome(GENOME, seed=0)
    n_reads = GENOME * COVERAGE // MEAN_LEN
    reads, _ = sample_reads(
        g, n_reads, mean_len=MEAN_LEN, min_len=1000, error_rate=0.15, seed=1
    )
    total = int(reads.lengths.sum())
    print(f"probe corpus: {reads.num_reads} reads, {total/1e6:.1f} Mbp",
          file=sys.stderr)
    pairs, _, _ = detect_overlaps(reads, cfg)
    print(f"pairs: {pairs.num_pairs}", file=sys.stderr)
    lens = reads.lengths.astype(np.int32)

    results = {}
    for label, predict in (("on", True), ("off", False)):
        cfg.rescue_predict = predict
        # warmup (compiles whatever band set this policy visits)
        aln = align_candidates(None, lens, pairs, cfg, reads=reads)
        dts = []
        for _ in range(REPS):
            t0 = time.time()
            aln = align_candidates(None, lens, pairs, cfg, reads=reads)
            post_align_decision(aln, pairs.read_h, pairs.read_v,
                                reads.lengths, cfg)
            dts.append(time.time() - t0)
        dt = sorted(dts)[len(dts) // 2]
        ab = int((aln.end_h - aln.beg_h).sum() + (aln.end_v - aln.beg_v).sum())
        results[label] = (dt, ab, sorted(round(x, 2) for x in dts))
        print(f"predict={label}: median {dt:.2f}s "
              f"({ab/dt/1e6:.1f} Mb/s aligned) samples={results[label][2]}",
              file=sys.stderr)

    on, off = results["on"][0], results["off"][0]
    print(f"speedup off->on: {off/on:.3f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
