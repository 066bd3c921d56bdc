"""Profile the in-pipeline alignment phase stage by stage.

The aligner microbenchmark (align_bench.py) measures the kernel alone on
homogeneous batches; the full pipeline pays extra for sequence gathers,
batch sorting, host syncs, and lockstep-block divergence. This script
runs the real pipeline workload and splits the alignment wall time into
those parts to direct tuning (ROADMAP item 2).

  python scripts/align_profile.py [--genome 300000] [--coverage 25]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=300_000)
    ap.add_argument("--coverage", type=int, default=25)
    ap.add_argument("--mean-len", type=int, default=6000)
    ap.add_argument("--err", type=float, default=0.15)
    ap.add_argument("--batch", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bella_tpu import BellaConfig
    from bella_tpu.align import xdrop as xd
    from bella_tpu.io.simulate import random_genome, sample_reads
    from bella_tpu.overlap.pairs import detect_overlaps

    cfg = BellaConfig()
    g = random_genome(args.genome, seed=0)
    n_reads = args.genome * args.coverage // args.mean_len
    reads, _ = sample_reads(
        g, n_reads, mean_len=args.mean_len, min_len=1000,
        error_rate=args.err, seed=1,
    )
    print(f"workload: {reads.num_reads} reads, "
          f"{reads.lengths.sum()/1e6:.1f} Mbp", file=sys.stderr)

    t0 = time.perf_counter()
    pairs, num_kmers, nnz = detect_overlaps(reads, cfg)
    print(f"detect_overlaps: {pairs.num_pairs} pairs "
          f"({time.perf_counter()-t0:.2f}s)", file=sys.stderr)

    padded, lens = xd.pad_reads(reads)
    print(f"padded reads: {padded.shape}", file=sys.stderr)

    # instrument the batch function: wrap to time gather-prep vs kernel
    times = {"prep": 0.0, "kernel": 0.0, "host": 0.0, "n_batches": 0}
    orig = xd._seed_extend_batch_pallas

    def timed(*a, **kw):
        t = time.perf_counter()
        out = orig(*a, **kw)
        jax.block_until_ready(out)
        times["kernel"] += time.perf_counter() - t
        times["n_batches"] += 1
        return out

    xd._seed_extend_batch_pallas = timed
    try:
        # warm-up/compile on the first batch shape happens inside; time
        # the whole align_candidates twice: first includes compiles
        t0 = time.perf_counter()
        aln = xd.align_candidates(padded, lens, pairs, cfg,
                                  batch_size=args.batch)
        t_total_warm = time.perf_counter() - t0
        k1 = times["kernel"]; n1 = times["n_batches"]
        times["kernel"] = 0.0; times["n_batches"] = 0
        t0 = time.perf_counter()
        aln = xd.align_candidates(padded, lens, pairs, cfg,
                                  batch_size=args.batch)
        t_total = time.perf_counter() - t0
    finally:
        xd._seed_extend_batch_pallas = orig

    P = pairs.num_pairs
    aligned = int((aln.end_h - aln.beg_h).sum() + (aln.end_v - aln.beg_v).sum())
    print(f"warm run: total={t_total_warm:.2f}s (kernel+prep dispatch "
          f"{k1:.2f}s over {n1} batches)", file=sys.stderr)
    print(f"steady run: total={t_total:.2f}s over {times['n_batches']} "
          f"batches; device(dispatch+sync)={times['kernel']:.2f}s; "
          f"python/other={t_total-times['kernel']:.2f}s", file=sys.stderr)
    print(f"{P} pairs: {1e3*t_total/P:.3f} ms/pair, "
          f"{aligned/t_total/1e6:.1f} Mbases/s aligned", file=sys.stderr)

    # step-count distribution per batch: lockstep blocks of 8 run until
    # the slowest member dies => per-block cost ~ max step count. Use
    # the post-hoc extension sizes as a proxy for steps actually run.
    ext_len = np.concatenate([
        (aln.end_h - aln.beg_h) + (aln.end_v - aln.beg_v),
    ])
    order = (np.argsort(pairs.overlap_est, kind="stable")
             if pairs.overlap_est.size and pairs.overlap_est.max() > 0
             else np.argsort(np.maximum(lens[pairs.read_h],
                                        lens[pairs.read_v]), kind="stable"))
    bs = args.batch if args.batch > 0 else cfg.align_batch
    per_batch = [ext_len[order[s:s+bs]] for s in range(0, P, bs)]
    waste = []
    for b in per_batch:
        srt = np.sort(b)
        blocks = [srt[i:i+8] for i in range(0, len(srt), 8)]
        ideal = sum(x.sum() for x in blocks)
        actual = sum(x.max() * len(x) for x in blocks)
        waste.append(actual / max(ideal, 1))
    print(f"lockstep divergence (proxy): mean block-waste factor "
          f"{np.mean(waste):.2f}x (1.0 = perfectly homogeneous)",
          file=sys.stderr)
    print(f"extension length: p50={np.percentile(ext_len,50):.0f} "
          f"p90={np.percentile(ext_len,90):.0f} "
          f"max={ext_len.max()}", file=sys.stderr)


if __name__ == "__main__":
    main()
