"""Repeat-rich accuracy cross-validation vs the reference binary.

The E. coli demo reads (not vendored upstream, .MISSING_LARGE_BLOBS)
carry genomic repeats — the content class where chaining/binning
policies genuinely diverge (reads from different repeat copies share
k-mers and even align, without true genomic overlap). This script
builds a ~25%-repeat corpus (tandem + dispersed diverged copies,
io/simulate.random_genome_with_repeats), runs BOTH tools with identical
flags, and scores both against the simulated truth at the 2 kb cutoff.

Usage: python scripts/crossval_repeats.py [workdir]
Requires the reference binary at .refbuild/bella (build via
scripts/crossval_reference.sh).

Round-5 result (recorded in BASELINE.md): RC 94.53 vs the
reference's 94.55, PR 91.22 vs 90.02 (bella_tpu MORE precise on
repeat-induced pairs) — the quantized-bin majority vote matches the
reference's data-order chainop on repeat content.
"""

import os
import subprocess
import sys


def main():
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/crossval_repeats"
    os.makedirs(wd, exist_ok=True)
    refbin = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bella")

    from bella_tpu.io.simulate import (
        random_genome_with_repeats,
        sample_reads,
        write_fastq,
        write_truth,
    )

    g = random_genome_with_repeats(60_000, seed=81, repeat_frac=0.25)
    reads, truth = sample_reads(
        g, 600, mean_len=3000, min_len=1200, error_rate=0.15, seed=82,
        circular=False,
    )
    fq = os.path.join(wd, "rep.fastq")
    write_fastq(fq, reads)
    write_truth(os.path.join(wd, "rep.truth"), truth)
    fofn = os.path.join(wd, "rep.fofn")
    with open(fofn, "w") as f:
        f.write(fq + "\n")

    from bella_tpu import BellaConfig
    from bella_tpu.pipeline import run_pipeline

    run_pipeline(reads, BellaConfig(), os.path.join(wd, "rep_tpu.out"))

    if os.path.exists(refbin):
        subprocess.run(
            [refbin, "-f", fofn, "-o", os.path.join(wd, "rep_ref"),
             "-k", "17", "-e", "0.15"],
            check=True,
        )
    else:
        print("reference binary missing (.refbuild/bella); skipping", file=sys.stderr)

    from bella_tpu.eval.evaluate import (
        evaluate_sets,
        load_truth,
        parse_bella,
        truth_pairs,
    )

    G = truth_pairs(load_truth(os.path.join(wd, "rep.truth")), 2000)
    print("bella_tpu:", evaluate_sets(
        parse_bella(os.path.join(wd, "rep_tpu.out")), G))
    if os.path.exists(refbin):
        print("reference:", evaluate_sets(
            parse_bella(os.path.join(wd, "rep_ref.out")), G))


if __name__ == "__main__":
    main()
