"""Demo-geometry cross-validation: the reference's E. coli demo READS
are not vendored (dataset/selfSampleData is a download stub), but
dataset/ecsample-truth.txt carries every demo read's genomic interval —
the real read-length distribution and coverage unevenness. Reconstruct
the closest offline equivalent: a random 4.64 Mbp genome cut at the
REAL intervals (original read names, random strand, 15% error), run
both tools, and score BOTH against the actual ecsample-truth.txt.

Sequence content is synthetic (the real E. coli repeat structure is not
reproducible without the genome), so absolute precision is slightly
flattering for both tools equally; the geometry — lengths, coverage
skew, the 15,152-read truth join — is the real demo's.

Usage: [BELLA_CROSSVAL_TPU=1] python scripts/crossval_demo_geometry.py
(expects the reference binary at .refbuild/bella; build with
scripts/crossval_reference.sh)
"""
import os
import subprocess
import sys
import time

import numpy as np

TRUTH = "/root/reference/dataset/ecsample-truth.txt"
BUILD = os.environ.get("BUILD", "/root/repo/.refbuild")

sys.path.insert(0, "/root/repo")
from bella_tpu.io.simulate import random_genome, _apply_errors, _COMP  # noqa: E402


def main():
    rows = {}
    for line in open(TRUTH):
        _, name, s, e = line.split()
        rows[name] = (int(s), int(e))
    gmax = max(e for _, e in rows.values())
    g = random_genome(gmax, seed=777)
    rng = np.random.default_rng(778)

    fq = os.path.join(BUILD, "demo_geom.fastq")
    t0 = time.time()
    with open(fq, "w") as f:
        for name, (s, e) in rows.items():
            frag = g[s:e]
            if rng.integers(0, 2):
                frag = _COMP[frag[::-1]]
            noisy = _apply_errors(frag, 0.15, rng)
            seq = "".join("ACGT"[c] for c in noisy)
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    print(f"wrote {len(rows)} reads ({time.time()-t0:.0f}s)")
    fofn = os.path.join(BUILD, "demo_geom.fofn")
    open(fofn, "w").write(fq + "\n")

    ref_bin = os.path.join(BUILD, "bella")
    if os.path.exists(ref_bin):
        t0 = time.time()
        subprocess.run(
            [ref_bin, "-f", fofn, "-o", os.path.join(BUILD, "ref_geom"),
             "-k", "17", "-e", "0.15"],
            stderr=subprocess.DEVNULL, check=False)
        print(f"reference wall: {time.time()-t0:.0f} s")

    t0 = time.time()
    env = dict(os.environ)
    if os.environ.get("BELLA_CROSSVAL_TPU") != "1":
        env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   PYTHONPATH="/root/repo")
    else:
        env.update(PYTHONPATH="/root/repo:/root/.axon_site")
    subprocess.run(
        [sys.executable, "-m", "bella_tpu.cli", "-f", fofn, "-o",
         os.path.join(BUILD, "tpu_geom"), "-k", "17", "-e", "0.15"],
        env=env, stderr=subprocess.DEVNULL, check=False)
    print(f"bella_tpu wall: {time.time()-t0:.0f} s")

    from bella_tpu.eval import (evaluate_sets, load_truth, parse_bella,
                                truth_pairs)
    G = truth_pairs(load_truth(TRUTH), 2000)
    print(f"truth pairs (>=2kb): {len(G)}")
    for f in ("ref_geom.out", "tpu_geom.out"):
        path = os.path.join(BUILD, f)
        try:
            print(f, evaluate_sets(parse_bella(path, 2000), G,
                                   duplicate=True))
        except FileNotFoundError:
            print(f, "MISSING")


if __name__ == "__main__":
    main()
