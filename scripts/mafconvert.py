#!/usr/bin/env python3
"""PBSIM MAF -> simulated ground truth (role of script/mafconvert.py +
the -z evaluator path): each MAF block pairs the reference segment with
the simulated read; emits `ref start end read` rows (the simulated truth
column order, benchmark/evaluation.h:103-108).

Usage: mafconvert.py in.maf [out.txt]
"""

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("maf")
    ap.add_argument("out", nargs="?", default="truth.txt")
    args = ap.parse_args(argv)

    n = 0
    with open(args.maf) as f, open(args.out, "w") as out:
        block = []
        for line in f:
            if line.startswith("a"):
                block = []
            elif line.startswith("s"):
                block.append(line.split())
                if len(block) == 2:
                    ref, read = block
                    ref_name, ref_start, ref_size = ref[1], int(ref[2]), int(ref[3])
                    read_name = read[1]
                    out.write(
                        f"{ref_name} {ref_start} {ref_start + ref_size} {read_name}\n"
                    )
                    n += 1
    print(f"wrote {n} truth rows to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
