#!/usr/bin/env python3
"""Ground-truth generation from a minimap2 SAM alignment of reads to a
reference (role of script/SAMparser.py): emits `ref read start end` rows
for mapped primary alignments, suitable for bella_tpu.eval.evaluate -G.

Usage: samparser.py in.sam [out.txt] [--min-mapq N]
"""

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sam")
    ap.add_argument("out", nargs="?", default="truth.txt")
    ap.add_argument("--min-mapq", type=int, default=0)
    args = ap.parse_args(argv)

    n = 0
    with open(args.sam) as f, open(args.out, "w") as out:
        for line in f:
            if line.startswith("@"):
                continue
            v = line.rstrip("\n").split("\t")
            if len(v) < 11:
                continue
            qname, flag, rname, pos, mapq = v[0], int(v[1]), v[2], int(v[3]), int(v[4])
            if rname == "*" or flag & 0x4:      # unmapped
                continue
            if flag & 0x100 or flag & 0x800:    # secondary/supplementary
                continue
            if mapq < args.min_mapq:
                continue
            # reference span from CIGAR (M/D/N/=/X consume reference)
            span = 0
            num = ""
            for ch in v[5]:
                if ch.isdigit():
                    num += ch
                else:
                    if ch in "MDN=X":
                        span += int(num)
                    num = ""
            if span == 0:
                span = len(v[9]) if v[9] != "*" else 0
            out.write(f"{rname} {qname} {pos - 1} {pos - 1 + span}\n")
            n += 1
    print(f"wrote {n} truth rows to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
