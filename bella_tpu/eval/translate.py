"""Cross-tool output translation to PAF ("lost in translation",
benchmark/lostintranslation.cpp/h): converts BELLA M4, MHAP, BLASR, and
MECAT outputs to PAF rows so downstream tooling (miniasm etc.) can
consume any overlapper's result.
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict, Iterable, Optional


def bella_to_paf(lines: Iterable[str]) -> Iterable[str]:
    """M4: nameV nameH count score ov strand begV endV lenV begH endH lenH."""
    for line in lines:
        v = line.rstrip("\n").split("\t")
        if len(v) != 12:
            continue
        strand = "+" if v[5] == "n" else "-"
        bh, eh, lh = int(v[9]), int(v[10]), int(v[11])
        if strand == "-":
            bh, eh = lh - eh, lh - bh
        yield (
            f"{v[0]}\t{v[8]}\t{v[6]}\t{v[7]}\t{strand}\t"
            f"{v[1]}\t{v[11]}\t{bh}\t{eh}\t{v[3]}\t{v[4]}\t255\n"
        )


def mhap_to_paf(lines: Iterable[str]) -> Iterable[str]:
    """MHAP: id1 id2 err shared strand1 b1 e1 l1 strand2 b2 e2 l2."""
    for line in lines:
        v = line.split()
        if len(v) < 12:
            continue
        strand = "+" if v[4] == v[8] else "-"
        matches = max(int(float(v[3])), 0)
        yield (
            f"{v[0]}\t{v[7]}\t{v[5]}\t{v[6]}\t{strand}\t"
            f"{v[1]}\t{v[11]}\t{v[9]}\t{v[10]}\t{matches}\t{v[6]}\t255\n"
        )


def blasr_to_paf(lines: Iterable[str]) -> Iterable[str]:
    """BLASR M4: q t score pctsim qstrand qs qe ql tstrand ts te tl."""
    for line in lines:
        v = line.split()
        if len(v) < 12:
            continue
        strand = "+" if v[4] == v[8] else "-"
        yield (
            f"{v[0]}\t{v[7]}\t{v[5]}\t{v[6]}\t{strand}\t"
            f"{v[1]}\t{v[11]}\t{v[9]}\t{v[10]}\t{abs(int(v[2]))}\t{v[6]}\t255\n"
        )


def _estimate_overlap(bv: int, ev: int, lv: int, bh: int, eh: int, lh: int) -> int:
    """Overlap-length estimate when the tool reports none
    (benchmark/lostintranslation.h:53-62)."""
    return min(bv, bh) + min(lv - ev, lh - eh) + ((ev - bv) + (eh - bh)) // 2


def daligner_to_paf(lines: Iterable[str], error_rate: float = 0.15) -> Iterable[str]:
    """DALIGNER (BELLA-translated): cname rname rev cstart cend clen
    rstart rend rlen; score estimated as (1-e)^2 * ovlen
    (benchmark/lostintranslation.h:565-622)."""
    identity = (1.0 - error_rate) * (1.0 - error_rate)
    for line in lines:
        v = line.split()
        if len(v) < 9:
            continue
        strand = "+" if v[2] == "n" else "-"
        bv, ev, lv = int(v[3]), int(v[4]), int(v[5])
        bh, eh, lh = int(v[6]), int(v[7]), int(v[8])
        ovlen = _estimate_overlap(bv, ev, lv, bh, eh, lh)
        score = int(identity * ovlen)
        yield (
            f"{v[0]}\t{lv}\t{bv}\t{ev}\t{strand}\t"
            f"{v[1]}\t{lh}\t{bh}\t{eh}\t{score}\t{ovlen}\t255\n"
        )


def mecat_to_paf(lines: Iterable[str], names: Dict[str, str]) -> Iterable[str]:
    """MECAT M4 with numeric ids resolved via idx2read names."""
    for line in lines:
        v = line.split()
        if len(v) < 12:
            continue
        a = names.get(v[0], v[0])
        b = names.get(v[1], v[1])
        strand = "+" if v[4] == v[8] else "-"
        yield (
            f"{a}\t{v[7]}\t{v[5]}\t{v[6]}\t{strand}\t"
            f"{b}\t{v[11]}\t{v[9]}\t{v[10]}\t{v[2]}\t{v[6]}\t255\n"
        )


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="bella-translate", description="convert overlapper outputs to PAF"
    )
    ap.add_argument("--format", choices=["bella", "mhap", "blasr", "mecat", "daligner"],
                    required=True)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--mecat-idx")
    ap.add_argument("--error", type=float, default=0.15,
                    help="error rate for the DALIGNER score estimate")
    args = ap.parse_args(argv)
    with open(args.input) as f:
        lines = f.readlines()
    if args.format == "bella":
        rows = bella_to_paf(lines)
    elif args.format == "mhap":
        rows = mhap_to_paf(lines)
    elif args.format == "blasr":
        rows = blasr_to_paf(lines)
    elif args.format == "daligner":
        rows = daligner_to_paf(lines, args.error)
    else:
        names: Dict[str, str] = {}
        if args.mecat_idx:
            with open(args.mecat_idx) as f:
                content = f.read().splitlines()
            for i in range(0, len(content) - 1, 2):
                v = content[i].split()
                if len(v) >= 2:
                    names[v[0]] = v[1].lstrip(">")
        rows = mecat_to_paf(lines, names)
    with open(args.output, "w") as f:
        f.writelines(rows)


if __name__ == "__main__":
    main()
