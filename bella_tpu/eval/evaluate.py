"""Recall/precision/F1 evaluation of overlapper outputs vs ground truth.

Python port of the reference `result` binary (benchmark/evaluation.cpp,
benchmark/evaluation.h, benchmark/IntervalTree.h), with the interval tree
replaced by a vectorized sort-and-sweep join.

Semantics (benchmark/evaluation.h:591-628, benchmark/IntervalTree.h:166-209):
  * truth rows map reads to reference intervals; ground truth G = the set
    of ORDERED read pairs whose genomic intervals overlap by at least
    `min_overlap` bp (both (a,b) and (b,a) are in G; self-pairs excluded),
  * a tool's output S is a set of ordered pairs as printed (tools that
    print each unordered pair once are scored with RC = 2|T|/|G|,
    `duplicate=True`), with rows whose reported overlap length is below
    min_overlap dropped when alignment lengths are trusted,
  * T = G intersect S; RC = (2)|T|/|G|, PR = |T|/|S|, F1 harmonic mean.

Truth formats: real data `ref read start end` (script/SAMparser.py:18-21);
simulated (-z) `ref start end read` (evaluation.h:103-113).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Set, Tuple

import numpy as np

Pair = Tuple[str, str]


@dataclasses.dataclass
class Metrics:
    recall: float
    precision: float
    f1: float
    num_truth: int
    num_output: int
    num_true_positive: int

    def __str__(self):
        return (
            f"RC={self.recall:.2f}% PR={self.precision:.2f}% F1={self.f1:.2f}% "
            f"(|G|={self.num_truth}, |S|={self.num_output}, |T|={self.num_true_positive})"
        )


def load_truth(path: str, simulated: bool = False) -> Dict[str, List[Tuple[str, int, int]]]:
    """ref -> [(read, start, end)]. Separator is whitespace."""
    out: Dict[str, List[Tuple[str, int, int]]] = {}
    with open(path) as f:
        for line in f:
            v = line.split()
            if len(v) < 4:
                continue
            if simulated:
                ref, start, end, read = v[0], int(v[1]), int(v[2]), v[3]
            else:
                ref, read, start, end = v[0], v[1], int(v[2]), int(v[3])
            out.setdefault(ref, []).append((read, start, end))
    return out


def truth_pairs(
    truth: Dict[str, List[Tuple[str, int, int]]], min_overlap: int = 2000
) -> Set[Pair]:
    """All ordered read pairs with >= min_overlap bp genomic overlap.

    Sort-and-sweep replaces the reference interval tree: with intervals
    sorted by start, the partners of interval i are a contiguous start
    range filtered by end coordinate.
    """
    G: Set[Pair] = set()
    for ref, rows in truth.items():
        names = np.array([r[0] for r in rows])
        starts = np.array([r[1] for r in rows], dtype=np.int64)
        ends = np.array([r[2] for r in rows], dtype=np.int64)
        order = np.argsort(starts, kind="stable")
        names, starts, ends = names[order], starts[order], ends[order]
        n = len(rows)
        if n < 2:
            continue
        # fully vectorized sweep (the per-interval Python loop crawls at
        # millions of truth rows): partners of i are the contiguous
        # start-range (i, hi_i]; expand all ranges at once with repeat
        his = np.searchsorted(starts, ends - min_overlap, side="right")
        cnt = np.maximum(his - np.arange(n) - 1, 0)
        total = int(cnt.sum())
        if total == 0:
            continue
        ii = np.repeat(np.arange(n), cnt)
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(cnt, out=offs[1:])
        jj = np.arange(total, dtype=np.int64) - offs[ii] + ii + 1
        ov = np.minimum(ends[ii], ends[jj]) - np.maximum(starts[ii], starts[jj])
        keep = (ov >= min_overlap) & (names[ii] != names[jj])
        a, b = names[ii[keep]], names[jj[keep]]
        G.update(zip(a.tolist(), b.tolist()))
        G.update(zip(b.tolist(), a.tolist()))
    return G


def evaluate_sets(
    S: Set[Pair], G: Set[Pair], duplicate: bool = True
) -> Metrics:
    """RC/PR/F1 (benchmark/evaluation.h:591-628). `duplicate=True` for
    tools that print each unordered pair once (BELLA, minimap2, MHAP)."""
    T = S & G
    mult = 2 if duplicate else 1
    rc = 100.0 * mult * len(T) / len(G) if G else 0.0
    pr = 100.0 * len(T) / len(S) if S else 0.0
    f1 = 2 * rc * pr / (rc + pr) if rc + pr else 0.0
    return Metrics(rc, pr, f1, len(G), len(S), len(T))


# ----------------------------------------------------------------------
# Output-format parsers (evaluation.h:171-589 equivalents)
# ----------------------------------------------------------------------

def parse_bella(path: str, min_overlap: int = 2000, require_overlap: bool = True) -> Set[Pair]:
    """BELLA M4: nameV nameH sharedk score ov strand begV endV lenV begH
    endH lenH (12 cols, include/overlap.hpp:470-474). Also accepts the
    6-col --skip-alignment rows (nameV nameH sharedk ov lenV lenH,
    include/overlap.hpp:584-585), which the reference evaluator skips."""
    S: Set[Pair] = set()
    with open(path) as f:
        for line in f:
            v = line.rstrip("\n").split("\t")
            if len(v) == 12:
                ov = int(v[4])
            elif len(v) == 6:
                ov = int(v[3])
            else:
                continue
            if v[0] == v[1]:
                continue
            if require_overlap and ov < min_overlap:
                continue
            S.add((v[0], v[1]))
    return S


def parse_paf(path: str, min_overlap: int = 2000, require_overlap: bool = True) -> Set[Pair]:
    """PAF (minimap/minimap2 and BELLA --paf): qname qlen qstart qend
    strand tname tlen tstart tend ... (evaluation.h:242-312). Overlap
    length estimated from coordinates as in estimateOverlap
    (evaluation.h:33-35), but strand-aware: PAF target coordinates are
    forward-strand, so for '-' rows the margins pair crosswise (the
    reference estimator ignores strand and over/under-estimates '-'
    overlaps)."""
    S: Set[Pair] = set()
    with open(path) as f:
        for line in f:
            v = line.rstrip("\n").split("\t")
            if len(v) < 11:
                continue
            q, t = v[0], v[5]
            if q == t:
                continue
            qlen, qs, qe = int(v[1]), int(v[2]), int(v[3])
            tlen, ts, te = int(v[6]), int(v[7]), int(v[8])
            if v[4] == "-":
                ov = min(qs, tlen - te) + min(qlen - qe, ts) + ((qe - qs) + (te - ts)) // 2
            else:
                ov = min(qs, ts) + min(qlen - qe, tlen - te) + ((qe - qs) + (te - ts)) // 2
            if require_overlap and ov < min_overlap:
                continue
            S.add((q, t))
    return S


def parse_mhap(path: str, min_overlap: int = 2000, require_overlap: bool = True) -> Set[Pair]:
    """MHAP M4: id1 id2 err sharedmin strand1 beg1 end1 len1 strand2
    beg2 end2 len2 (evaluation.h:384-448)."""
    S: Set[Pair] = set()
    with open(path) as f:
        for line in f:
            v = line.split()
            if len(v) < 12 or v[0] == v[1]:
                continue
            b1, e1, l1 = int(v[5]), int(v[6]), int(v[7])
            b2, e2, l2 = int(v[9]), int(v[10]), int(v[11])
            ov = min(b1, b2) + min(l1 - e1, l2 - e2) + ((e1 - b1) + (e2 - b2)) // 2
            if require_overlap and ov < min_overlap:
                continue
            S.add((v[0], v[1]))
    return S


def parse_blasr(path: str, min_overlap: int = 2000, require_overlap: bool = True) -> Set[Pair]:
    """BLASR M4 (evaluation.h:450-519): qname tname score pctsim qstrand
    qstart qend qlen tstrand tstart tend tlen. BLASR may suffix read
    names with /0_len; strip the last /-field when it parses as range."""
    S: Set[Pair] = set()
    with open(path) as f:
        for line in f:
            v = line.split()
            if len(v) < 12:
                continue
            a, b = _strip_blasr(v[0]), _strip_blasr(v[1])
            if a == b:
                continue
            qs, qe, ql = int(v[5]), int(v[6]), int(v[7])
            ts, te, tl = int(v[9]), int(v[10]), int(v[11])
            ov = min(qs, ts) + min(ql - qe, tl - te) + ((qe - qs) + (te - ts)) // 2
            if require_overlap and ov < min_overlap:
                continue
            S.add((a, b))
    return S


def _strip_blasr(name: str) -> str:
    parts = name.rsplit("/", 1)
    if len(parts) == 2 and "_" in parts[1]:
        lo, _, hi = parts[1].partition("_")
        if lo.isdigit() and hi.isdigit():
            return parts[0]
    return name


def parse_mecat(path: str, idx_path: str, min_overlap: int = 2000,
                require_overlap: bool = True) -> Set[Pair]:
    """MECAT M4 with numeric read ids resolved via the idx2read table
    (evaluation.h:314-382, tomap at :39-57)."""
    names: Dict[str, str] = {}
    with open(idx_path) as f:
        lines = f.read().splitlines()
    for i in range(0, len(lines) - 1, 2):
        v = lines[i].split()
        if len(v) >= 2:
            names[v[0]] = v[1].lstrip(">")
    S: Set[Pair] = set()
    with open(path) as f:
        for line in f:
            v = line.split()
            if len(v) < 12 or v[0] == v[1]:
                continue
            a, b = names.get(v[0]), names.get(v[1])
            if a is None or b is None or a == b:
                continue
            b1, e1, l1 = int(v[5]), int(v[6]), int(v[7])
            b2, e2, l2 = int(v[9]), int(v[10]), int(v[11])
            ov = min(b1, b2) + min(l1 - e1, l2 - e2) + ((e1 - b1) + (e2 - b2)) // 2
            if require_overlap and ov < min_overlap:
                continue
            S.add((a, b))
    return S


def parse_daligner(path: str, min_overlap: int = 2000,
                   require_overlap: bool = True) -> Set[Pair]:
    """DALIGNER LAdump-style rows (evaluation.h:521-589): two read ids +
    coordinates; names are the numeric ids."""
    S: Set[Pair] = set()
    with open(path) as f:
        for line in f:
            v = line.split()
            if len(v) < 2 or v[0] == v[1]:
                continue
            S.add((v[0], v[1]))
    return S


def main(argv=None):
    """CLI mirroring the reference `result` binary (benchmark/evaluation.cpp:47-137)."""
    import argparse

    ap = argparse.ArgumentParser(
        prog="bella-eval", description="overlap recall/precision evaluator"
    )
    ap.add_argument("-G", "--truth", required=True, help="ground truth file")
    ap.add_argument("-B", "--bella", help="BELLA/M4 output")
    ap.add_argument("-P", "--paf", help="PAF output (minimap2 / bella --paf)")
    ap.add_argument("-H", "--mhap", help="MHAP output")
    ap.add_argument("-L", "--blasr", help="BLASR output")
    ap.add_argument("-D", "--daligner", help="DALIGNER output")
    ap.add_argument("-M", "--mecat", help="MECAT output")
    ap.add_argument("--mecat-idx", help="MECAT idx2read table")
    ap.add_argument("-z", "--simulated", action="store_true", help="simulated truth format")
    ap.add_argument("-l", "--min-overlap", type=int, default=2000)
    ap.add_argument("--no-overlap-filter", action="store_true",
                    help="keep output rows below min-overlap (skip-alignment runs)")
    args = ap.parse_args(argv)

    G = truth_pairs(load_truth(args.truth, args.simulated), args.min_overlap)
    req = not args.no_overlap_filter
    ran = False
    for name, S, dup in [
        ("bella", parse_bella(args.bella, args.min_overlap, req) if args.bella else None, True),
        ("paf", parse_paf(args.paf, args.min_overlap, req) if args.paf else None, True),
        ("mhap", parse_mhap(args.mhap, args.min_overlap, req) if args.mhap else None, True),
        ("blasr", parse_blasr(args.blasr, args.min_overlap, req) if args.blasr else None, False),
        ("daligner", parse_daligner(args.daligner, args.min_overlap, req) if args.daligner else None, False),
        (
            "mecat",
            parse_mecat(args.mecat, args.mecat_idx, args.min_overlap, req)
            if args.mecat
            else None,
            False,
        ),
    ]:
        if S is None:
            continue
        ran = True
        m = evaluate_sets(S, G, duplicate=dup)
        print(f"{name}: {m}")
    if not ran:
        ap.error("no output file given")


if __name__ == "__main__":
    main()
