"""Overlap output writers: M4, PAF, and overlap-only rows.

Byte-format parity with the reference emitters:
  * M4 row:      include/overlap.hpp:470-474
  * PAF row:     include/overlap.hpp:476-489 (strand flip of H coords)
  * overlap-only (--skip-alignment): include/overlap.hpp:584-585

The reference writes via per-thread stringstreams + offset fwrite
(include/overlap.hpp:603-640); here rows are formatted in bulk on the
host and written once per stage (appends across stages preserved).
"""

from __future__ import annotations

from typing import IO, List, Sequence

import numpy as np

from bella_tpu.io.fastq import ReadSet
from bella_tpu.overlap.pairs import CandidatePairs


def overlap_only_rows(pairs: CandidatePairs, reads: ReadSet) -> List[str]:
    """nameV nameH sharedk overlap lenV lenH (one per candidate pair)."""
    names = reads.names
    lens = reads.lengths
    out = []
    for i in range(pairs.num_pairs):
        h, v = int(pairs.read_h[i]), int(pairs.read_v[i])
        out.append(
            f"{names[v]}\t{names[h]}\t{int(pairs.count[i])}\t"
            f"{int(pairs.overlap_est[i])}\t{int(lens[v])}\t{int(lens[h])}\n"
        )
    return out


def m4_rows(
    reads: ReadSet,
    read_h: np.ndarray,
    read_v: np.ndarray,
    count: np.ndarray,
    score: np.ndarray,
    ov: np.ndarray,
    strand_rc: np.ndarray,
    beg_v: np.ndarray,
    end_v: np.ndarray,
    beg_h: np.ndarray,
    end_h: np.ndarray,
) -> List[str]:
    """BELLA M4: nameV nameH count score ov strand begV endV lenV begH endH lenH."""
    names = reads.names
    lens = reads.lengths
    out = []
    for i in range(len(read_h)):
        h, v = int(read_h[i]), int(read_v[i])
        strand = "c" if strand_rc[i] else "n"
        out.append(
            f"{names[v]}\t{names[h]}\t{int(count[i])}\t{int(score[i])}\t"
            f"{int(ov[i])}\t{strand}\t{int(beg_v[i])}\t{int(end_v[i])}\t{int(lens[v])}\t"
            f"{int(beg_h[i])}\t{int(end_h[i])}\t{int(lens[h])}\n"
        )
    return out


def paf_rows(
    reads: ReadSet,
    read_h: np.ndarray,
    read_v: np.ndarray,
    score: np.ndarray,
    ov: np.ndarray,
    strand_rc: np.ndarray,
    beg_v: np.ndarray,
    end_v: np.ndarray,
    beg_h: np.ndarray,
    end_h: np.ndarray,
) -> List[str]:
    """PAF: nameV lenV begV endV strand nameH lenH begH endH score ov 255.

    For '-' strand the H coordinates are flipped to original coordinates
    (toOriginalCoordinates, include/overlap.hpp:149-154,483-484)."""
    names = reads.names
    lens = reads.lengths
    out = []
    for i in range(len(read_h)):
        h, v = int(read_h[i]), int(read_v[i])
        lh = int(lens[h])
        bh, eh = int(beg_h[i]), int(end_h[i])
        if strand_rc[i]:
            strand = "-"
            bh, eh = lh - eh, lh - bh
        else:
            strand = "+"
        out.append(
            f"{names[v]}\t{int(lens[v])}\t{int(beg_v[i])}\t{int(end_v[i])}\t{strand}\t"
            f"{names[h]}\t{lh}\t{bh}\t{eh}\t{int(score[i])}\t{int(ov[i])}\t255\n"
        )
    return out


def write_rows(path: str, rows: Sequence[str], append: bool = False) -> None:
    with open(path, "a" if append else "w") as f:
        f.writelines(rows)
