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


def _name_table(reads: ReadSet):
    """'\\0'-joined name buffer + offsets for the native writers."""
    import ctypes

    blob = b"\x00".join(n.encode() for n in reads.names) + b"\x00"
    offs = np.zeros(reads.num_reads + 1, dtype=np.int64)
    pos = 0
    for i, n in enumerate(reads.names):
        offs[i] = pos
        pos += len(n.encode()) + 1
    offs[reads.num_reads] = pos
    return blob, offs


def write_m4_native(
    path: str, reads: ReadSet,
    read_h, read_v, count, score, ov, strand_rc, beg_v, end_v, beg_h, end_h,
    append: bool = False,
) -> bool:
    """Bulk M4 write via the native runtime; returns False if the native
    library is unavailable (caller falls back to m4_rows)."""
    import ctypes

    from bella_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        return False
    blob, offs = _name_table(reads)
    lens = reads.lengths.astype(np.int64)

    def p32(a):
        return np.ascontiguousarray(a, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)
        )

    arrs = [np.ascontiguousarray(a, np.int32) for a in
            (read_h, read_v, count, score, beg_v, end_v, beg_h, end_h)]
    ov64 = np.ascontiguousarray(ov, np.int64)
    rc8 = np.ascontiguousarray(strand_rc, np.uint8)
    got = lib.write_m4(
        path.encode(), 1 if append else 0, ctypes.c_int64(len(arrs[0])),
        arrs[0].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        arrs[1].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        arrs[2].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        arrs[3].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ov64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rc8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arrs[4].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        arrs[5].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        arrs[6].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        arrs[7].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        blob,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return got >= 0


def write_overlap_native(
    path: str, reads: ReadSet, pairs: CandidatePairs, append: bool = False
) -> bool:
    import ctypes

    from bella_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        return False
    blob, offs = _name_table(reads)
    lens = reads.lengths.astype(np.int64)
    rh = np.ascontiguousarray(pairs.read_h, np.int32)
    rv = np.ascontiguousarray(pairs.read_v, np.int32)
    cnt = np.ascontiguousarray(pairs.count, np.int32)
    ov = np.ascontiguousarray(pairs.overlap_est, np.int32)
    got = lib.write_overlap(
        path.encode(), 1 if append else 0, ctypes.c_int64(pairs.num_pairs),
        rh.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ov.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        blob,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return got >= 0


def write_paf_native(
    path: str, reads: ReadSet,
    read_h, read_v, score, ov, strand_rc, beg_v, end_v, beg_h, end_h,
    append: bool = False,
) -> bool:
    """Bulk PAF write via the native runtime; returns False if the
    native library is unavailable (caller falls back to paf_rows).
    Strand flip to original coordinates happens in C
    (toOriginalCoordinates, include/overlap.hpp:149-154)."""
    import ctypes

    from bella_tpu.native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, "write_paf"):
        return False
    blob, offs = _name_table(reads)
    lens = reads.lengths.astype(np.int64)
    arrs = [np.ascontiguousarray(a, np.int32) for a in
            (read_h, read_v, score, beg_v, end_v, beg_h, end_h)]
    ov64 = np.ascontiguousarray(ov, np.int64)
    rc8 = np.ascontiguousarray(strand_rc, np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    got = lib.write_paf(
        path.encode(), 1 if append else 0, ctypes.c_int64(len(arrs[0])),
        arrs[0].ctypes.data_as(i32p),
        arrs[1].ctypes.data_as(i32p),
        arrs[2].ctypes.data_as(i32p),
        ov64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rc8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arrs[3].ctypes.data_as(i32p),
        arrs[4].ctypes.data_as(i32p),
        arrs[5].ctypes.data_as(i32p),
        arrs[6].ctypes.data_as(i32p),
        blob,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return got >= 0
