"""Host-side FASTQ ingest.

Replaces the reference's thread-partitioned C reader
(kmercode/fq_reader.c:200-620, kmercode/ParallelFASTQ.h:58-89) with a
vectorized numpy parser over memory-mapped bytes; a native C parser
(bella_tpu/native) is used when available for large inputs. Output is a
:class:`ReadSet`: one concatenated 2-bit code array + offsets — the
layout every device stage consumes.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import numpy as np

from bella_tpu.seq.encode import encode_bases_np

ASCII_QUAL_BASE = 33  # Phred+33, reference kmercode/common.h ASCIIBASE


@dataclasses.dataclass
class ReadSet:
    """All reads of a run, concatenated.

    names:   read name tags (leading '@' stripped, src/main.cpp:357)
    codes:   (total_bases,) uint8 2-bit base codes, all reads back-to-back
    offsets: (num_reads + 1,) int64, read r occupies codes[offsets[r]:offsets[r+1]]
    err_sum / err_bases: accumulated per-base error probability
        10^(-q/10) and base count, for --estimate error-rate estimation
        (include/kmercount.hpp:539-558)
    """

    names: List[str]
    codes: np.ndarray
    offsets: np.ndarray
    err_sum: float = 0.0
    err_bases: int = 0

    @property
    def num_reads(self) -> int:
        return len(self.offsets) - 1

    @property
    def lengths(self) -> np.ndarray:
        return np.diff(self.offsets)

    @property
    def estimated_error_rate(self) -> float:
        return self.err_sum / self.err_bases if self.err_bases else 0.0

    def sequence(self, r: int) -> str:
        """Decode read r back to an ACGT string (tests/debugging)."""
        from bella_tpu.seq.encode import decode_bases

        return decode_bases(self.codes[self.offsets[r] : self.offsets[r + 1]]).tobytes().decode()

    @staticmethod
    def from_sequences(seqs: Sequence[str], names: Optional[Sequence[str]] = None) -> "ReadSet":
        if names is None:
            names = [f"read{i}" for i in range(len(seqs))]
        codes = [encode_bases_np(np.frombuffer(s.encode(), np.uint8)) for s in seqs]
        offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
        np.cumsum([len(c) for c in codes], out=offsets[1:])
        cat = np.concatenate(codes) if codes else np.zeros(0, np.uint8)
        return ReadSet(list(names), cat, offsets)

    def concat(self, other: "ReadSet") -> "ReadSet":
        return ReadSet(
            self.names + other.names,
            np.concatenate([self.codes, other.codes]),
            np.concatenate([self.offsets, self.offsets[-1] + other.offsets[1:]]),
            self.err_sum + other.err_sum,
            self.err_bases + other.err_bases,
        )


def _parse_buffer(data: np.ndarray, final: bool):
    """Vectorized parse of the COMPLETE records in a byte buffer.

    Returns (names, codes, offsets, err_sum, err_bases, consumed) with
    `consumed` = bytes of whole records parsed; the remainder belongs to
    an incomplete record and is carried into the next block (the
    record-boundary resync of kmercode/fq_reader.c:200-312, made
    trivial by only ever cutting between complete records). When
    `final`, a trailing partial record is silently dropped, matching
    the reference's behavior on truncated files."""
    empty = ([], np.zeros(0, np.uint8), np.zeros(1, np.int64), 0.0, 0, 0)
    if data.size == 0:
        return empty
    nl = np.flatnonzero(data == ord("\n"))
    if final and (data.size and data[-1] != ord("\n")):
        # tolerate a missing trailing newline on the last record
        nl = np.append(nl, data.size)
    nlines = (len(nl) // 4) * 4
    if nlines == 0:
        return empty
    starts = np.concatenate([[0], nl[:-1] + 1])[:nlines]
    ends = nl[:nlines]
    consumed = int(nl[nlines - 1]) + 1

    name_s, name_e = starts[0::4], ends[0::4]
    seq_s, seq_e = starts[1::4], ends[1::4]
    qual_s, qual_e = starts[3::4], ends[3::4]

    names = [
        bytes(data[s + 1 : e]).decode().split()[0] if e > s + 1 else ""
        for s, e in zip(name_s, name_e)
    ]
    lengths = (seq_e - seq_s).astype(np.int64)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])

    codes = np.empty(total, dtype=np.uint8)
    gather = _ragged_gather_index(seq_s, lengths, total)
    codes[:] = encode_bases_np(data[gather])

    qlens = (qual_e - qual_s).astype(np.int64)
    qgather = _ragged_gather_index(qual_s, qlens, int(qlens.sum()))
    quals = data[qgather].astype(np.float64) - ASCII_QUAL_BASE
    err_sum = float(np.power(10.0, -quals / 10.0).sum())
    return names, codes, offsets, err_sum, int(quals.size), consumed


def stream_fastq(path: str, block_bytes: int = 256 << 20):
    """Yield ReadSet blocks of complete records, never holding more than
    ~block_bytes of raw text (the ParallelFASTQ::fill_block memory
    budget, kmercode/ParallelFASTQ.h:58-89). Transparently decompresses
    .gz inputs (the reference's gzip hooks are compiled out, NO_GZIP in
    kmercode/common.h:16; here they work)."""
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    rest = b""
    with opener(path, "rb") as f:
        while True:
            # the floor keeps making progress when one record exceeds
            # the budget (the buffer must grow until it holds a record)
            chunk = f.read(max(block_bytes - len(rest), block_bytes // 4, 4096))
            final = not chunk
            data = rest + chunk
            names, codes, offsets, err_sum, err_bases, consumed = \
                _parse_buffer(np.frombuffer(data, np.uint8), final)
            rest = b"" if final else data[consumed:]
            if names:
                yield ReadSet(names, codes, offsets, err_sum, err_bases)
            if final:
                return


def parse_fastq(path: str, with_quals: bool = False,
                block_bytes: int = 0) -> ReadSet:
    """Parse a FASTQ (or FASTQ.gz) file into a ReadSet.

    Prefers the native C parser (bella_tpu/native, the fq_reader.c
    replacement) for plain files; gzip and budget-bounded ingest go
    through the streaming vectorized numpy path (stream_fastq), whose
    peak text residency is one block instead of the whole file."""
    # an EXPLICIT budget (arg or env) keeps the block-streaming path so
    # its text residency bound is honored; with no explicit budget the
    # native parser takes every plain file regardless of size — its
    # text is a file-backed mmap (reclaimable, not anonymous RAM), and
    # on slow-memory hosts the vectorized-numpy fallback is ~100x
    # slower (measured 314 s vs 2.4 s on a 276 MB corpus)
    explicit = block_bytes > 0 or "BELLA_INGEST_BLOCK_MB" in os.environ
    if block_bytes <= 0:
        block_bytes = int(os.environ.get("BELLA_INGEST_BLOCK_MB", 256)) << 20
    if not path.endswith(".gz"):
        from bella_tpu.native import parse_fastq_native

        if not explicit or os.path.getsize(path) <= block_bytes:
            native = parse_fastq_native(path)
            if native is not None:
                names, codes, offsets, err_sum, err_bases = native
                return ReadSet(names, codes, offsets, err_sum, err_bases)

    out: Optional[ReadSet] = None
    for block in stream_fastq(path, block_bytes):
        out = block if out is None else out.concat(block)
    if out is None:
        return ReadSet([], np.zeros(0, np.uint8), np.zeros(1, np.int64))
    return out


def _ragged_gather_index(starts: np.ndarray, lengths: np.ndarray, total: int) -> np.ndarray:
    """Flat indices selecting [starts[i], starts[i]+lengths[i]) per row.

    Three full-stream passes (repeat, arange, add-in-place) instead of
    six: with idx = starts[row] + (pos - offs[row]), the two per-row
    gathers fold into one repeated delta — it matters because ingest
    hosts can be memory-bandwidth-starved (see parse_fastq)."""
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    offs = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    idx = np.repeat(starts.astype(np.int64) - offs[:-1], lengths)
    idx += np.arange(total, dtype=np.int64)
    return idx


def parse_fofn(path: str) -> List[str]:
    """File-of-filenames parser (reference GetFiles, include/kmercount.hpp:82-115).

    Relative paths are resolved against the fofn's directory.
    """
    base = os.path.dirname(os.path.abspath(path))
    files = []
    with open(path) as f:
        for line in f:
            name = line.strip().split()[0] if line.strip() else ""
            if not name:
                continue
            if not os.path.isabs(name):
                cand = os.path.join(base, name)
                name = cand if os.path.exists(cand) else name
            if not os.path.exists(name):
                raise FileNotFoundError(f"fofn entry not found: {name}")
            files.append(name)
    return files


def read_files(fofn_or_fastq: str) -> ReadSet:
    """Load all reads from a fofn (or a single .fastq/.fq path)."""
    if fofn_or_fastq.endswith((".fastq", ".fq", ".fastq.gz", ".fq.gz")):
        paths = [fofn_or_fastq]
    else:
        paths = parse_fofn(fofn_or_fastq)
    out: Optional[ReadSet] = None
    for p in paths:
        rs = parse_fastq(p)
        out = rs if out is None else out.concat(rs)
    assert out is not None, "no input files"
    return out
