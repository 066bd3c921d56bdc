"""Reads-by-kmers matrix dump + phase checkpointing.

Covers the reference's optional WRITEDATAMATRIX path
(include/common/bellaio.h:3-47, src/main.cpp:435-438) — dumping the
reads x reliable-kmers matrix as MatrixMarket triples — and adds the
checkpoint/resume the reference lacks (SURVEY §5): the reliable-triples
stream is the expensive state between counting and overlap detection,
so persisting it makes the pipeline restartable.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from bella_tpu.kmers.count import ReliableTriples


def dump_matrix_market(path: str, triples: ReliableTriples) -> None:
    """reads x kmers pattern matrix as 1-indexed MM coordinate rows
    (row = read, col = kmer id), bellaio.h-compatible layout."""
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write(f"{triples.num_reads}\t{triples.num_kmers}\t{triples.nnz}\n")
        rows = triples.read_ids.astype(np.int64) + 1
        cols = triples.kmer_ids.astype(np.int64) + 1
        np.savetxt(f, np.stack([rows, cols], axis=1), fmt="%d", delimiter="\t")


def save_checkpoint(path: str, triples: ReliableTriples) -> None:
    np.savez_compressed(
        path,
        kmer_ids=triples.kmer_ids,
        read_ids=triples.read_ids,
        positions=triples.positions,
        is_rc=triples.is_rc,
        num_kmers=np.int64(triples.num_kmers),
        num_reads=np.int64(triples.num_reads),
    )


def load_checkpoint(path: str) -> Optional[ReliableTriples]:
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return ReliableTriples(
        kmer_ids=z["kmer_ids"],
        read_ids=z["read_ids"],
        positions=z["positions"],
        is_rc=z["is_rc"],
        num_kmers=int(z["num_kmers"]),
        num_reads=int(z["num_reads"]),
    )
