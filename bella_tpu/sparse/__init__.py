from bella_tpu.sparse.matrix import (
    CSC,
    CSR,
    csc_from_triples,
    read_matrix_market,
    write_matrix_market,
    rmat_triples,
    spgemm_count,
)

__all__ = [
    "CSC",
    "CSR",
    "csc_from_triples",
    "read_matrix_market",
    "write_matrix_market",
    "rmat_triples",
    "spgemm_count",
]
