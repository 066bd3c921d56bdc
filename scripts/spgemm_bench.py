#!/usr/bin/env python3
"""SpGEMM correctness + throughput driver (role of src/mkl_free_main.cpp):
multiplies R-MAT/ER synthetic or MatrixMarket matrices on device, checks
C == host-oracle, and reports flops/s and nnz(C)/s.

Usage:
  spgemm_bench.py --rmat 12 [--edge-factor 8]
  spgemm_bench.py --er 4096 --nnz 80000
  spgemm_bench.py --mtx A.mtx [--mtx-b B.mtx]
"""

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rmat", type=int, help="R-MAT scale (2^scale vertices)")
    ap.add_argument("--edge-factor", type=int, default=8)
    ap.add_argument("--er", type=int, help="Erdos-Renyi dimension")
    ap.add_argument("--nnz", type=int, default=0, help="ER nonzeros")
    ap.add_argument("--mtx", help="MatrixMarket A")
    ap.add_argument("--mtx-b", help="MatrixMarket B (default: A)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--verify", action="store_true", help="check vs host oracle")
    args = ap.parse_args(argv)

    from bella_tpu.sparse import csc_from_triples, read_matrix_market, rmat_triples, spgemm_count
    from bella_tpu.sparse.spgemm import spgemm

    if args.rmat:
        r, c = rmat_triples(args.rmat, args.edge_factor, seed=args.seed)
        n = 1 << args.rmat
        a = csc_from_triples(r, c, np.ones(len(r)), n, n)
    elif args.er:
        rng = np.random.default_rng(args.seed)
        nnz = args.nnz or args.er * 8
        a = csc_from_triples(
            rng.integers(0, args.er, nnz), rng.integers(0, args.er, nnz),
            np.ones(nnz), args.er, args.er,
        )
    elif args.mtx:
        a = read_matrix_market(args.mtx)
    else:
        ap.error("one of --rmat/--er/--mtx required")
    b = read_matrix_market(args.mtx_b) if args.mtx_b else a

    flops = int(np.diff(a.colptr)[b.rowids].sum())
    t0 = time.time()
    cmat = spgemm(a, b)
    warm = time.time() - t0
    t0 = time.time()
    cmat = spgemm(a, b)
    dt = time.time() - t0
    print(
        f"A {a.rows}x{a.cols} nnz={a.nnz}  B nnz={b.nnz}  C nnz={cmat.nnz}  "
        f"flops={flops}  compression={flops/max(cmat.nnz,1):.2f}",
        file=sys.stderr,
    )
    print(
        f"warm={warm:.2f}s run={dt:.3f}s  {flops/dt/1e6:.1f} Mflop/s  "
        f"{cmat.nnz/dt/1e6:.2f} Mnnz(C)/s",
        file=sys.stderr,
    )
    if args.verify:
        ref = spgemm_count(a, b)
        assert cmat.nnz == ref.nnz, (cmat.nnz, ref.nnz)
        assert np.allclose(cmat.to_dense(), ref.to_dense())
        print("verified: C == C_oracle", file=sys.stderr)
    print(f"{cmat.nnz}\t{dt:.6f}")


if __name__ == "__main__":
    main()
