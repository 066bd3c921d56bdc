"""Aligner throughput microbenchmark: Pallas kernel vs pure-JAX path.

Measures batched x-drop extension in aligned bases/s (the reference logs
"alignment rate" the same way, include/overlap.hpp:757-767). Not run by
the driver; use for kernel tuning.

  python scripts/align_bench.py [--pairs 4096] [--len 4000] [--err 0.15]
                                [--band 256] [--backend pallas|jax|both]
"""

import argparse
import sys
import time

import numpy as np


def make_batch(n_pairs: int, length: int, err: float, seed: int = 0):
    rng = np.random.default_rng(seed)
    L = length + length // 4 + 64
    T = np.full((n_pairs, L), 127, np.int8)
    Q = np.full((n_pairs, L), 127, np.int8)
    tl = np.zeros(n_pairs, np.int32)
    ql = np.zeros(n_pairs, np.int32)
    for i in range(n_pairs):
        base = rng.integers(0, 4, length).astype(np.int8)
        out = []
        for c in base:
            r = rng.random()
            if r < err / 3:
                out.append((c + rng.integers(1, 4)) % 4)
            elif r < 2 * err / 3:
                out.append(rng.integers(0, 4))
                out.append(c)
            elif r < err:
                pass
            else:
                out.append(c)
        q = np.array(out, np.int8)
        T[i, :length] = base
        Q[i, : len(q)] = q
        tl[i], ql[i] = length, len(q)
    return T, tl, Q, ql


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4096)
    ap.add_argument("--len", dest="length", type=int, default=4000)
    ap.add_argument("--err", type=float, default=0.15)
    ap.add_argument("--band", type=int, default=256)
    ap.add_argument("--xdrop", type=int, default=7)
    ap.add_argument("--backend", default="both")
    args = ap.parse_args()

    import jax.numpy as jnp

    T, tl, Q, ql = make_batch(args.pairs, args.length, args.err)
    total_bases = int(tl.sum() + ql.sum())
    Tj, tlj, Qj, qlj = map(jnp.asarray, (T, tl, Q, ql))

    backends = (
        ["pallas", "jax"] if args.backend == "both" else [args.backend]
    )
    for backend in backends:
        if backend == "pallas":
            from bella_tpu.align.pallas_xdrop import extend_batch_pallas as fn

            kw = dict(band=args.band)
        else:
            from bella_tpu.align.xdrop import extend_batch as fn

            kw = dict(band=min(args.band, 128))
        t0 = time.time()
        out = fn(Tj, tlj, Qj, qlj, args.xdrop, max_steps=2 * T.shape[1], **kw)
        s = np.asarray(out["score"])
        warm = time.time() - t0
        t0 = time.time()
        out = fn(Tj, tlj, Qj, qlj, args.xdrop, max_steps=2 * T.shape[1], **kw)
        s = np.asarray(out["score"])
        dt = time.time() - t0
        exp = (1 - args.err) * args.length - args.err * args.length
        print(
            f"{backend}: warm={warm:.1f}s run={dt:.3f}s "
            f"{total_bases/dt/1e6:.1f} Mbases/s "
            f"({args.pairs/dt:.0f} pairs/s) mean_score={s.mean():.0f} "
            f"(expect ~{exp:.0f})",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
