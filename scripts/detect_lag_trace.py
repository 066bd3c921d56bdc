"""Trace the chunked packed detect path at 140 Mbp with wall timestamps
at every host sync, with and without lag slicing."""
import time

import numpy as np
import jax.numpy as jnp

from bella_tpu import BellaConfig
from bella_tpu.io.simulate import random_genome, sample_reads
from bella_tpu.overlap import pairs as pp

cfg = BellaConfig()
g = random_genome(5_600_000, seed=0)
reads, _ = sample_reads(g, 5_600_000 * 25 // 6000, mean_len=6000,
                        min_len=1000, error_rate=0.15, seed=1)
k = cfg.kmer_size
lengths_dev = jnp.asarray(reads.lengths.astype(np.int32))


def run(lag_mode):
    t0 = time.time()
    tp = lambda s: print(f"  {s}: +{time.time()-t0:.2f}s", flush=True)
    khi, klo, p1, sc0, p2 = pp._extract_stream_chunked(reads, k,
                                                       pack_ridpos=True)
    tp("extract dispatched")
    khi, klo, p1, sc0, p2 = pp._sort_kmers(khi, klo, p1, sc0, p2,
                                           pack_ridpos=True, pack_sc=True)
    live, sr, sp, sc, rank, cnt, nnzs, num_kmers = pp._count_sorted(
        khi, klo, p1, sc0, p2, lower=2, upper=8,
        pack_ridpos=True, pack_sc=True)
    del khi, klo, p1, sc0, p2
    tp("count dispatched")
    comp = pp._compact_sort(live, sr, sp, sc, rank, cnt)
    del live, sr, sp, sc, rank, cnt
    narr = np.asarray(nnzs)
    tp(f"narr sync (nnz={narr[0]}, S={narr[1:].tolist()})")
    n = int(narr[0])
    size = min(pp._size_bucket(max(n, 1 << 14)), int(comp[0].shape[0]))
    csr, csp, csc, crank = pp._compact_slice(*comp, size=size)
    del comp
    lag_sizes, prev = [], size
    for d in range(1, 8):
        sd = int(narr[d]) if d < len(narr) else 0
        b = 1 << max(10, int(sd - 1).bit_length()) if sd > 0 else 1 << 10
        b = min(b, prev, size)
        lag_sizes.append(b)
        prev = b
    if not lag_mode:
        lag_sizes = [size] * 7
    hv, k3, pv, _n_cand = pp._fused_emit_packed(
        nnzs[0].astype(jnp.int32), csr, csp, csc, crank, lengths_dev,
        kmer_size=k, upper=8, bin_size=500, lag_sizes=tuple(lag_sizes))
    tp(f"emit dispatched (stream rows {hv.shape[0]})")
    pairs = pp._chain_packed(hv, k3, pv, lengths_dev, kmer_size=k,
                             bin_size=500, live_rows=lambda: int(_n_cand),
                             lengths_np=reads.lengths)
    tp(f"chain done, pairs={pairs.num_pairs}")
    return pairs


for mode in (True, False, True, False):
    print(f"lag_slices={mode}")
    run(mode)
