#!/usr/bin/env python
"""Stage-level detect profile on TPU with forced syncs per stage."""
import time, numpy as np, jax, jax.numpy as jnp
from bella_tpu import BellaConfig
from bella_tpu.io.simulate import random_genome, sample_reads
from bella_tpu.overlap import pairs as pp

cfg = BellaConfig()
g = random_genome(300_000, seed=0)
reads, _ = sample_reads(g, 300_000*25//6000, mean_len=6000, min_len=1000, error_rate=0.15, seed=1)
k = cfg.kmer_size
total = len(reads.codes); total_p = pp._size_bucket(total)
codes = np.concatenate([reads.codes, np.zeros(total_p-total, reads.codes.dtype)])
lengths = np.append(reads.lengths.astype(np.int32), np.int32(total_p-total))
offsets = np.append(reads.offsets.astype(np.int32), np.int32(total_p))
c4 = codes.reshape(-1,4).astype(np.uint8)
cb = np.concatenate([c4[:,0]|(c4[:,1]<<2)|(c4[:,2]<<4)|(c4[:,3]<<6), np.zeros(8,np.uint8)])

def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    for l in leaves:
        if hasattr(l, 'shape') and getattr(l, 'size', 0) > 0:
            np.asarray(l.ravel()[:1]); break

def t(label, f, *a, **kw):
    out = f(*a, **kw); sync(out)
    t0=time.perf_counter(); out = f(*a, **kw); sync(out)
    print(f"{label}: {(time.perf_counter()-t0)*1e3:.1f} ms")
    return out

cbj, lj, oj = jnp.asarray(cb), jnp.asarray(lengths), jnp.asarray(offsets)
nr = jnp.int32(reads.num_reads)
ext = t("extract(phased)", pp._extract_kmers_phased, cbj, lj, oj, nr, kmer_size=k, pack_ridpos=True)
srt = t("sort_kmers", pp._sort_kmers, *ext, pack_ridpos=True, pack_sc=True)
cs_out = t("count_sorted", pp._count_sorted, *srt, lower=2, upper=8, pack_ridpos=True, pack_sc=True)
live, sr, sp, sc, rank, cntc, nnzs, nk = cs_out
nnz = nnzs[0]
n = int(nnz)
size = min(pp._size_bucket(max(n,1<<14)), int(sr.shape[0]))
comp2 = t("compact_sort", pp._compact_sort, live, sr, sp, sc, rank, cntc)
comp = t("compact_slice", pp._compact_slice, *comp2, size=size)
ld = jnp.asarray(reads.lengths.astype(np.int32))
emit = t("emit_packed", pp._fused_emit_packed, nnz.astype(jnp.int32), *comp, ld, kmer_size=k, upper=8, bin_size=500)
hv,k3,pv,ncand = emit
def chs(): return pp._chain_sort_packed(hv+jnp.uint32(0), k3+jnp.uint32(0), pv+jnp.uint32(0))  # +0 copies: inputs are donated
cs = t("chain_sort", chs)
lim = min(pp._size_bucket(max(int(ncand),1<<10)), cs[0].shape[0])
fin = t("chain_finish(scans+pack)", pp._chain_finish,
        tuple(a[:lim] for a in cs), ld, kmer_size=k, bin_size=500, wide=False)
cols, key, nseed = fin
skey = t("seedkey_sort", pp._sort_seedkey, key)
num = int(nseed)
size2 = min(1 << max(10, (num - 1).bit_length()), lim)
blk = t("gather_block", pp._gather_block, skey, cols, size=size2)
t0=time.perf_counter(); arr=np.asarray(blk); print(f"readback: {(time.perf_counter()-t0)*1e3:.1f} ms  pairs={num} nnz={n}")
