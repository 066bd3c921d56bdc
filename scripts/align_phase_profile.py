"""Per-stage profile of the alignment phase on the bench workload:
where do the seconds go in align_candidates?

  python scripts/align_phase_profile.py [--genome N] [--coverage C]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from bella_tpu import BellaConfig
from bella_tpu.io.simulate import random_genome, sample_reads
from bella_tpu.overlap.pairs import detect_overlaps
from bella_tpu.align import xdrop as xd

ap = argparse.ArgumentParser()
ap.add_argument("--genome", type=int, default=300_000)
ap.add_argument("--coverage", type=int, default=25)
args = ap.parse_args()

cfg = BellaConfig()
g = random_genome(args.genome, seed=0)
reads, _ = sample_reads(g, args.genome * args.coverage // 6000,
                        mean_len=6000, min_len=1000, error_rate=0.15,
                        seed=1)
pairs, _, _ = detect_overlaps(reads, cfg)
print("pairs:", pairs.num_pairs)

padded, lens = xd.pad_reads(reads)
R, Lmax = padded.shape
print("reads:", R, "Lmax:", Lmax)

t0 = time.time()
reads_w = xd.pack_words(padded)
print(f"pack_words: {time.time()-t0:.2f}s  ({reads_w.nbytes/1e6:.1f} MB)")

t0 = time.time()
rwd = jnp.asarray(reads_w)
np.asarray(rwd[:1, :1])
print(f"upload packed: {time.time()-t0:.2f}s")
lend = jnp.asarray(lens.astype(np.int32))

# replicate align_candidates batching
P = pairs.num_pairs
batch_size = 4096
k = cfg.kmer_size
pair_len = np.maximum(lens[pairs.read_h], lens[pairs.read_v]).astype(np.int64)
tier = np.maximum(512, 1 << np.ceil(np.log2(np.maximum(pair_len, 1))).astype(np.int64))
tier = np.minimum(tier, Lmax)
order = np.lexsort((pairs.overlap_est, tier))
import collections
print("tier histogram:", dict(collections.Counter(tier[order].tolist())))

# warm every batch shape first
sels = []
for s in range(0, P, batch_size):
    sel = order[s:s + batch_size]
    nv = len(sel)
    if nv < batch_size:
        sel = np.concatenate([sel, np.zeros(batch_size - nv, sel.dtype)])
    valid = np.arange(batch_size) < nv
    seq_len = int(tier[sel[:nv]].max())
    sels.append((sel, valid, seq_len))

def run_batch(sel, valid, seq_len):
    blk = jnp.asarray(np.stack([
        pairs.read_h[sel].astype(np.int32),
        pairs.read_v[sel].astype(np.int32),
        pairs.pos_h[sel].astype(np.int32),
        pairs.pos_v[sel].astype(np.int32),
        pairs.seed_rc[sel].astype(np.int32),
        valid.astype(np.int32),
    ]))
    return xd._seed_extend_batch_pallas(
        rwd, lend, blk,
        xdrop=int(cfg.xdrop), kmer_size=k,
        band=int(cfg.pallas_band), interpret=False,
        max_steps=0, seq_len=seq_len)

print("warming", len(sels), "batches...")
t0 = time.time()
outs = [run_batch(*b) for b in sels]
for o in outs:
    np.asarray(o)
print(f"warm total: {time.time()-t0:.2f}s")

# per-batch synced timing
for i, b in enumerate(sels):
    t0 = time.time()
    o = run_batch(*b)
    np.asarray(o)
    print(f"batch {i}: tier={b[2]} valid={int(b[1].sum())} "
          f"{time.time()-t0:.2f}s")

# full async run (the bench's measurement)
t0 = time.time()
outs = [run_batch(*b) for b in sels]
arrs = [np.asarray(o) for o in outs]
print(f"async total: {time.time()-t0:.2f}s")
