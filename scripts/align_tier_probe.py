"""Per-tier band economics probe (VERDICT r4 weak #3 / next #8).

Question: corpus-aggregate routing says default band 128 + rescue
cascade beats starting at 256 (BASELINE r4), but the 10-30 kb tier pays
a 20.7% rescue rate — would a PER-TIER initial band win? This probe
answers it directly: for each pow4 length tier of the demo-scale pair
mix, align that tier's pairs alone at initial band 128 (with cascade)
and at initial band 256 (with cascade), and report per-tier walls. The
per-tier winner composition is then compared against the single-band
default.

Run on TPU: python scripts/align_tier_probe.py [fastq]
(defaults to .refbuild/big.fastq — the 137.6 Mbp dataset-D corpus)
"""

import os
import sys
import time

import numpy as np

from bella_tpu import BellaConfig
from bella_tpu.align.xdrop import _length_tier, align_candidates
from bella_tpu.io.fastq import read_files
from bella_tpu.overlap.pairs import CandidatePairs, detect_overlaps


def subset(pairs, idx):
    import dataclasses

    return CandidatePairs(
        *(getattr(pairs, f.name)[idx]
          for f in dataclasses.fields(CandidatePairs))
    )


def main():
    fq = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", ".refbuild", "big.fastq")
    reads = read_files(fq)
    total = int(reads.offsets[-1])
    print(f"corpus {total/1e6:.1f} Mbp, {reads.num_reads} reads", flush=True)
    cfg = BellaConfig()
    t0 = time.time()
    pairs, nk, nnz = detect_overlaps(reads, cfg)
    print(f"detect {time.time()-t0:.1f}s pairs={pairs.num_pairs}", flush=True)

    lens = reads.lengths.astype(np.int32)
    pair_len = np.maximum(
        lens[pairs.read_h], lens[pairs.read_v]).astype(np.int64)
    lmax = int(-(-int(lens.max()) // 512) * 512)
    tier = _length_tier(pair_len, lmax)

    tiers = sorted(set(np.unique(tier).tolist()))
    results = {}
    for t in tiers:
        idx = np.nonzero(tier == t)[0]
        sub = subset(pairs, idx)
        nbases = int(pair_len[idx].sum())
        row = {}
        for band in (128, 256):
            c = BellaConfig(pallas_band=band)
            align_candidates(None, lens, sub, c, reads=reads)  # warm
            dts = []
            for _ in range(3):
                s = time.time()
                align_candidates(None, lens, sub, c, reads=reads)
                dts.append(time.time() - s)
            row[band] = sorted(dts)[1]
        results[t] = (len(idx), nbases, row)
        print(f"tier {t:>6}: {len(idx):>8} pairs  "
              f"band128 {row[128]:.3f}s  band256 {row[256]:.3f}s  "
              f"winner {'128' if row[128] <= row[256] else '256'}",
              flush=True)

    total128 = sum(r[2][128] for r in results.values())
    total256 = sum(r[2][256] for r in results.values())
    best = sum(min(r[2].values()) for r in results.values())
    print(f"\nsum(band128)={total128:.2f}s sum(band256)={total256:.2f}s "
          f"per-tier-best={best:.2f}s "
          f"(gain over 128: {100*(total128-best)/total128:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
