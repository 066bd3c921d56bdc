"""Minimizer/syncmer selection vs sequential Python oracles mirroring
include/minimizer.hpp and include/syncmer.hpp."""

import numpy as np
import pytest

from bella_tpu import BellaConfig
from bella_tpu.io import ReadSet
from bella_tpu.kmers import extract_occurrences
from bella_tpu.kmers.select import minimizer_mask, select_occurrences, syncmer_mask
from bella_tpu.seq.encode import hash64 as jhash64

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def rc(s):
    return "".join(COMP[c] for c in reversed(s))


def hash_of(kmer_str: str) -> int:
    from bella_tpu.seq.encode import string_to_kmer
    import jax.numpy as jnp

    return int(jhash64(jnp.asarray(np.uint64(string_to_kmer(kmer_str)))))


def oracle_minimizers(seq: str, k: int, w: int):
    """Monotone-deque robust winnowing (include/minimizer.hpp:49-77)."""
    from collections import deque

    deq = deque()  # (pos, order)
    out = []
    n = len(seq) - k + 1
    for i in range(n):
        order = hash_of(min(seq[i : i + k], rc(seq[i : i + k])))
        while deq and deq[-1][1] > order:
            deq.pop()
        deq.append((i, order))
        while deq and deq[0][0] <= i - w:
            # furtherPop: drop ties with the front before evicting
            while len(deq) > 1 and deq[0][1] == deq[1][1]:
                deq.popleft()
            deq.popleft()
        if deq and (not out or deq[0][0] != out[-1]):
            out.append(deq[0][0])
    return set(out)


def random_seq(n, seed):
    rng = np.random.default_rng(seed)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


@pytest.mark.parametrize("w", [5, 10])
def test_minimizers_match_oracle(w):
    k = 11
    seqs = [random_seq(150, seed) for seed in (1, 2)]
    rs = ReadSet.from_sequences(seqs)
    cfg = BellaConfig(kmer_size=k, window_len=w)
    occ = extract_occurrences(rs, cfg)
    mask = np.asarray(minimizer_mask(occ, w))
    offsets = rs.offsets
    for r, s in enumerate(seqs):
        expect = oracle_minimizers(s, k, w)
        got = {
            int(p - offsets[r])
            for p in np.flatnonzero(mask)
            if offsets[r] <= p < offsets[r + 1]
        }
        assert got == expect, (r, sorted(got ^ expect))


def test_minimizers_sparser_and_shared():
    # selection keeps a fraction of positions but both strands of the
    # same sequence select the same canonical k-mers
    k, w = 13, 8
    s = random_seq(400, 5)
    rs = ReadSet.from_sequences([s, rc(s)])
    cfg = BellaConfig(kmer_size=k, window_len=w)
    occ = extract_occurrences(rs, cfg)
    mask = np.asarray(minimizer_mask(occ, w))
    kmers = np.asarray(occ.kmers)
    n1 = rs.offsets[1]
    set1 = set(kmers[:n1][mask[:n1]].tolist())
    set2 = set(kmers[n1:][mask[n1:]].tolist())
    assert 0 < len(set1) < 400 - k + 1
    # partial windows at read starts sit at opposite sequence ends for
    # the two strands (the reference deque samples them too), so the
    # sets agree except near the edges
    jaccard = len(set1 & set2) / len(set1 | set2)
    assert jaccard > 0.85, jaccard


def oracle_is_syncmer(canon: str, k: int, s: int) -> bool:
    first = hash_of(canon[:s])
    last = hash_of(canon[k - s :][:s])
    for i in range(1, k - s):
        h = hash_of(canon[i : i + s])
        if h < first and h < last:
            return False
    return True


def test_syncmers_match_oracle():
    k = 15
    seqs = [random_seq(120, 9)]
    rs = ReadSet.from_sequences(seqs)
    cfg = BellaConfig(kmer_size=k, use_syncmer=True)
    occ = extract_occurrences(rs, cfg)
    mask = np.asarray(syncmer_mask(occ, rs, cfg))
    s = seqs[0]
    for p in range(len(s) - k + 1):
        canon = min(s[p : p + k], rc(s[p : p + k]))
        assert bool(mask[p]) == oracle_is_syncmer(canon, k, cfg.smer_len), p


def test_select_occurrences_roundtrip():
    s = random_seq(300, 11)
    rs = ReadSet.from_sequences([s])
    cfg = BellaConfig(kmer_size=13, window_len=6)
    occ = extract_occurrences(rs, cfg)
    sel = select_occurrences(occ, rs, cfg)
    from bella_tpu.kmers.count import SENTINEL

    kept = np.asarray(sel.kmers) != SENTINEL
    assert 0 < kept.sum() < occ.size
