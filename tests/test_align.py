"""x-drop aligner vs a full-DP NumPy oracle (role of xavier/tester.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bella_tpu import BellaConfig
from bella_tpu.align.xdrop import align_candidates, extend_batch, pad_reads
from bella_tpu.io import ReadSet
from bella_tpu.overlap.pairs import CandidatePairs


def oracle_extend(t, q, xdrop, match=1, mis=-1, gap=-1):
    """Unbounded-band antidiagonal DP with Xavier's termination rule:
    stop when an antidiagonal's max drops more than xdrop below best
    (xavier/xavier.h:138-150). Returns (best, t_end, q_end)."""
    nt, nq = len(t), len(q)
    NI = -(10**9)
    D = np.full((nt + 1, nq + 1), NI, dtype=np.int64)
    D[0, 0] = 0
    for i in range(1, nt + 1):
        D[i, 0] = i * gap
    for j in range(1, nq + 1):
        D[0, j] = j * gap
    best, bt, bq = 0, 0, 0
    for d in range(1, nt + nq + 1):
        ilo, ihi = max(0, d - nq), min(nt, d)
        curmax = NI
        for i in range(ilo, ihi + 1):
            j = d - i
            if i > 0 and j > 0:
                s = match if t[i - 1] == q[j - 1] else mis
                D[i, j] = max(D[i - 1, j - 1] + s, D[i - 1, j] + gap, D[i, j - 1] + gap)
            curmax = max(curmax, D[i, j])
        # update best AFTER the xdrop check, mirroring the kernel
        if curmax < best - xdrop:
            break
        for i in range(ilo, ihi + 1):
            if D[i, d - i] > best:
                best, bt, bq = D[i, d - i], i, d - i
    return best, bt, bq


def mutate(seq, error_rate, rng):
    out = []
    for c in seq:
        r = rng.random()
        if r < error_rate / 3:
            out.append((c + rng.integers(1, 4)) % 4)  # sub
        elif r < 2 * error_rate / 3:
            out.append(rng.integers(0, 4))  # ins
            out.append(c)
        elif r < error_rate:
            pass  # del
        else:
            out.append(c)
    return np.array(out, dtype=np.int8)


def run_one(t, q, xdrop, band=128):
    L = max(len(t), len(q)) + 8
    T = np.full((1, L), 127, np.int8)
    Q = np.full((1, L), 127, np.int8)
    T[0, : len(t)] = t
    Q[0, : len(q)] = q
    out = extend_batch(
        jnp.asarray(T), jnp.asarray(np.array([len(t)], np.int32)),
        jnp.asarray(Q), jnp.asarray(np.array([len(q)], np.int32)),
        xdrop, band=band, max_steps=2 * L,
    )
    return int(out["score"][0]), int(out["t_end"][0]), int(out["q_end"][0])


def test_perfect_match():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 4, 300).astype(np.int8)
    s, te, qe = run_one(t, t.copy(), xdrop=7)
    assert (s, te, qe) == (300, 300, 300)


def test_empty_and_tiny():
    assert run_one(np.zeros(0, np.int8), np.zeros(0, np.int8), 7) == (0, 0, 0)
    a = np.array([1], np.int8)
    assert run_one(a, a.copy(), 7) == (1, 1, 1)
    # single mismatch at start: best stays 0 (empty extension)
    assert run_one(np.array([1], np.int8), np.array([2], np.int8), 7)[0] == 0


def test_chimeric_pair_fails_threshold():
    """Banded DP on random DNA drifts slowly upward (max over band lanes),
    so x-drop alone doesn't clip a 200bp-repeat chimera — with the
    reference's rule either. What rejects it is the adaptive threshold:
    score ~ 200 + small drift stays far below (1-d)*phi*ov for ov~500
    only marginally... assert the score reflects ~the common prefix, not
    the full 500bp overlap a true pair would give."""
    rng = np.random.default_rng(1)
    common = rng.integers(0, 4, 200).astype(np.int8)
    t = np.concatenate([common, rng.integers(0, 4, 300).astype(np.int8)])
    q = np.concatenate([common, rng.integers(0, 4, 300).astype(np.int8)])
    s, te, qe = run_one(t, q, xdrop=7)
    assert 190 <= s <= 280  # far below the ~500 of a true full overlap
    assert te <= 500 and qe <= 500


def test_fully_random_pair_scores_low():
    rng = np.random.default_rng(11)
    t = rng.integers(0, 4, 1000).astype(np.int8)
    q = rng.integers(0, 4, 1000).astype(np.int8)
    s, te, qe = run_one(t, q, xdrop=7)
    # junk drift rate is well below the adaptive threshold slope
    # ((1-0.1)*slope(0.15) ~ 0.40/base); this is the property BELLA's
    # Chernoff cutoff relies on (include/overlap.hpp:454-461)
    assert s < 0.2 * 1000


@pytest.mark.parametrize("err,seed", [(0.0, 2), (0.05, 3), (0.10, 4), (0.15, 5), (0.25, 6)])
def test_matches_oracle(err, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, 400).astype(np.int8)
    t = base
    q = mutate(base, err, rng)
    for xdrop in (7, 15, 50):
        s, te, qe = run_one(t, q, xdrop)
        es, ete, eqe = oracle_extend(t, q, xdrop)
        assert s == es, (err, xdrop, s, es)
        assert (te, qe) == (ete, eqe), (err, xdrop, (te, qe), (ete, eqe))


def test_batch_matches_single():
    rng = np.random.default_rng(7)
    seqs = []
    for i in range(9):
        base = rng.integers(0, 4, int(rng.integers(50, 400))).astype(np.int8)
        seqs.append((base, mutate(base, 0.1, rng)))
    L = max(max(len(a), len(b)) for a, b in seqs) + 8
    T = np.full((9, L), 127, np.int8)
    Q = np.full((9, L), 127, np.int8)
    tl = np.zeros(9, np.int32)
    ql = np.zeros(9, np.int32)
    for i, (a, b) in enumerate(seqs):
        T[i, : len(a)] = a
        Q[i, : len(b)] = b
        tl[i], ql[i] = len(a), len(b)
    out = extend_batch(jnp.asarray(T), jnp.asarray(tl), jnp.asarray(Q), jnp.asarray(ql),
                       7, band=128, max_steps=2 * L)
    for i, (a, b) in enumerate(seqs):
        s, te, qe = run_one(a, b, 7)
        assert int(out["score"][i]) == s
        assert int(out["t_end"][i]) == te and int(out["q_end"][i]) == qe


def _mk_pairs(read_h, read_v, pos_h, pos_v, seed_rc):
    n = len(read_h)
    return CandidatePairs(
        read_h=np.array(read_h, np.int32), read_v=np.array(read_v, np.int32),
        pos_h=np.array(pos_h, np.int32), pos_v=np.array(pos_v, np.int32),
        count=np.ones(n, np.int32), matches=np.ones(n, np.int32),
        overlap_est=np.ones(n, np.int32), seed_rc=np.array(seed_rc, bool),
    )


def test_align_candidates_forward_overlap():
    rng = np.random.default_rng(8)
    g = rng.integers(0, 4, 600).astype(np.uint8)
    s1 = "".join("ACGT"[c] for c in g[:400])
    s2 = "".join("ACGT"[c] for c in g[200:])
    rs = ReadSet.from_sequences([s2, s1])  # read_h=1 is s1, read_v=0 is s2
    cfg = BellaConfig(kmer_size=17)
    # shared kmer: genome pos 300 -> s1 pos 300, s2 pos 100
    pairs = _mk_pairs([1], [0], [300], [100], [False])
    padded, lens = pad_reads(rs)
    aln = align_candidates(padded, lens, pairs, cfg)
    # perfect 200bp overlap: score 200, H aligns [200,400), V aligns [0,200)
    assert int(aln.score[0]) == 200
    assert int(aln.beg_h[0]) == 200 and int(aln.end_h[0]) == 400
    assert int(aln.beg_v[0]) == 0 and int(aln.end_v[0]) == 200


def test_align_candidates_revcomp():
    rng = np.random.default_rng(9)
    g = rng.integers(0, 4, 400).astype(np.uint8)
    s1 = "".join("ACGT"[c] for c in g)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    s2 = "".join(comp[c] for c in reversed(s1))
    rs = ReadSet.from_sequences([s1, s2])
    cfg = BellaConfig(kmer_size=17)
    # seed: s2 pos p corresponds to s1 pos 400-p-17; pick s1 pos 100 -> s2 pos 283
    pairs = _mk_pairs([1], [0], [283], [100], [True])
    padded, lens = pad_reads(rs)
    aln = align_candidates(padded, lens, pairs, cfg)
    assert int(aln.score[0]) == 400  # full-length rc match
