"""Property tests for 2-bit k-mer primitives against pure-Python oracles
(the role played by the bit tables in reference kmercode/Kmer.cpp:29-62)."""

import numpy as np
import pytest

from bella_tpu.seq import (
    canonical_kmers,
    encode_bases,
    hopc_kmers,
    kmer_to_string,
    pack_kmers,
    revcomp_codes,
    revcomp_kmer,
    string_to_kmer,
)
from bella_tpu.seq.encode import decode_bases, encode_bases_np

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def py_revcomp(s: str) -> str:
    return "".join(COMP[c] for c in reversed(s))


def random_seq(n, seed=0):
    rng = np.random.default_rng(seed)
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def test_encode_ascii_mapping():
    s = b"ACGTacgt"
    codes = np.asarray(encode_bases(np.frombuffer(s, np.uint8)))
    assert list(codes) == [0, 1, 2, 3, 0, 1, 2, 3]
    # 'N' maps to G exactly like the reference bit trick (Kmer.cpp:215)
    assert int(encode_bases_np(np.frombuffer(b"N", np.uint8))[0]) == 2


def test_decode_roundtrip():
    s = random_seq(100, 3)
    codes = encode_bases_np(np.frombuffer(s.encode(), np.uint8))
    assert decode_bases(codes).tobytes().decode() == s


@pytest.mark.parametrize("k", [1, 5, 17, 31, 32])
def test_pack_matches_string_oracle(k):
    s = random_seq(80, seed=k)
    codes = encode_bases_np(np.frombuffer(s.encode(), np.uint8))
    packed = np.asarray(pack_kmers(codes, k))
    assert len(packed) == len(s) - k + 1
    for p in [0, 1, len(packed) - 1, len(packed) // 2]:
        assert packed[p] == string_to_kmer(s[p : p + k])
        assert kmer_to_string(int(packed[p]), k) == s[p : p + k]


@pytest.mark.parametrize("k", [1, 2, 17, 31, 32])
def test_revcomp_kmer(k):
    s = random_seq(60, seed=10 + k)
    codes = encode_bases_np(np.frombuffer(s.encode(), np.uint8))
    packed = pack_kmers(codes, k)
    rc = np.asarray(revcomp_kmer(packed, k))
    for p in [0, len(rc) - 1, len(rc) // 3]:
        assert kmer_to_string(int(rc[p]), k) == py_revcomp(s[p : p + k])


@pytest.mark.parametrize("k", [17, 32])
def test_canonical_is_min_and_strand_flag(k):
    s = random_seq(200, seed=20 + k)
    codes = encode_bases_np(np.frombuffer(s.encode(), np.uint8))
    packed = pack_kmers(codes, k)
    canon, is_rc = canonical_kmers(packed, k)
    canon, is_rc = np.asarray(canon), np.asarray(is_rc)
    for p in range(0, len(canon), 13):
        fwd = s[p : p + k]
        rc = py_revcomp(fwd)
        expect = min(fwd, rc)
        assert kmer_to_string(int(canon[p]), k) == expect
        assert bool(is_rc[p]) == (rc < fwd)


def test_canonical_invariant_under_revcomp():
    # canonical k-mers of a read and of its reverse complement are the same set
    k = 17
    s = random_seq(300, seed=55)
    c1 = encode_bases_np(np.frombuffer(s.encode(), np.uint8))
    c2 = np.asarray(revcomp_codes(c1))
    k1, _ = canonical_kmers(pack_kmers(c1, k), k)
    k2, _ = canonical_kmers(pack_kmers(c2, k), k)
    assert set(np.asarray(k1).tolist()) == set(np.asarray(k2).tolist())


def py_hopc(s: str) -> str:
    out = []
    for ch in s:
        if not out or out[-1] != ch:
            out.append(ch)
    return "".join(out)


@pytest.mark.parametrize("k", [5, 17])
def test_hopc_matches_oracle(k):
    # include homopolymer runs
    s = "AAACCCGGGTTTACGTACGT" + random_seq(40, seed=77)
    codes = encode_bases_np(np.frombuffer(s.encode(), np.uint8))
    vals, lens, is_rc = hopc_kmers(codes, k)
    vals, lens, is_rc = np.asarray(vals), np.asarray(lens), np.asarray(is_rc)
    for p in range(0, len(vals), 7):
        compressed = py_hopc(s[p : p + k])
        expect = min(compressed, py_revcomp(compressed))
        assert lens[p] == len(compressed)
        assert kmer_to_string(int(vals[p]), int(lens[p])) == expect
        assert is_rc[p] == (py_revcomp(compressed) < compressed)
