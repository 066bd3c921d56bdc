"""Synthetic long-read generator (PBSIM-style) for tests and benchmarks.

The reference relies on external data + PBSIM for simulated truth
(README.md:124-128, script/mafconvert.py). Since the demo FASTQ is not
vendored, we generate noisy reads from a random genome and emit ground
truth rows in the same format the evaluator consumes
(`ref readname start end`, script/SAMparser.py:18-21).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from bella_tpu.io.fastq import ReadSet

_COMP = np.array([3, 2, 1, 0], dtype=np.uint8)


def random_genome(length: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4, size=length, dtype=np.int64).astype(np.uint8)


def sample_reads(
    genome: np.ndarray,
    num_reads: int,
    mean_len: int = 5000,
    min_len: int = 1000,
    error_rate: float = 0.15,
    seed: int = 1,
    circular: bool = True,
) -> Tuple[ReadSet, List[Tuple[str, str, int, int]]]:
    """Sample noisy reads; returns (ReadSet, truth rows).

    Errors are split 1/3 substitution, 1/3 insertion, 1/3 deletion
    (PacBio CLR-like). Truth rows: (ref, readname, start, end) with
    end exclusive in genome coordinates; reverse-strand reads still
    report forward-genome intervals (matching SAMparser truth).
    """
    rng = np.random.default_rng(seed)
    G = len(genome)
    seqs: List[np.ndarray] = []
    names: List[str] = []
    truth: List[Tuple[str, str, int, int]] = []
    for i in range(num_reads):
        L = int(np.clip(rng.gamma(4.0, mean_len / 4.0), min_len, G))
        start = int(rng.integers(0, G if circular else max(G - L, 1)))
        idx = (start + np.arange(L)) % G if circular else np.arange(start, start + L)
        frag = genome[idx]
        strand = bool(rng.integers(0, 2))
        if strand:
            frag = _COMP[frag[::-1]]
        noisy = _apply_errors(frag, error_rate, rng)
        name = f"sim/{i}/0_{len(noisy)}"
        seqs.append(noisy)
        names.append(name)
        truth.append(("genome", name, start, start + L))
    offsets = np.zeros(num_reads + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    cat = np.concatenate(seqs) if seqs else np.zeros(0, np.uint8)
    return ReadSet(names, cat, offsets), truth


def _apply_errors(frag: np.ndarray, error_rate: float, rng) -> np.ndarray:
    if error_rate <= 0:
        return frag.copy()
    L = len(frag)
    r = rng.random(L)
    sub = r < error_rate / 3
    ins = (r >= error_rate / 3) & (r < 2 * error_rate / 3)
    dele = (r >= 2 * error_rate / 3) & (r < error_rate)
    base = frag.copy()
    # substitutions: add 1..3 mod 4 so the base always changes
    base[sub] = (base[sub] + rng.integers(1, 4, size=int(sub.sum()))) % 4
    # vectorized splice: each input base emits 0 (del), 1 (keep), or
    # 2 (inserted random + base) output symbols
    emit = (1 - dele.astype(np.int64)) + ins.astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(emit)])
    total = int(offsets[-1])
    out = np.zeros(total, dtype=np.uint8)
    kept = emit >= 1
    out[offsets[:-1][kept] + emit[kept] - 1] = base[kept]  # base goes last
    has_ins = emit == 2
    out[offsets[:-1][has_ins]] = rng.integers(0, 4, size=int(has_ins.sum()))
    return out


def write_fastq(path: str, reads: ReadSet, qual_char: str = "I") -> None:
    from bella_tpu.seq.encode import decode_bases

    with open(path, "w") as f:
        for r in range(reads.num_reads):
            seq = decode_bases(reads.codes[reads.offsets[r] : reads.offsets[r + 1]]).tobytes().decode()
            f.write(f"@{reads.names[r]}\n{seq}\n+\n{qual_char * len(seq)}\n")


def write_truth(path: str, truth) -> None:
    with open(path, "w") as f:
        for ref, name, s, e in truth:
            f.write(f"{ref} {name} {s} {e}\n")


def random_genome_with_repeats(
    length: int,
    seed: int = 0,
    repeat_frac: float = 0.2,
    n_families: int = 4,
    unit_len: int = 2000,
    divergence: float = 0.02,
    tandem_frac: float = 0.4,
) -> np.ndarray:
    """Random genome with ~repeat_frac of its content made of repeats —
    the content class where chaining/binning policies genuinely diverge
    (reads from different repeat copies share k-mers without true
    overlap; the reference's demo E. coli reads carry such repeats but
    are not vendored, .MISSING_LARGE_BLOBS).

    n_families repeat units of ~unit_len bp are copied until the repeat
    budget is spent: tandem_frac of the budget as tandem arrays (3-8
    adjacent copies), the rest dispersed singly; every copy mutates at
    `divergence` substitutions (diverged copies, as in real genomes).
    Copies overwrite the unique background at random positions, so
    total length is exactly `length`."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, size=length, dtype=np.uint8)
    budget = int(length * repeat_frac)
    units = [
        rng.integers(0, 4, size=int(unit_len * rng.uniform(0.5, 1.5)),
                     dtype=np.uint8)
        for _ in range(n_families)
    ]

    def place(arr):
        sub = rng.random(len(arr)) < divergence
        arr = arr.copy()
        arr[sub] = (arr[sub] + rng.integers(1, 4, size=int(sub.sum()))) % 4
        start = int(rng.integers(0, max(length - len(arr), 1)))
        g[start : start + len(arr)] = arr[: length - start]
        return len(arr)

    spent = 0
    tandem_budget = int(budget * tandem_frac)
    while spent < tandem_budget:
        u = units[int(rng.integers(0, n_families))]
        reps = int(rng.integers(3, 9))
        spent += place(np.tile(u, reps))
    while spent < budget:
        spent += place(units[int(rng.integers(0, n_families))])
    return g
