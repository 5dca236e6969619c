"""Synthetic genome / long-read simulator (shared by tests and bench.py)."""

from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = {65: 84, 84: 65, 67: 71, 71: 67}


def random_genome(n: int, seed: int = 1) -> bytes:
    rng = np.random.default_rng(seed)
    return bytes(BASES[rng.integers(0, 4, n)])


def revcomp(seq: bytes) -> bytes:
    return bytes(COMP[b] for b in reversed(seq))


def simulate_reads(genome: bytes, n_reads: int, read_len: int,
                   seed: int = 2, err_rate: float = 0.0,
                   phred: int = 20, phred_jitter: int = 3,
                   both_strands: bool = True) -> list[tuple[str, bytes, bytes]]:
    """Uniformly sampled reads in random order, optionally with substitution
    errors; constant-ish quality strings around `phred`."""
    rng = np.random.default_rng(seed)
    G = len(genome)
    out = []
    garr = np.frombuffer(genome, dtype=np.uint8)
    for i in range(n_reads):
        L = read_len
        start = int(rng.integers(0, max(G - L, 1)))
        seq = garr[start:start + L].copy()
        if err_rate > 0:
            nerr = rng.binomial(L, err_rate)
            pos = rng.integers(0, L, nerr)
            seq[pos] = BASES[rng.integers(0, 4, nerr)]
        s = bytes(seq)
        if both_strands and rng.integers(0, 2):
            s = revcomp(s)
        q = np.clip(phred + rng.integers(-phred_jitter, phred_jitter + 1, L),
                    2, 40).astype(np.uint8) + 33
        out.append((f"read{i}_p{start}", s, bytes(q)))
    return out


def write_fastq(path: str, reads) -> None:
    with open(path, "wb") as f:
        for rid, seq, qual in reads:
            f.write(b"@" + rid.encode() + b"\n" + seq + b"\n+\n" + qual + b"\n")
