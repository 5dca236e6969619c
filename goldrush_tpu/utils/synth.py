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
                   both_strands: bool = True,
                   indel_frac: float = 0.0) -> list[tuple[str, bytes, bytes]]:
    """Uniformly sampled reads in random order with optional errors.

    ``err_rate`` is the total per-base error rate; ``indel_frac`` of the
    errors are split evenly between 1-bp insertions and deletions (ONT-like
    profile ~0.4), the rest are substitutions.  Quality strings are
    constant-ish around ``phred``.  Read ids encode the true genomic start
    (``read{i}_p{start}``) so tests can score recruits positionally."""
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
            n_ind = int(nerr * indel_frac)
            n_sub = nerr - n_ind
            pos = rng.integers(0, L, n_sub)
            seq[pos] = BASES[rng.integers(0, 4, n_sub)]
            if n_ind:
                parts = []
                cut = np.sort(rng.integers(0, len(seq), n_ind))
                is_ins = rng.integers(0, 2, n_ind).astype(bool)
                prev = 0
                for p, ins in zip(cut, is_ins):
                    parts.append(seq[prev:p])
                    if ins:
                        parts.append(BASES[rng.integers(0, 4, 1)])
                        prev = p
                    else:
                        prev = p + 1          # drop one base
                parts.append(seq[prev:])
                seq = np.concatenate(parts)
        s = bytes(seq)
        if both_strands and rng.integers(0, 2):
            s = revcomp(s)
        q = np.clip(phred + rng.integers(-phred_jitter, phred_jitter + 1,
                                         len(s)),
                    2, 40).astype(np.uint8) + 33
        out.append((f"read{i}_p{start}", s, bytes(q)))
    return out


def write_fastq(path: str, reads) -> None:
    with open(path, "wb") as f:
        for rid, seq, qual in reads:
            f.write(b"@" + rid.encode() + b"\n" + seq + b"\n+\n" + qual + b"\n")
