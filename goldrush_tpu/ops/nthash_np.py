"""NumPy oracle for spaced-seed ntHash-style rolling hashes.

Replicates the *behavior* of the reference's hashing stack
(multiLensfrHashIterator.hpp:18-99 wrapping one btllib SeedNtHash per seed):
one 64-bit strand-canonical hash per seed pattern per sequence position, with
the multi-length seed family advancing in lockstep and shorter-span seeds
"going stale" (repeating their last hash) once longer positions run out
(multiLensfrHashIterator.hpp:49-67).

The hash itself is ntHash (Mohamadi et al. 2016) with the published per-base
constants, restricted to the seed's care positions:
  fwd(p)  = XOR_{j in care} rol64(TAB[s[p+j]], span-1-j)
  rev(p)  = XOR_{j in care} rol64(TAB[complement(s[p+j])], j)
  canon   = min(fwd, rev)
which is reverse-complement invariant for the symmetric seeds GoldRush uses
(bit-parity with btllib itself is not verifiable in this environment — btllib
is not vendored by the reference — so the JAX kernel is held to parity with
this oracle instead).
"""

from __future__ import annotations

import numpy as np

# ntHash per-base constants
NT_TAB = np.array(
    [0x3C8BFBB395C60474, 0x3193C18562A02B4C, 0x20323ED082572324,
     0x295549F54BE24456], dtype=np.uint64)
# complement under encoding A=0 C=1 G=2 T=3 is 3-b
NT_TABC = NT_TAB[::-1].copy()

_ENCODE = np.full(256, 255, dtype=np.uint8)
for i, b in enumerate(b"ACGT"):
    _ENCODE[b] = i
for i, b in enumerate(b"acgt"):
    _ENCODE[b] = i


def encode_seq(seq: str | bytes) -> np.ndarray:
    """ACGT/acgt -> uint8 codes 0..3; any other byte -> 255 (invalid)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return _ENCODE[np.frombuffer(seq, dtype=np.uint8)]


def has_invalid_bases(codes: np.ndarray) -> bool:
    return bool((codes > 3).any())


def rol64(x: np.ndarray, r) -> np.ndarray:
    x = x.astype(np.uint64, copy=False)
    r = np.asarray(r, dtype=np.uint64) % np.uint64(64)
    with np.errstate(over="ignore"):
        return np.where(
            r == 0, x,
            (x << r) | (x >> (np.uint64(64) - r))).astype(np.uint64)


def seed_hashes(codes: np.ndarray, seed: str) -> tuple[np.ndarray, np.ndarray]:
    """(fwd, rev) uint64 hashes for every valid position of one seed.

    Returns arrays of length L - span + 1 (empty if the sequence is shorter
    than the seed span)."""
    span = len(seed)
    L = codes.shape[0]
    n = L - span + 1
    if n <= 0:
        return (np.zeros(0, dtype=np.uint64),) * 2
    care = np.array([j for j, c in enumerate(seed) if c == "1"])
    # windows[p, j] = codes[p + care[j]]
    windows = codes[np.arange(n)[:, None] + care[None, :]]
    fwd = np.zeros(n, dtype=np.uint64)
    rev = np.zeros(n, dtype=np.uint64)
    for idx, j in enumerate(care):
        b = windows[:, idx].astype(np.int64)
        fwd ^= rol64(NT_TAB[b], span - 1 - j)
        rev ^= rol64(NT_TABC[b], j)
    return fwd, rev


def multi_seed_canonical(codes: np.ndarray, seeds: list[str]) -> np.ndarray:
    """[h, P] canonical hashes with lockstep stale-tail semantics.

    P = L - span(seeds[0]) + 1 (the shortest seed's frame count; seeds are
    ordered by increasing span as produced by make_seed_pattern).  For seed s
    with fewer valid positions, trailing frames repeat its last valid hash,
    matching multiLensfrHashIterator.hpp:49-67.
    """
    L = codes.shape[0]
    P = L - len(seeds[0]) + 1
    if P <= 0:
        return np.zeros((len(seeds), 0), dtype=np.uint64)
    out = np.zeros((len(seeds), P), dtype=np.uint64)
    for s, seed in enumerate(seeds):
        fwd, rev = seed_hashes(codes, seed)
        canon = np.minimum(fwd, rev)
        n = canon.shape[0]
        if n == 0:
            # sequence shorter than this seed's span: reference would read an
            # unrolled hash; GoldRush never hits this (tiles >= tile_length >=
            # span), define as 0.
            continue
        out[s, :n] = canon
        if n < P:
            out[s, n:] = canon[n - 1]
    return out


def tile_frame_hashes(codes: np.ndarray, seeds: list[str], tile_length: int
                      ) -> list[np.ndarray]:
    """Per-tile flat hash arrays exactly as read_hashing.cpp:43-54 builds them.

    Tile i covers codes[i*tile : i*tile + tile + k - 1] (k = span of seed 0);
    its array is [frame0: h hashes, frame1: h hashes, ...] with frame count
    = tile_len - k + 1 and per-seed stale tails.  Returns a python list of
    uint64 arrays (one per tile), the oracle-side mirror of the device layout.
    """
    k = len(seeds[0])
    L = codes.shape[0]
    num_tiles = L // tile_length
    out = []
    for t in range(num_tiles):
        tile_codes = codes[t * tile_length: t * tile_length + tile_length + k - 1]
        canon = multi_seed_canonical(tile_codes, seeds)  # [h, F_t]
        out.append(canon.T.reshape(-1).copy())           # frame-major, h per frame
    return out
