"""Minimizer computation — shared infrastructure for the downstream stages.

The reference delegates minimizer work to external tools (ntLink/btllib for
scaffolding+gap fill, minimap2 for polishing alignments; bin/goldrush:266-296).
Here minimizers are computed on device with the same ntHash machinery as the
golden-path engine: an all-care "spaced" seed of span k is exactly the
classic unspaced canonical ntHash.

Windowed selection is the standard (w,k)-minimizer rule: for every window of
w consecutive k-mers keep the position of the smallest hash (ties -> leftmost),
computed as a reduce-window min over (hash, position)-packed keys.
"""

from __future__ import annotations

from functools import partial, lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .nthash import build_seed_family, hash_positions
from . import nthash_np


@lru_cache(maxsize=None)
def _unspaced_family(k: int):
    return build_seed_family(["1" * k])


def _sliding_min(keys: jax.Array, w: int) -> jax.Array:
    """Windowed min over the minor axis (VALID windows of size w) via the
    log-doubling trick: m_p[i] = min(keys[i:i+p]) built by doubling p, then
    out[i] = min(m_p[i], m_p[i+w-p]).  O(log w) elementwise passes — compiles
    orders of magnitude faster than reduce_window at large w and runs as
    pure VPU mins."""
    m = keys
    p = 1
    while p * 2 <= w:
        m = jnp.minimum(m[:, :m.shape[1] - p], m[:, p:])
        p *= 2
    n_out = keys.shape[1] - w + 1
    return jnp.minimum(m[:, :n_out], m[:, w - p: w - p + n_out])


@partial(jax.jit, static_argnames=("k", "w", "num_positions"))
def minimizer_keys(codes: jax.Array, k: int, w: int, num_positions: int
                   ) -> tuple[jax.Array, jax.Array]:
    """Packed minimizer keys per window + position hashes, one fused jit.

    codes: uint8 [B, L]; returns (keys uint64 [B, num_windows], hashes
    uint64 [B, num_positions]) where each key is (hash << 20 | position) of
    the window minimizer; num_windows = num_positions - w + 1.  Caller masks
    windows beyond a sequence's valid range and dedupes repeated selections.
    """
    fam = _unspaced_family(k)
    hashes = hash_positions(codes, fam, num_positions)[:, 0, :]   # [B, P]
    pos = jnp.arange(num_positions, dtype=jnp.uint64)
    # keep the top 44 bits of the hash; low 20 bits carry the position
    keys = ((hashes >> jnp.uint64(20)) << jnp.uint64(20)) | pos
    return _sliding_min(keys, w), hashes                          # [B, nw]


def minimizers_np(seq_codes: np.ndarray, k: int, w: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Host oracle: (positions, hashes) of the (w,k)-minimizer set."""
    fwd, rev = nthash_np.seed_hashes(seq_codes, "1" * k)
    h = np.minimum(fwd, rev)
    P = h.shape[0]
    if P < w:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    keys = ((h >> np.uint64(20)) << np.uint64(20)) | np.arange(P, dtype=np.uint64)
    nw = P - w + 1
    # sliding window min
    from numpy.lib.stride_tricks import sliding_window_view
    mins = sliding_window_view(keys, w).min(axis=1)
    sel = np.unique(mins)
    pos = (sel & np.uint64((1 << 20) - 1)).astype(np.int64)
    return pos, h[pos]


def batch_minimizers(codes: np.ndarray, lengths: np.ndarray, k: int, w: int
                     ) -> list[tuple[np.ndarray, np.ndarray]]:
    """Device-computed minimizers for a padded batch; returns per-sequence
    (positions, hashes) with window masking and dedupe done host-side."""
    B, L = codes.shape
    P = max(L - k + 1, w)
    keys_d, hashes_d = minimizer_keys(codes, k, w, P)
    keys, hashes = np.asarray(keys_d), np.asarray(hashes_d)
    out = []
    for b in range(B):
        nvalid = int(lengths[b]) - k + 1
        nwin = nvalid - w + 1
        if nwin <= 0:
            out.append((np.zeros(0, np.int64), np.zeros(0, np.uint64)))
            continue
        sel = np.unique(keys[b, :nwin])
        pos = (sel & np.uint64((1 << 20) - 1)).astype(np.int64)
        pos = pos[pos < nvalid]
        out.append((pos, hashes[b, pos]))
    return out
