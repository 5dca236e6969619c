"""Small helpers shared by the sequential (engine.py) and wavefront
(wavefront.py) consume implementations."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tile_min_count(top_count: jax.Array, n_tiles: jax.Array) -> jax.Array:
    """Per-read minimum top vote count over in-read tiles: int32 [B].

    The trim-recheck margin signal — a read whose weakest tile is close to
    the assignment gate re-classifies at full resolution regardless of how
    confidently the sampled tier scored the rest."""
    B, T = top_count.shape
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    in_read = t_idx < n_tiles[:, None]
    big = jnp.int32(1 << 30)
    return jnp.min(jnp.where(in_read, top_count, big), axis=1)
