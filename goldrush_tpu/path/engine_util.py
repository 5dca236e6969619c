"""Small helpers shared by the sequential (engine.py) and wavefront
(wavefront.py) consume implementations."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def recheck_zone(dec, na, n_tiles, trim_start, trim_end, tile_min,
                 frame_stride: int, threshold: int, assigned_max: int):
    """The trim-recheck boundary-zone predicate (shared by the sequential
    scan and the wavefront rounds; elementwise over any shape).

    Encodes three MEASURED findings (tools/calib_gate.py, round 4), pinned
    by tests/test_recheck_zone.py so a refactor cannot silently flip one:

      * margin: a fully-assigned read whose weakest tile's sampled top
        count scaled to full-vote units (tile_min * stride) is within 2x
        of the assignment gate re-classifies — makes the trigger
        stride-independent;
      * partial drops re-classify only with a meaningful unassigned
        stretch (>= 3 tiles) or near the whole-read boundary
        (na <= assigned_max + 2): fragmented single-tile dropouts are
        sampling noise the exact classifier drops too (zone rate
        75% -> ~55%);
      * every trim decision (dec == 2) re-classifies.
    """
    weak = tile_min * frame_stride < 2 * threshold
    stretch = trim_end.astype(jnp.int32) - trim_start.astype(jnp.int32) - 1
    partial = (na > 0) & (na < n_tiles) & \
        ((stretch >= 3) | (na <= assigned_max + 2))
    return partial | (dec == 2) | ((na >= n_tiles) & weak)


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
