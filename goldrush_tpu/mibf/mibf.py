"""Device-side multi-index Bloom filter: flat HBM arrays + batched kernels.

TPU-first redesign of the reference miBF (MIBloomFilter.hpp /
MIBFConstructSupport.hpp).  The pointer-chasing interleaved-bitvector +
rank-select structure becomes two dense uint32 arrays indexed directly by
slot ("direct" mode; a rank-compressed mode for memory parity at human scale
is layered on later):

  words[slot]  = [31: saturation][30: presence][29..0: block ID]
  counts[slot] = reservoir counter (MIBFConstructSupport.hpp m_counts)

Queries are pure gathers; pass-1 construction is a scatter-max of the
presence bit; insertion is a per-block sort/dedupe + scatter that reproduces
the reference's deterministic reservoir accept rule exactly (see
mibf_np.MibfOracle, the behavioral oracle these kernels are tested against).

Vote counting (goldrush_path.cpp:529-634) is reformulated as a batched
sort + run-length pass over each tile's [frames x h] vote matrix, yielding
for every tile: the max-count ID (smallest ID wins ties, matching std::map
iteration order), the count>2 candidate list truncated to K slots, and the
query/hit/miss counter deltas.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

SAT_BIT = np.uint32(1 << 31)
PRESENT_BIT = np.uint32(1 << 30)
ID_MASK = np.uint32((1 << 30) - 1)


@dataclasses.dataclass(frozen=True)
class MibfParams:
    """Static geometry of the filter + classifier (jit-static)."""
    size: int                  # number of real slots (slot `size` = sentinel)
    h: int                     # number of seed patterns
    k: int                     # span of seed 0
    spans: tuple[int, ...]     # per-seed spans
    tile_length: int = 1000
    threshold: int = 10        # -x
    block_size: int = 10       # -b
    vote_topk: int = 16

    @property
    def idx_dtype(self):
        return jnp.int32 if self.size + 1 < 2 ** 31 else jnp.int64


class MibfState(NamedTuple):
    words: jax.Array           # uint32 [size + 1]
    counts: jax.Array          # uint32 [size + 1]


def init_state(params: MibfParams) -> MibfState:
    return MibfState(
        words=jnp.zeros(params.size + 1, dtype=jnp.uint32),
        counts=jnp.zeros(params.size + 1, dtype=jnp.uint32),
    )


def fastrange(h: jax.Array, size: int) -> jax.Array:
    """floor(h * size / 2**64) for size < 2**32 — the slot map (replaces the
    reference's 64-bit modulo, which TPUs lack)."""
    h = h.astype(jnp.uint64)
    s = jnp.uint64(size)
    p1 = (h >> jnp.uint64(32)) * s
    p2 = ((h & jnp.uint64(0xFFFFFFFF)) * s) >> jnp.uint64(32)
    return (p1 + p2) >> jnp.uint64(32)


def fill_presence(words: jax.Array, hashes: jax.Array, valid: jax.Array,
                  size: int, idx_dtype=jnp.int32) -> jax.Array:
    """Pass-1 presence fill (MIBFConstructSupport.hpp:134-147): set the
    presence bit for every valid hash's slot."""
    slots = fastrange(hashes.reshape(-1), size)
    slots = jnp.where(valid.reshape(-1), slots, jnp.uint64(size))
    return words.at[slots.astype(idx_dtype)].max(
        jnp.uint32(PRESENT_BIT), mode="drop")


# ---------------------------------------------------------------------------
# tile/frame slot grid
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("params", "num_tiles_max"))
def tile_slot_grid(hashes: jax.Array, lengths: jax.Array,
                   params: MibfParams, num_tiles_max: int
                   ) -> tuple[jax.Array, jax.Array]:
    """Map whole-read position hashes to the per-tile probe grid.

    hashes: uint64 [B, h, P] canonical hashes (P >= num_tiles_max*tile_length)
    lengths: int32 [B] true read lengths.
    Returns (slots [B, T, F, H] idx_dtype with sentinel for invalid,
             frame_ok [B, T, F] bool).

    Tile t covers read[t*TL : t*TL + TL + k - 1] (read_hashing.cpp:44-46);
    frame f of seed s probes global position t*TL + min(f, L_t - span_s) —
    the clamp reproduces the stale-tail lockstep of
    multiLensfrHashIterator.hpp:49-67.
    """
    TL, k = params.tile_length, params.k
    B = hashes.shape[0]
    T, F, H = num_tiles_max, TL, params.h
    t_idx = jnp.arange(T, dtype=jnp.int32)[:, None, None]        # [T,1,1]
    f_idx = jnp.arange(F, dtype=jnp.int32)[None, :, None]        # [1,F,1]
    spans = jnp.asarray(params.spans, dtype=jnp.int32)[None, None, :]
    L = lengths.astype(jnp.int32)[:, None, None, None]           # [B,1,1,1]
    tile_len = jnp.minimum(TL + k - 1, L - t_idx * TL)           # [B,T,1,1]
    num_tiles = L // TL
    frames_t = tile_len - k + 1                                  # [B,T,1,1]
    pos = t_idx * TL + jnp.minimum(f_idx, tile_len - spans)      # [B,T,F,H]
    valid = (t_idx < num_tiles) & (f_idx < frames_t)             # [B,T,F,1]
    pos = jnp.clip(pos, 0, hashes.shape[2] - 1)
    # gather hashes[b, s, pos] via one flat index per element
    s_idx = jnp.arange(H, dtype=jnp.int32)[None, None, None, :]
    flat = hashes.reshape(B, -1)                                 # [B, h*P]
    P = hashes.shape[2]
    gidx = s_idx * P + pos                                       # [B,T,F,H]
    hv = jnp.take_along_axis(flat, gidx.reshape(B, -1), axis=1).reshape(
        B, T, F, H)
    slots = fastrange(hv, params.size)
    slots = jnp.where(valid, slots, jnp.uint64(params.size))
    return slots.astype(params.idx_dtype), valid[..., 0]


# ---------------------------------------------------------------------------
# probe + vote
# ---------------------------------------------------------------------------

class VoteResult(NamedTuple):
    curr_id: jax.Array      # uint32 [B, T]  max-count id (ties -> smallest)
    top_count: jax.Array    # int32  [B, T]  its count
    cand_ids: jax.Array     # uint32 [B, T, K]  ids with count>2, count desc
    cand_counts: jax.Array  # int32  [B, T, K]
    bool_init: jax.Array    # bool   [B, T]  initial assignment (count>x gate)
    overflow: jax.Array     # int32  [B, T]  candidates dropped beyond K
    queries: jax.Array      # int64  [B]     counter deltas for log parity
    hits: jax.Array         # int64  [B]
    misses: jax.Array       # int64  [B]


@partial(jax.jit, static_argnames=("params",))
def probe_and_vote(words: jax.Array, slots: jax.Array, frame_ok: jax.Array,
                   params: MibfParams) -> VoteResult:
    """Batched miBF probe + per-tile ID voting (goldrush_path.cpp:544-634)."""
    B, T, F, H = slots.shape
    K = params.vote_topk
    w = words[slots]                                     # [B,T,F,H] gather
    present = (w & PRESENT_BIT) != 0
    frame_present = present.all(axis=-1) & frame_ok      # [B,T,F] atRank gate
    ids = jnp.where(w > SAT_BIT, w & jnp.uint32(~SAT_BIT), w) & ID_MASK
    ids = jnp.where(frame_present[..., None], ids, 0)
    # counters (goldrush_path.cpp:567-594): queries per frame; hit/miss only
    # counted inside present frames
    queries = frame_ok.sum(axis=(1, 2), dtype=jnp.int64)
    pm = frame_present[..., None]
    hits = (pm & (ids != 0)).sum(axis=(1, 2, 3), dtype=jnp.int64)
    misses = (pm & (ids == 0)).sum(axis=(1, 2, 3), dtype=jnp.int64)
    # dedupe ids within a frame (the per-frame unique_ids set)
    for j in range(1, H):
        dup = jnp.zeros(ids.shape[:-1], dtype=bool)
        for i in range(j):
            dup = dup | (ids[..., j] == ids[..., i])
        ids = ids.at[..., j].set(jnp.where(dup, 0, ids[..., j]))
    votes = ids.reshape(B * T, F * H)
    votes = jnp.sort(votes, axis=1)                      # ascending, 0s first
    prev = jnp.pad(votes[:, :-1], ((0, 0), (1, 0)))
    is_start = (votes != 0) & (votes != prev)
    idx = jnp.arange(F * H, dtype=jnp.int32)[None, :]
    # next start (or end) index after each position -> run length at starts
    start_pos = jnp.where(is_start, idx, F * H)
    next_start = jnp.concatenate(
        [jnp.flip(jax.lax.cummin(jnp.flip(start_pos[:, 1:], 1), axis=1), 1),
         jnp.full((B * T, 1), F * H, dtype=jnp.int32)], axis=1)
    run_len = jnp.where(is_start, next_start - idx, 0)   # count per unique id
    # sort unique (count desc, id asc): single u64 key
    FH = F * H
    key = jnp.where(
        is_start,
        (jnp.uint64(FH + 1) - run_len.astype(jnp.uint64)) << jnp.uint64(32)
        | votes.astype(jnp.uint64),
        jnp.uint64(0xFFFFFFFFFFFFFFFF))
    key = jax.lax.sort(key, dimension=1)
    top_ids = (key & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    top_counts = jnp.where(
        key == jnp.uint64(0xFFFFFFFFFFFFFFFF), 0,
        (jnp.uint64(FH + 1) - (key >> jnp.uint64(32))).astype(jnp.int64)
    ).astype(jnp.int32)
    top_ids = jnp.where(top_counts > 0, top_ids, 0)
    curr_id = top_ids[:, 0]
    top_count = top_counts[:, 0]
    over2 = top_counts > 2
    cand_ids = jnp.where(over2[:, :K], top_ids[:, :K], 0)
    cand_counts = jnp.where(over2[:, :K], top_counts[:, :K], 0)
    overflow = jnp.maximum(over2.sum(axis=1) - K, 0).astype(jnp.int32)
    bool_init = (top_count > 2) & (top_count > params.threshold)
    return VoteResult(
        curr_id=curr_id.reshape(B, T),
        top_count=top_count.reshape(B, T),
        cand_ids=cand_ids.reshape(B, T, K),
        cand_counts=cand_counts.reshape(B, T, K),
        bool_init=bool_init.reshape(B, T),
        overflow=overflow.reshape(B, T),
        queries=queries, hits=hits, misses=misses,
    )


# ---------------------------------------------------------------------------
# insertion
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("params", "max_blocks"))
def insert_read(state: MibfState, slots: jax.Array, tile_lo: jax.Array,
                tile_hi: jax.Array, base_id: jax.Array, trimmed: jax.Array,
                params: MibfParams, max_blocks: int) -> MibfState:
    """Insert one read's tile blocks (process_read, goldrush_path.cpp:983-994
    untrimmed / :1041-1053 trimmed).

    slots: [T, F, H] probe grid of the read (sentinel-padded); tiles in
    [tile_lo, tile_hi] (inclusive) are grouped into blocks of ``block_size``
    consecutive tiles; block m gets ID base_id + m (the trimmed path's
    ``(m*bs+1)/bs`` index reduces to m for bs>1; for bs==1 it is m+1 —
    reproduced exactly below).  Blocks are inserted sequentially, matching
    the reference's per-read insertion order so cross-block counter updates
    on shared slots agree with the oracle.
    """
    T, F, H = slots.shape
    bs = params.block_size
    sentinel = jnp.asarray(params.size, dtype=slots.dtype)
    words0, counts0 = state

    def body(m, carry):
        words, counts = carry
        lo = tile_lo + m * bs
        hi = jnp.minimum(lo + bs - 1, tile_hi)
        block_id = jnp.where(
            trimmed,
            base_id + (m * bs + 1) // bs,
            base_id + m).astype(jnp.uint32)
        t_idx = jnp.arange(T, dtype=jnp.int32)
        in_block = (t_idx >= lo) & (t_idx <= hi)
        s = jnp.where(in_block[:, None, None], slots, sentinel).reshape(-1)
        s = jax.lax.sort(s)
        prev = jnp.concatenate([jnp.full((1,), -1, dtype=s.dtype), s[:-1]])
        u_first = (s != prev) & (s != sentinel)
        # per-slot counter bump (each unique slot exactly once)
        add_idx = jnp.where(u_first, s, sentinel)
        counts = counts.at[add_idx].add(u_first.astype(jnp.uint32),
                                        mode="drop")
        cnt = counts[s]                       # post-increment value
        rand = (s.astype(jnp.uint32) ^ block_id)
        accept = u_first & ((rand % jnp.maximum(cnt, 1)) == cnt - 1)
        old = words[s]
        new_word = (old & (SAT_BIT | PRESENT_BIT)) | block_id
        w_idx = jnp.where(accept, s, sentinel)
        words = words.at[w_idx].set(jnp.where(accept, new_word, old),
                                    mode="drop")
        # blocks past tile_hi are natural no-ops: in_block is empty, so every
        # element routes to the sentinel slot
        return words, counts

    # number of blocks actually needed is data-dependent; loop the static
    # maximum and no-op past the end (guarded by `active` above)
    words, counts = jax.lax.fori_loop(0, max_blocks, body, (words0, counts0))
    return MibfState(words=words, counts=counts)


def reset_ids(state: MibfState) -> MibfState:
    """Silver-path rotation (goldrush_path.cpp:156-187): zero IDs + counters,
    keep presence bits."""
    return MibfState(words=state.words & PRESENT_BIT,
                     counts=jnp.zeros_like(state.counts))
