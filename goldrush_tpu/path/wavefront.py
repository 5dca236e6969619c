"""Wavefront consume: batched rounds replace the per-read sequential scan.

OPT-IN throughput mode (cfg.wavefront; default remains the sequential
optimistic scan).  This module implements the design costed in
ARCHITECTURE.md:134-142 / VERDICT r4 item 1 — each window of reads resolves
as a device-side fixpoint of batched rounds in which classification is
chunk-compacted batched work, inserts are merged multi-recruit scatters,
and only true read-order dependencies serialize.  Measured on the bench
dataset (TPU v5 lite): ~2x the sequential scan's end-to-end throughput.
Its recruit-set Jaccard vs the exact engine measures 0.883 on the
calibration dataset — below the 0.90 gate the sequential optimistic scan
meets (0.912) — which is why it ships opt-in; the gap is analyzed below.

Round structure (ONE jitted executable per window; lax.while_loop — the
backend ships non-aliased results to the host per call once any fetch
happened, so rounds never touch the host):

  window precompute (batched, data-parallel over the mesh):
    * sampled probe + full-res insert grids mapped through the FROZEN rank
      structure once, so rounds touch only the small id table;
    * the OVERLAP ADJACENCY [B, B]: sort every (slot/rank, hash-low-bits
      fingerprint, read order) key across all insert seeds; adjacent equal
      (slot, fp) keys are genuine shared k-mers and consecutive pairs
      chain each sharing group in read order.  Pairs sharing >= ADJ_MIN
      distinct k-mers are overlaps (ground-truth census: spurious
      spaced-seed value collisions share <= 6, true overlaps >= 7-13);
      without the fingerprint, Bloom slot collisions flagged ~1000 false
      conflicts per candidate, and without the count threshold the
      spurious edges glued the window into one serial component.
  round:
    1. chunked sampled classify of rows whose view changed (a commit by
       an EARLIER-ordered read; staleness is one-directional);
    2. boundary-zone detection (the in-scan trim recheck rules);
    3. drops finalize immediately; a silver rotation REOPENS drop-finalized
       reads past the rotation point (the sequential reset_seen semantics —
       finalizing them early was measured at -0.45 Jaccard);
    4. conflicts: a candidate waits while any earlier unresolved read is
       adjacency-linked to it;
    5. TWO-PHASE commit: non-zone recruits insert first, the zone recheck
       then runs full-res against the updated table, zone (trim) commits
       follow;
    6. rotation horizon: commits stay under a read-order PESSIMISTIC base
       count so no read at-or-beyond a possible rotation point commits
       early — device rotations stay bit-consistent with the host
       replay's read-order walk (goldrush_path.cpp:156-187);
    7. merged inserts: chunk-compacted multi-read scatter-max, block ids
       from READ-ORDER RESERVATIONS (each read owns a fixed id range =
       prefix sum of max block counts), so ids order like the sequential
       engine's regardless of commit round;
    8. the id table is kept as a TWO-TABLE BRACKET: the plain latest-wins
       table plus an earliest-wins complement table (scatter-max of
       INV_BASE - id).  A reader decodes the latest writer when its id is
       under the reader's read-order ceiling and falls back to the
       earliest writer otherwise, i.e. later-ordered out-of-order commits
       are invisible, like in the sequential engine's view.

Measured quality ladder on the calibration dataset (recruit-set Jaccard
vs the exact engine; sequential optimistic = 0.912, scatter-max insert
floor = 0.906):

    rotation-reopen fix               0.464 -> 0.827
    fingerprinted conflicts           0.827 -> 0.912 (near-serial commits)
    + precise adjacency (parallel)    0.851
    + order-directional staleness     0.865
    + read-order id reservations      (the -0.03 commit-order permutation)
    + two-table bracket + ceiling     0.883
    serial-commit diagnostic mode     0.912 (GOLDRUSH_WAVE_SERIAL)

The residual 0.883 vs 0.912 is NOT removable by more conflict precision:
commits that parallelize cannot reproduce (a) the reference's accidental
cross-recruit id-adjacency quirk (consecutive recruits' block ids differ
by one, which the smoothing/flank logic's +-1 tests read; reservations
leave gaps where drops consumed their range), and (b) collision-level
vote coupling from earlier-ordered reads that resolve in the same round.
Both channels are the reservoir-winner nondeterminism class the reference
accepts across thread interleavings (MIBloomFilter.hpp:105-107), but the
0.90 gate is calibrated against the sequential realization, so the
wavefront ships opt-in until a gate-green operating point exists.

Matches the reference consume loop goldrush_path.cpp:983-1053 + 1229-1256
in behavior class; the reformulation (rounds + conflict wavefront) is the
TPU-native expression of its sequential recruit-then-probe dependency.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

from ..mibf import mibf as dm
from ..mibf.compressed import (CompressedState, _rank_lookup,
                               _vote_from_words)
from ..mibf.mibf import PRESENT_BIT
from .classify import classify_batch
from .engine_util import recheck_zone, tile_min_count

# rows per compacted chunk per stage: the chunk is the static shape unit of
# each dynamic-size row set; partially-filled chunks waste at most
# (CHUNK-1) rows of gather traffic
CLASSIFY_CHUNK = 64
CONFLICT_CHUNK = 32
RECHECK_CHUNK = 16
INSERT_CHUNK = 16
# conflict fingerprint bits packed under the epoch+order key (see step 4)
FP_BITS = 15
# direct-mode conflict scratch: slots hash into 2^24 buckets (64 MB) —
# fingerprint-verified, so collisions are harmless; compressed mode uses
# the (already small) rank space directly
DIRECT_CONFLICT_BITS = 24

_SERIAL = bool(_os.environ.get("GOLDRUSH_WAVE_SERIAL"))
# ids are stored COMPLEMENTED (INV_BASE - id, combined by scatter-max =
# min-id-wins = EARLIEST-ordered-writer-wins).  Together with each read's
# id-visibility ceiling this reconstructs an exactly order-consistent view:
# a slot's stored winner is the earliest writer, so masking ids above the
# reader's ceiling never hides an earlier writer behind a later one (the
# max-id-wins + ceiling variant did exactly that at contested slots,
# measured -0.013; the earliest-vs-latest winner difference is the same
# nondeterminism class as the reference's reservoir, MIBloomFilter.hpp:105)
INV_BASE = jnp.uint32(1 << 28)
# The engine threads a SIDE table (same shape as the id table) through the
# wave: the main table keeps the sequential engine's PLAIN latest-wins ids
# (scatter-max of id), the side table the complemented earliest-wins ids
# (scatter-max of INV_BASE - id).  A reader under ceiling c takes the
# latest writer when its id <= c (the exact sequential-latest view) and
# falls back to the earliest writer when the latest is a later-ordered
# read — wrong only at slots straddled by 3+ writers around the reader,
# a residual within the reservoir-winner nondeterminism class.
# commits allowed per round (0 = unlimited): bounds the same-round mutual
# staleness of parallel commits — the quality/round-count dial
_WAVE_K = int(_os.environ.get("GOLDRUSH_WAVE_K", "0"))
TRACE_N = 512        # debug per-round trace capacity
# minimum shared DISTINCT k-mers (across all insert seeds) for two window
# reads to count as overlapping.  Measured against ground-truth read
# positions (round 5, 3-seed census): spurious pairs (spaced-seed value
# collisions between distant loci, correlated across a few shifted
# positions) share <= 6 k-mers; genuine overlaps share >= 13 on the bench
# window and >= 7 on the heavy-indel calibration window except for pairs
# sharing <= 3 slots — which barely interact through the filter at all.
# 6 therefore separates the populations; the spurious edges it removes
# were what glued the window adjacency into one giant component and
# serialized the wavefront (~1-2 commits/round)
ADJ_MIN = 6


def _cumsum64(x):
    """Inclusive cumsum for small int64 vectors via associative_scan.

    jnp.cumsum on int64 lowers to a u32-PAIR reduce-window on TPU, which
    trips a scoped-vmem compiler overflow inside the big while-loop body
    (measured round 5: "Ran out of memory in memory space vmem ...
    reduce-window u32[2,128]"); the log-step shifted-add lowering does not.
    """
    return jax.lax.associative_scan(jnp.add, x)


def build_wave_consume(eng, B: int, T: int):
    """Build the window consume executable for engine ``eng`` at batch
    bucket (B, T).  Same signature/donation contract as the sequential
    consume (engine._consume_for): (filt, codes, lengths, full_lengths,
    scal0, rows0) -> (filt, rows, scal), every output donation-aliased."""
    cfg = eng.cfg
    params = eng.params                 # sampled probe tier
    params_ins = eng.params_ins         # insert grid (full res by default)
    params_full = eng.params_full       # recheck gates (x, vote_min=2)
    fam_q, fam_ins = eng.fam_q, eng.fam_ins
    compressed = eng.compressed
    TL, bs = params.tile_length, params.block_size
    S = params.frame_stride
    Hq = params.h
    H = params_ins.h
    silver = bool(cfg.silver_path)
    target = int(cfg.target_bases())
    max_paths = int(cfg.max_paths)
    u_min, a_max = cfg.unassigned_min, cfg.assigned_max
    x_eff = eng.x_eff
    x_full = cfg.threshold
    # the full-res trim recheck reuses the insert grid, which equals the
    # full-resolution all-seed grid only at insert_stride == 1 (same gate
    # as the sequential scan's rech_on)
    rech_on = (cfg.trim_recheck and cfg.insert_stride == 1
               and (S > 1 or eng.h_active < eng.h_ins))
    F_ins = TL // cfg.insert_stride
    TF_ins = T * F_ins
    TFq = T * (TL // S)
    mesh, repl = eng.mesh, eng._shard_repl
    fp_mask = jnp.uint32((1 << FP_BITS) - 1)
    debug = bool(getattr(eng, "_wave_debug", False))

    def consume(filt, codes, lengths, full_lengths, scal0, rows0, side0):
        n_tiles = (lengths // TL).astype(jnp.int32)
        order = jnp.arange(B, dtype=jnp.int32)

        # ---------------- precompute: grids through the frozen structure
        slots_q, ok_q = dm.build_slot_grid(codes, lengths, fam_q, params, T)
        slots_i, ok_i = dm.build_slot_grid(codes, lengths, fam_ins,
                                           params_ins, T)
        if compressed:
            br, su, cn = filt.bitrank, filt.supers, filt.counts
            shell = CompressedState(br, su, filt.ids, cn)
            sent = filt.ids.shape[0] - 1          # pop sentinel rank
            pq, rq = _rank_lookup(shell, slots_q, params.size)
            rank_q = jnp.where(pq, rq, sent).astype(jnp.int32)
            pi, ri = _rank_lookup(shell, slots_i, params.size)
            rank_g = jnp.where(pi, ri, sent).astype(jnp.int32)
            table0 = filt.ids
            drop_idx = jnp.int32(filt.ids.shape[0])   # mode="drop" target
            conf_size = filt.ids.shape[0]
            conf_g = jnp.where(rank_g < sent, rank_g, drop_idx)

            def probe_words(tables, ranks, ceil_r):
                # ranks [C, Hs, TFs]: sentinel -> absent (word 0).  Reader
                # view under the order ceiling: the plain (latest-wins)
                # table when its winner is visible, else the complemented
                # (earliest-wins) side table — see the INV_BASE note
                table, side = tables
                ceil_u = ceil_r.astype(jnp.uint32)[:, None]
                cmin = INV_BASE - ceil_u
                ws = []
                for s in range(ranks.shape[1]):
                    r = ranks[:, s, :]
                    p = table[r]
                    c = side[r]
                    early = jnp.where((c > 0) & (c >= cmin),
                                      INV_BASE - c, 0)
                    idv = jnp.where((p > 0) & (p <= ceil_u), p, early)
                    w = jnp.where(r < sent, PRESENT_BIT | idv, 0)
                    ws.append(w.astype(jnp.uint32))
                return ws

            def insert_val(bid):
                return bid                  # main table: latest-wins

            def insert_val_side(bid):
                return INV_BASE - bid       # side: earliest-wins

            def reset_table(table):
                return jnp.zeros_like(table)
        else:
            sent = int(params.size)
            rank_q = slots_q.astype(jnp.int32)
            rank_g = slots_i.astype(jnp.int32)
            table0 = filt.words
            drop_idx = jnp.int32(params.alloc)
            conf_size = 1 << DIRECT_CONFLICT_BITS
            mask24 = jnp.int32(conf_size - 1)
            conf_g = jnp.where(rank_g < sent, rank_g & mask24,
                               jnp.int32(conf_size))

            def probe_words(tables, slots, ceil_r):
                # see the compressed twin (the direct word keeps PRESENT in
                # bit 30 and the plain id below; the side table holds bare
                # complemented ids; goldrush-path never sets saturation in
                # pass 2)
                table, side = tables
                ceil_u = ceil_r.astype(jnp.uint32)[:, None]
                cmin = INV_BASE - ceil_u
                idm = jnp.uint32((1 << 30) - 1)
                ws = []
                for s in range(slots.shape[1]):
                    w = table[slots[:, s, :]]
                    c = side[slots[:, s, :]]
                    p = w & idm
                    early = jnp.where((c > 0) & (c >= cmin),
                                      INV_BASE - c, 0)
                    idv = jnp.where((p > 0) & (p <= ceil_u), p, early)
                    ws.append((w & ~idm) | idv)
                return ws

            def insert_val(bid):
                return PRESENT_BIT | bid

            def insert_val_side(bid):
                return INV_BASE - bid

            def reset_table(table):
                return table & PRESENT_BIT
        counts0 = filt.counts
        # position fingerprints: low bits of each seed's HASH at the same
        # position.  Two different k-mers that collide on a slot virtually
        # never share the hash's low bits (fastrange consumes the high
        # bits), while two reads covering the same genomic position with
        # that seed's k-mer intact share hash AND slot — a fingerprint
        # match certifies a genuine shared k-mer.  ALL insert seeds
        # contribute keys: on heavy-indel data a seed-0-only census missed
        # multi-kb overlaps whose seed-0 k-mers happened to decay (the
        # three seeds triple the detection rate while spurious value
        # collisions stay seed-local and low-count).  Seeds 1-2 have clamp
        # fix-ups at tile tails where the plain position slice mismatches
        # the grid — those few frames only lose detections, never pair.
        from ..ops.nthash import hash_positions
        hh = hash_positions(codes, fam_ins, T * TL)           # [B, H, P]
        fp_g = (hh[:, :, :: cfg.insert_stride][:, :, : TF_ins]
                .astype(jnp.uint32)) & fp_mask

        # ---------------- window overlap adjacency (computed ONCE).  Sort
        # the window's (slot/rank, fingerprint, read order) keys over all
        # seeds; adjacent equal (slot, fp) keys are genuine shared k-mers,
        # and the consecutive pairs chain every sharing group in read
        # order — reads that share NO k-mer can commit in any relative
        # order (an insert that touches none of a read's slots cannot
        # change its votes), so rounds only need this [B, B] bitmask, not
        # per-round scatter work (the per-round epoch-scratch version
        # re-scattered ~20k elems per pending read per round — the
        # dominant round cost on-chip).
        ORD_BITS = max((B - 1).bit_length(), 1)
        ord_mask = jnp.uint64((1 << ORD_BITS) - 1)
        key = (conf_g.astype(jnp.uint64)
               << jnp.uint64(FP_BITS + ORD_BITS)) \
            | (fp_g.astype(jnp.uint64) << jnp.uint64(ORD_BITS)) \
            | order[:, None, None].astype(jnp.uint64)
        # invalid positions get globally unique keys (never pair); the
        # unique id sits ABOVE the order bits — with it in the low bits,
        # consecutive ids shared a >>ORD_BITS prefix and paired every
        # (i, i+1) read couple through their invalid positions, chaining
        # the whole window into a serial order-adjacency (measured: the
        # post-rotation tail committed exactly 1 read/round for ~35 rounds)
        uniq = (jnp.uint64(1) << jnp.uint64(62)) \
            + (jnp.arange(B * H * TF_ins, dtype=jnp.uint64)
               << jnp.uint64(ORD_BITS)).reshape(B, H, TF_ins)
        key = jnp.where(conf_g < conf_size, key, uniq).reshape(-1)
        sk = jax.lax.sort(key)
        same = (sk[1:] >> jnp.uint64(ORD_BITS)) == \
            (sk[:-1] >> jnp.uint64(ORD_BITS))
        o1 = (sk[1:] & ord_mask).astype(jnp.int32)
        o0 = (sk[:-1] & ord_mask).astype(jnp.int32)
        pair = same & (o1 != o0)
        hi = jnp.maximum(o1, o0)
        lo = jnp.minimum(o1, o0)
        # COUNT shared k-mers per pair and require ADJ_MIN of them: a true
        # genomic overlap shares ~100 intact k-mers per kb, while the
        # spaced seed's 4^w value space makes single cross-locus repeated
        # k-mers common at Mbp scale (~10 random partners per read per
        # window measured on the bench genome — treating any shared k-mer
        # as an overlap made the adjacency near-complete and the wavefront
        # serial, 1-5 commits/round).  A one-or-two-k-mer share can shift a
        # tile's vote count by at most that much — the same noise class
        # the quality gate already covers.
        cnt = jnp.zeros((B * B,), jnp.int32).at[
            jnp.where(pair, hi * B + lo, B * B)].add(
                1, mode="drop").reshape(B, B)
        adj = cnt >= ADJ_MIN
        adj_sym = adj | adj.T        # staleness propagation needs both dirs

        if mesh is not None:
            # grids were computed data-parallel; the round loop's gathers,
            # scatters and per-read bookkeeping read them replicated (the
            # conflict/commit machinery is window-global)
            rank_q_l, rank_g_l, ok_q_l, ok_i_l, adj_l, adj_sym_l = (
                jax.lax.with_sharding_constraint(a, repl)
                for a in (rank_q, rank_g, ok_q, ok_i, adj, adj_sym))
        else:
            rank_q_l, rank_g_l, ok_q_l, ok_i_l, adj_l, adj_sym_l = (
                rank_q, rank_g, ok_q, ok_i, adj, adj_sym)

        ids_ins0, ins_bases0, path_idx0, done0 = (scal0[0], scal0[1],
                                                  scal0[2], scal0[3])
        L64 = full_lengths.astype(jnp.int64)
        # per-read maximum block count = the read-order id reservation unit
        maxb = jnp.where(L64 > 0, 1 + L64 // (TL * bs), 0)
        target_eff = jnp.int64(target if silver else (1 << 62))

        # ---------------- chunk machinery ---------------------------------
        def compact(mask):
            """positions buffer: pos[:n] = indices of set rows, in order."""
            cidx = jnp.cumsum(mask.astype(jnp.int32)) - 1
            pos = jnp.full((B,), B, jnp.int32).at[
                jnp.where(mask, cidx, B)].set(order, mode="drop")
            return pos, mask.sum().astype(jnp.int32)

        def chunk_loop(mask, chunk, body_fn, init):
            """Run body_fn over `chunk`-row slices of the masked row set.
            body_fn(state_tuple, idxc [chunk], rowok [chunk]) -> state."""
            pos, n = compact(mask)
            rng = jnp.arange(chunk, dtype=jnp.int32)

            def cond(c):
                return c[0] * chunk < n

            def body(c):
                k = c[0]
                idx = jax.lax.dynamic_slice(pos, (k * chunk,), (chunk,))
                rowok = (k * chunk + rng) < n
                idxc = jnp.where(rowok, idx, 0)
                return (k + 1,) + tuple(body_fn(c[1:], idxc, rowok))

            return jax.lax.while_loop(cond, body,
                                      (jnp.int32(0),) + tuple(init))[1:]

        # ---------------- per-round stages --------------------------------
        def classify_pending(table, side, mask, id_ceil, arrs):
            """Sampled classify of the masked rows against the live table
            (ids above each row's ceiling masked — order-consistent view);
            results scattered into the 9 per-read arrays."""

            def body(st, idxc, rowok):
                (dec, ts, te, na, q, h, m, ov, tmin) = st
                rg = jnp.take(rank_q_l, idxc, axis=0)
                fo = jnp.take(ok_q_l, idxc, axis=0) & rowok[:, None]
                nt = jnp.take(n_tiles, idxc)
                ws = probe_words((table, side), rg,
                                 jnp.take(id_ceil, idxc))
                v = _vote_from_words(ws, fo, params, T,
                                     CLASSIFY_CHUNK, Hq, TFq)
                r = classify_batch(v.curr_id, v.top_count, v.cand_ids,
                                   v.cand_counts, nt, x_eff, u_min, a_max)
                tm = tile_min_count(v.top_count, nt)
                tgt = jnp.where(rowok, idxc, B)
                dec = dec.at[tgt].set(r.decision, mode="drop")
                ts = ts.at[tgt].set(r.trim_start, mode="drop")
                te = te.at[tgt].set(r.trim_end, mode="drop")
                na = na.at[tgt].set(r.num_assigned, mode="drop")
                q = q.at[tgt].set(v.queries, mode="drop")
                h = h.at[tgt].set(v.hits, mode="drop")
                m = m.at[tgt].set(v.misses, mode="drop")
                ov = ov.at[tgt].set(
                    v.overflow.sum(axis=1).astype(jnp.int64), mode="drop")
                tmin = tmin.at[tgt].set(tm, mode="drop")
                return (dec, ts, te, na, q, h, m, ov, tmin)

            return chunk_loop(mask, CLASSIFY_CHUNK, body, arrs)

        def recheck_rows(table, side, mask, id_ceil, arrs):
            """Full-res classify for the masked rows, chunked; returns the
            8 per-read arrays with masked rows overridden."""

            def body(st, idxc, rowok):
                dec, ts, te, na, q, h, m, ov = st
                rg = jnp.take(rank_g_l, idxc, axis=0)
                fo = jnp.take(ok_i_l, idxc, axis=0) & rowok[:, None]
                nt = jnp.take(n_tiles, idxc)
                ws = probe_words((table, side), rg,
                                 jnp.take(id_ceil, idxc))
                v = _vote_from_words(ws, fo, params_full, T,
                                     RECHECK_CHUNK, H, TF_ins)
                r = classify_batch(v.curr_id, v.top_count, v.cand_ids,
                                   v.cand_counts, nt, x_full, u_min, a_max)
                tgt = jnp.where(rowok, idxc, B)
                dec = dec.at[tgt].set(r.decision, mode="drop")
                ts = ts.at[tgt].set(r.trim_start, mode="drop")
                te = te.at[tgt].set(r.trim_end, mode="drop")
                na = na.at[tgt].set(r.num_assigned, mode="drop")
                q = q.at[tgt].set(v.queries, mode="drop")
                h = h.at[tgt].set(v.hits, mode="drop")
                m = m.at[tgt].set(v.misses, mode="drop")
                ov = ov.at[tgt].set(
                    v.overflow.sum(axis=1).astype(jnp.int64), mode="drop")
                return (dec, ts, te, na, q, h, m, ov)

            return chunk_loop(mask, RECHECK_CHUNK, body, arrs)

        t_of_ins = (jnp.arange(TF_ins, dtype=jnp.int32) // F_ins)

        def insert_rows(table, side, mask, lo, hi, base, trimmed):
            """Merged scatter-max insert of the masked rows' grids, chunked
            (many recruits per scatter — the write-combining that drops the
            per-recruit dispatch/rank overhead of the sequential scan)."""

            def body(st, idxc, rowok):
                table, side = st
                rg = jnp.take(rank_g_l, idxc, axis=0)   # [C, H, TF]
                lo_r = jnp.take(lo, idxc)
                hi_r = jnp.take(hi, idxc)
                ba_r = jnp.take(base, idxc)
                tr_r = jnp.take(trimmed, idxc)
                in_rng = ((t_of_ins[None, :] >= lo_r[:, None])
                          & (t_of_ins[None, :] <= hi_r[:, None])
                          & rowok[:, None])               # [C, TF]
                mm = jnp.where(in_rng,
                               (t_of_ins[None, :] - lo_r[:, None]) // bs, 0)
                bid = jnp.where(
                    tr_r[:, None],
                    ba_r[:, None] + ((mm * bs + 1) // bs).astype(jnp.uint32),
                    ba_r[:, None] + mm.astype(jnp.uint32))    # [C, TF]
                el_ok = in_rng[:, None, :] & (rg < sent)
                ix = jnp.where(el_ok, rg, drop_idx).reshape(-1)
                vals = jnp.broadcast_to(insert_val(bid)[:, None, :],
                                        rg.shape)
                table = table.at[ix].max(
                    vals.reshape(-1).astype(jnp.uint32), mode="drop")
                vals_s = jnp.broadcast_to(insert_val_side(bid)[:, None, :],
                                          rg.shape)
                side = side.at[ix].max(
                    vals_s.reshape(-1).astype(jnp.uint32), mode="drop")
                return (table, side)

            return chunk_loop(mask, INSERT_CHUNK, body, (table, side))

        # ---------------- round loop --------------------------------------
        def round_cond(carry):
            return jnp.any(carry[2])

        def round_body(carry):
            (table, side, pending, stale, rechecked, dec_a, ts_a, te_a,
             na_a, q_a, h_a, m_a, ov_a, tm_a, clen, path_idx, done,
             rot_pos, rnd, trace) = carry

            # read-order id reservations (step 7) and the per-read id
            # visibility ceiling they induce: ids <= ceil(j) come from
            # reads before j in the current path segment
            in_path = order > rot_pos
            base0 = jnp.where(rot_pos < 0, ins_bases0, jnp.int64(0))
            base0_ids = jnp.where(rot_pos < 0, ids_ins0, jnp.int64(0))
            resv = jnp.where(in_path, maxb, 0)
            resv_pre = _cumsum64(resv) - resv
            id_ceil = (base0_ids + resv_pre).astype(jnp.uint32)

            # 1. sampled classify — ONLY of pending rows whose
            # order-consistent view an insert may have changed since their
            # last classification (an EARLIER read committed — later
            # commits are invisible through the ceiling); everything else
            # keeps its carried verdict, so waiting rounds cost ~nothing
            work = pending & stale
            (dec, ts, te, na, q, h, m, ov, tmin) = classify_pending(
                table, side, work, id_ceil,
                (dec_a, ts_a, te_a, na_a, q_a, h_a, m_a, ov_a, tm_a))
            stale = stale & ~work
            rechecked = rechecked & ~work

            # 2. boundary zone (rules shared with the in-scan recheck via
            # engine_util.recheck_zone, pinned by tests/test_recheck_zone)
            if rech_on:
                zone = recheck_zone(dec, na, n_tiles, ts, te, tmin,
                                    S, x_full, a_max) & pending
            else:
                zone = jnp.zeros((B,), bool)

            # 3. drops finalize immediately; a silver rotation REOPENS
            # drop-finalized reads past the rotation point instead (the
            # sequential engine's reset_seen semantics: post-reset reads
            # reclassify against the reset filter) — cheaper than holding
            # drops pending under the horizon, which roughly doubled the
            # round count
            dropf = pending & (dec == 0) & ~zone
            cand = pending & ((dec > 0) | zone)

            # 4. conflict wavefront from the precomputed window adjacency:
            # a candidate waits while ANY unresolved earlier read shares a
            # k-mer with it (adj rows hold earlier partners only)
            unresolved = pending & ~dropf
            confl = cand & (adj_l & unresolved[None, :]).any(axis=1)
            if _SERIAL:
                # diagnostic (GOLDRUSH_WAVE_SERIAL): only the first
                # candidate commits per round
                confl = cand & (jnp.cumsum(cand.astype(jnp.int32)) > 1)
            committable = cand & ~confl

            # 5-7. TWO-PHASE commit: whole-read (non-zone) recruits first,
            # then the boundary-zone recheck runs against the JUST-UPDATED
            # table, then zone (trim) commits — a zone row's full-res
            # verdict therefore sees every same-round non-zone insert,
            # eliminating the same-round staleness the trim flank
            # heuristics (MIN_IDS_IN_FLANK=2) are most sensitive to.
            # Block ids come from READ-ORDER reservations (id_ceil + 1):
            # every read owns a fixed id range, so ids order exactly like
            # the sequential engine's regardless of WHICH round or phase
            # commits a read (without this, out-of-order commits permuted
            # the max-id-wins winner rule, measured -0.03 Jaccard)
            base_arr = (id_ceil + 1).astype(jnp.uint32)
            n64 = n_tiles.astype(jnp.int64)

            def horizon(commit_m, act_m, rec_len):
                # rotation horizon (read-order pessimistic base count):
                # pess(j) >= the true read-order cumulative count through
                # j while any read <= j is unresolved, so no read
                # at-or-beyond the true crossing commits early; the first
                # unresolved read always may (it IS the crossing read)
                pot = jnp.where(commit_m, rec_len,
                                jnp.where(act_m, L64, 0))
                pess = base0 + _cumsum64(
                    jnp.where(in_path, clen + pot, 0))
                first = act_m & (jnp.cumsum(act_m.astype(jnp.int32)) == 1)
                return (commit_m & ((pess <= target_eff) | first)
                        & (done == 0)), first

            def trim_geom(dec, ts, te):
                ts64 = ts.astype(jnp.int64)
                te64 = te.astype(jnp.int64)
                l_trim = jnp.where(te64 == n64 - 1, L64 - ts64 * TL,
                                   (te64 - ts64 + 1) * TL)
                rec_len = jnp.where(dec == 1, L64,
                                    jnp.where(dec == 2, l_trim, 0))
                lo = jnp.where(dec == 1, 0, ts64).astype(jnp.int32)
                hi = jnp.where(dec == 1, (n64 - 1), te64).astype(jnp.int32)
                return rec_len, lo, hi

            # phase A: non-zone commits
            commitA = committable & ~zone & (dec > 0)
            act = pending & ~dropf
            rec_len, lo, hi = trim_geom(dec, ts, te)
            allowedA, firstA = horizon(commitA, act, rec_len)
            if _WAVE_K:
                allowedA = allowedA & (
                    jnp.cumsum(allowedA.astype(jnp.int32)) <= _WAVE_K)
            table, side = insert_rows(table, side, allowedA, lo, hi,
                                      base_arr, dec == 2)
            clen = jnp.where(allowedA, rec_len, clen)

            # phase B: zone recheck against the updated table, then zone
            # commits
            if rech_on:
                rc_mask = zone & committable
                dec, ts, te, na, q, h, m, ov = recheck_rows(
                    table, side, rc_mask, id_ceil,
                    (dec, ts, te, na, q, h, m, ov))
            dropf = dropf | (committable & (dec == 0))
            commitB = committable & zone & (dec > 0)
            actB = pending & ~dropf & ~allowedA
            rec_len, lo, hi = trim_geom(dec, ts, te)
            allowedB, firstB = horizon(commitB, actB, rec_len)
            if _WAVE_K:
                allowedB = allowedB & (
                    jnp.cumsum(allowedB.astype(jnp.int32)) <= _WAVE_K)
            table, side = insert_rows(table, side, allowedB, lo, hi,
                                      base_arr, dec == 2)
            clen = jnp.where(allowedB, rec_len, clen)
            allowed = allowedA | allowedB
            first_active = (allowedA & firstA) | (allowedB & firstB)
            # commits invalidate every LATER read: besides direct k-mer
            # shares (adjacency), Bloom slot collisions couple every pair
            # of reads through ~dozens of shared slots — a 1-2 vote shift
            # that the reference's MIN_IDS_IN_FLANK=2 trim heuristics are
            # sensitive to.  The id ceiling already hides commits from
            # EARLIER reads, so invalidation is one-directional and cheap.
            anyc = allowed.any()
            minord = jnp.min(jnp.where(allowed, order, B))
            touched = pending & anyc & (order > minord)
            stale = stale | touched
            rechecked = rechecked & ~touched

            # rotation fires only on a first-active escape commit whose
            # read-order committed count crosses the target (the horizon
            # blocks every other crossing commit)
            if silver:
                cumc = base0 + _cumsum64(jnp.where(in_path, clen, 0))
                fire = jnp.any(first_active & (cumc > target_eff))
                c_ord = jnp.where(
                    jnp.any(first_active),
                    jnp.min(jnp.where(first_active, order, B)),
                    jnp.int32(B))
                path_idx = jnp.where(fire, path_idx + 1, path_idx)
                overflow = fire & (max_paths < path_idx)
                done = jnp.where(overflow, jnp.int64(1), done)
                do_reset = fire & ~overflow
                table = jax.lax.cond(do_reset, reset_table,
                                     lambda t: t, table)
                side = jax.lax.cond(do_reset,
                                    lambda x: jnp.zeros_like(x),
                                    lambda x: x, side)
                rot_pos = jnp.where(fire, c_ord, rot_pos)
                stale = stale | do_reset          # reset invalidates all
                rechecked = rechecked & ~do_reset

            # 8. finalize rows; on a rotation, reopen every drop-finalized
            # read past the rotation point (committed reads past it cannot
            # exist — the horizon blocks them)
            fin = dropf | allowed
            pending = pending & ~fin & (done == 0)
            if silver:
                # any finalized DROP past the rotation point reopens,
                # including drops finalized this very round (clen > 0
                # identifies committed reads, which the horizon already
                # kept below the rotation point)
                reopen = (do_reset & (order > rot_pos)
                          & ~pending & (clen == 0))
                pending = pending | reopen

            if debug:
                trace = trace.at[
                    jnp.minimum(rnd, TRACE_N - 1).astype(jnp.int32)].set(
                    jnp.stack([pending.sum(), cand.sum(), confl.sum(),
                               allowed.sum()]).astype(jnp.int32))
            out = (table, side, pending, stale, rechecked, dec, ts, te,
                   na, q, h, m, ov, tmin, clen, path_idx, done, rot_pos,
                   rnd + 1, trace)
            if mesh is not None:
                out = tuple(
                    jax.lax.with_sharding_constraint(a, repl)
                    if a is not table and a is not side else a
                    for a in out)
            return out

        z32 = jnp.zeros((B,), jnp.int32)
        z64 = jnp.zeros((B,), jnp.int64)
        carry0 = (table0, side0,
                  jnp.broadcast_to(done0 == 0, (B,)),
                  jnp.ones((B,), bool),       # stale: classify everything
                  jnp.zeros((B,), bool),      # rechecked
                  z32, z32, z32, z32, z64, z64, z64, z64, z32,
                  z64,                        # committed_len
                  path_idx0, done0,
                  jnp.int32(-1),              # rot_pos
                  jnp.uint32(1),              # round counter
                  jnp.zeros((TRACE_N, 4), jnp.int32))
        fin = jax.lax.while_loop(round_cond, round_body, carry0)
        (table, side, _, _, _, dec_a, ts_a, te_a, na_a, q_a, h_a, m_a,
         ov_a, _, clen, path_idx, done, rot_pos, rnd_fin, trace) = fin
        if debug:
            # diagnostics: surface the round count through the ov column of
            # the last row
            ov_a = ov_a.at[B - 1].set(rnd_fin.astype(jnp.int64))

        in_path = order > rot_pos
        ins_bases = jnp.where(rot_pos < 0, ins_bases0, jnp.int64(0)) \
            + jnp.where(in_path, clen, 0).sum()
        # id counter = reservations consumed since the last rotation (see
        # the read-order reservation comment in step 7)
        ids_ins = jnp.where(rot_pos < 0, ids_ins0, jnp.int64(0)) \
            + jnp.where(in_path, maxb, 0).sum()
        scal = jnp.stack([ids_ins, ins_bases, path_idx, done])
        rows = jnp.stack(
            [dec_a.astype(jnp.int64), ts_a.astype(jnp.int64),
             te_a.astype(jnp.int64), na_a.astype(jnp.int64),
             q_a, h_a, m_a, ov_a], axis=1)
        # rows0 participates so the donated buffer aliases the output (the
        # all-aliased-outputs rule — engine._consume_for docstring)
        rows = rows0 * 0 + rows
        if compressed:
            out_filt = CompressedState(br, su, table, counts0)
        else:
            out_filt = dm.MibfState(words=table, counts=counts0)
        if debug:
            return out_filt, rows, scal, side, trace
        return out_filt, rows, scal, side

    return consume
