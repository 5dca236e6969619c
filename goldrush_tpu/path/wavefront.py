"""Wavefront consume: batched rounds replace the per-read sequential scan.

The throughput-mode bottleneck of rounds 2-4 was the per-read consume scan
(engine.py `_consume_for`): each read paid a live single-read re-probe
(~1-2 ms) plus, for recruits, a per-recruit insert (~2.5 ms of rank gather +
scatter) — ~98% of the assign wall (BENCH_r04 submit_s 9.7 of assign_s 9.9).
This module implements the design costed in ARCHITECTURE.md:134-142 and
VERDICT r4 item 1: process each window of reads as a fixpoint of BATCHED
rounds in which classification is dense data-parallel work, inserts are
merged scatters over many recruits at once, and only true read-order
dependencies serialize.

Semantics target: the optimistic staleness class (cfg.recheck="optimistic" +
scatter-max insert) the engine already ships — the same nondeterminism class
the reference accepts across thread interleavings (MIBloomFilter.hpp:105-107)
— quality-gated at recruit-set Jaccard >= 0.90 vs the exact engine
(tools/calib_gate.py).  Exact mode keeps the bit-parity sequential scan.

Structure of one window (all inside ONE jitted executable — the backend
ships non-aliased results to the host per call once any fetch happened, so
rounds are device-side `lax.while_loop` state, never host round trips):

  precompute (once, batched, data-parallel over the mesh):
    * sampled probe grid (stride S, probed-seed prefix) and full-resolution
      insert grid for every read, mapped through the FROZEN rank structure
      (compressed mode) so rounds touch only the small id table;
  round (lax.while_loop until no read is pending):
    1. dense sampled classify of the window against the LIVE id table
       (pure gathers + the shared vote/smoothing pipeline);
    2. boundary-zone detection (identical rules to the engine's in-scan
       trim recheck);
    3. non-zone drops FINALIZE (a stale drop stays dropped — the
       optimistic policy);
    4. conflict test: candidates scatter an epoch-tagged order key over
       their probe grids into a scratch table and gather the min earlier
       order back — a candidate whose probe slots were touched by an
       EARLIER pending candidate's (proxy) insert set must wait a round,
       everything else may commit out of order (an earlier read's insert
       that shares no probed slot cannot change this read's votes);
    5. full-resolution trim recheck for boundary-zone committable reads
       (chunked compaction — only zone rows pay the full-res gathers);
    6. rotation horizon: a commit is allowed only while the PESSIMISTIC
       read-order base count (committed bases + full length of every
       unresolved earlier read) stays under the silver target, so no read
       at-or-beyond the true rotation point ever commits early; the first
       unresolved read is always allowed (progress + it IS the rotation
       read when the count crosses) — this keeps the device's rotation
       points bit-consistent with the host replay's read-order walk
       (goldrush_path.cpp:156-187 silver_path_check semantics);
    7. merged insert: committed reads' insert grids scatter block ids in
       chunks of many reads per scatter (the ~14 ns/elem small-table
       regime, tools/profile_prims.py), with block-id bases assigned in
       window order via a cumulative block count;
    8. finalize committed rows; pending shrinks (the first unresolved read
       always resolves, so the loop terminates in <= B rounds — typically
       a handful: conflicts are genomic overlaps that drop once their
       region's winner commits).

Matches the reference consume loop goldrush_path.cpp:983-1053 + 1229-1256
in behavior class; the reformulation (rounds + conflict wavefront) is the
TPU-native expression of its sequential recruit-then-probe dependency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mibf import mibf as dm
from ..mibf.compressed import (CompressedState, _rank_lookup,
                               _vote_from_words)
from ..mibf.mibf import PRESENT_BIT
from .classify import classify_batch
from .engine_util import tile_min_count

# rows per compacted chunk for the full-res recheck and merged insert: the
# chunk is the static shape unit of the dynamic-size commit/zone sets;
# partially-filled chunks waste at most (CHUNK-1) rows of gather traffic
RECHECK_CHUNK = 16
INSERT_CHUNK = 16
# direct-mode conflict scratch: slots hash into 2^24 buckets (64 MB) —
# collisions only cause spurious one-round waits; compressed mode uses the
# (already small) rank space directly
DIRECT_CONFLICT_BITS = 24

import os as _os                                            # noqa: E402
_SERIAL = bool(_os.environ.get("GOLDRUSH_WAVE_SERIAL"))


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
    mesh, repl = eng.mesh, eng._shard_repl

    def consume(filt, codes, lengths, full_lengths, scal0, rows0):
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

            def probe_words(table, ranks):
                # ranks [C, Hs, TFs]: sentinel -> absent (word 0)
                ws = []
                for s in range(ranks.shape[1]):
                    r = ranks[:, s, :]
                    w = jnp.where(r < sent, PRESENT_BIT | table[r], 0)
                    ws.append(w.astype(jnp.uint32))
                return ws

            # conflict grid: the seed-0 FULL-RESOLUTION ranks.  The scatter
            # side proxies a candidate's insert footprint (all positions of
            # seed 0 — the remaining seeds' slots are position-correlated),
            # the gather side covers everything a later candidate reads:
            # the sampled probe grid is a subset, and the full-res recheck's
            # seed-0 row detects any genomic overlap with both k-mer copies
            # intact (~100 shared slots per kb of overlap at 5% error) —
            # the stride-8 proxy caught only ~2/kb, which let same-round
            # commits go stale against the trim recheck's read set
            conf_q = jnp.where(rank_g[:, 0, :] < sent, rank_g[:, 0, :],
                               drop_idx)

            def insert_val(bid):
                return bid                      # ids table stores block id

            def reset_table(table):
                return jnp.zeros_like(table)
        else:
            sent = jnp.asarray(params.size, slots_q.dtype)
            rank_q = slots_q.astype(jnp.int32)
            rank_g = slots_i.astype(jnp.int32)
            table0 = filt.words
            drop_idx = jnp.int32(params.alloc)
            conf_size = 1 << DIRECT_CONFLICT_BITS

            def probe_words(table, slots):
                return [table[slots[:, s, :]]
                        for s in range(slots.shape[1])]

            mask24 = jnp.int32(conf_size - 1)
            conf_q = jnp.where(rank_g[:, 0, :] < params.size,
                               rank_g[:, 0, :] & mask24,
                               jnp.int32(conf_size))

            def insert_val(bid):
                return PRESENT_BIT | bid

            def reset_table(table):
                return table & PRESENT_BIT
        counts0 = filt.counts

        if mesh is not None:
            # grids were computed data-parallel; the round loop's gathers,
            # scatters and per-read bookkeeping read them replicated (the
            # conflict/commit machinery is window-global)
            rank_q_l, rank_g_l, ok_q_l, ok_i_l, conf_q_l = (
                jax.lax.with_sharding_constraint(a, repl)
                for a in (rank_q, rank_g, ok_q, ok_i, conf_q))
        else:
            rank_q_l, rank_g_l, ok_q_l, ok_i_l, conf_q_l = (
                rank_q, rank_g, ok_q, ok_i, conf_q)

        ids_ins0, ins_bases0, path_idx0, done0 = (scal0[0], scal0[1],
                                                  scal0[2], scal0[3])
        L64 = full_lengths.astype(jnp.int64)
        target_eff = jnp.int64(target if silver else (1 << 62))

        # ---------------- per-read compacted-chunk helpers
        def compact(mask):
            """positions buffer: pos[:n] = indices of set rows, in order."""
            cidx = jnp.cumsum(mask.astype(jnp.int32)) - 1
            pos = jnp.full((B,), B, jnp.int32).at[
                jnp.where(mask, cidx, B)].set(order, mode="drop")
            return pos, mask.sum().astype(jnp.int32)

        def recheck_rows(table, mask, dec, ts, te, na, q, h, m, ov):
            """Full-res classify for the masked rows, chunked; returns the
            8 per-read arrays with masked rows overridden."""
            pos, n = compact(mask)

            def cond(c):
                return c[0] * RECHECK_CHUNK < n

            def body(c):
                k, dec, ts, te, na, q, h, m, ov = c
                idx = jax.lax.dynamic_slice(pos, (k * RECHECK_CHUNK,),
                                            (RECHECK_CHUNK,))
                rowok = (k * RECHECK_CHUNK
                         + jnp.arange(RECHECK_CHUNK, dtype=jnp.int32)) < n
                idxc = jnp.where(rowok, idx, 0)
                rg = jnp.take(rank_g_l, idxc, axis=0)
                fo = jnp.take(ok_i_l, idxc, axis=0) & rowok[:, None]
                nt = jnp.take(n_tiles, idxc)
                ws = probe_words(table, rg)
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
                return (k + 1, dec, ts, te, na, q, h, m, ov)

            out = jax.lax.while_loop(
                cond, body, (jnp.int32(0), dec, ts, te, na, q, h, m, ov))
            return out[1:]

        def insert_rows(table, mask, lo, hi, base, trimmed):
            """Merged scatter-max insert of the masked rows' grids, chunked
            (many recruits per scatter — the write-combining that drops the
            per-recruit dispatch/rank overhead of the sequential scan)."""
            pos, n = compact(mask)
            t_of = (jnp.arange(TF_ins, dtype=jnp.int32)
                    // F_ins)                                  # [TF]

            def cond(c):
                return c[0] * INSERT_CHUNK < n

            def body(c):
                k, table = c
                idx = jax.lax.dynamic_slice(pos, (k * INSERT_CHUNK,),
                                            (INSERT_CHUNK,))
                rowok = (k * INSERT_CHUNK
                         + jnp.arange(INSERT_CHUNK, dtype=jnp.int32)) < n
                idxc = jnp.where(rowok, idx, 0)
                rg = jnp.take(rank_g_l, idxc, axis=0)   # [C, H, TF]
                lo_r = jnp.take(lo, idxc)
                hi_r = jnp.take(hi, idxc)
                ba_r = jnp.take(base, idxc)
                tr_r = jnp.take(trimmed, idxc)
                in_rng = ((t_of[None, :] >= lo_r[:, None])
                          & (t_of[None, :] <= hi_r[:, None])
                          & rowok[:, None])               # [C, TF]
                mm = jnp.where(in_rng, (t_of[None, :] - lo_r[:, None]) // bs,
                               0)
                bid = jnp.where(
                    tr_r[:, None],
                    ba_r[:, None] + ((mm * bs + 1) // bs).astype(jnp.uint32),
                    ba_r[:, None] + mm.astype(jnp.uint32))    # [C, TF]
                el_ok = in_rng[:, None, :] & (rg < (sent if compressed
                                                    else params.size))
                ix = jnp.where(el_ok, rg, drop_idx)
                vals = jnp.broadcast_to(insert_val(bid)[:, None, :],
                                        rg.shape)
                table = table.at[ix.reshape(-1)].max(
                    vals.reshape(-1).astype(jnp.uint32), mode="drop")
                return (k + 1, table)

            return jax.lax.while_loop(cond, body, (jnp.int32(0), table))[1]

        # ---------------- round loop
        def round_cond(carry):
            return jnp.any(carry[2])

        def round_body(carry):
            (table, scratch, pending, dec_a, ts_a, te_a, na_a, q_a, h_a,
             m_a, ov_a, clen, ids_ins, path_idx, done, rot_pos, rnd) = carry

            # 1. dense sampled classify against the live table
            ws = probe_words(table, rank_q_l)
            v = _vote_from_words(ws, ok_q_l, params, T, B, Hq,
                                 rank_q_l.shape[2])
            r0 = classify_batch(v.curr_id, v.top_count, v.cand_ids,
                                v.cand_counts, n_tiles, x_eff, u_min, a_max)
            tmin = tile_min_count(v.top_count, n_tiles)
            dec = r0.decision
            ts, te, na = r0.trim_start, r0.trim_end, r0.num_assigned
            q, h = v.queries, v.hits
            m = v.misses
            ov = v.overflow.sum(axis=1).astype(jnp.int64)

            # 2. boundary zone (identical rules to the in-scan recheck)
            if rech_on:
                weak = tmin * S < 2 * x_full
                stretch = te - ts - 1
                partial = (na > 0) & (na < n_tiles) & \
                    ((stretch >= 3) | (na <= a_max + 2))
                zone = (partial | (dec == 2)
                        | ((na >= n_tiles) & weak)) & pending
            else:
                zone = jnp.zeros((B,), bool)

            # 3. non-zone drops finalize; candidates enter the wavefront.
            # A drop may finalize ONLY when no silver rotation can fire at
            # any read before it (rotation resets the id table, and the
            # sequential engine classifies every later read against the
            # RESET filter — finalizing their drops early against the
            # pre-rotation table was measured at -0.45 recruit-set Jaccard
            # in round-5 bring-up): the pessimistic read-order base count
            # through the preceding reads must stay under the target
            in_path = order > rot_pos
            base0 = jnp.where(rot_pos < 0, ins_bases0, jnp.int64(0))
            dropf0 = pending & (dec == 0) & ~zone
            potc = clen + jnp.where(pending & ~dropf0, L64, 0)
            potc = jnp.where(in_path, potc, 0)
            pess_excl = base0 + jnp.cumsum(potc) - potc
            safe = pess_excl <= target_eff
            dropf = dropf0 & safe
            cand = pending & ((dec > 0) | zone)

            # 4. conflict test over the probe grids (epoch-tagged order
            # keys; stale rounds' entries are numerically smaller and
            # therefore ignored — no per-round scratch reinit)
            vkey = (rnd * jnp.uint32(B + 1)
                    + (jnp.uint32(B) - order.astype(jnp.uint32)))     # [B]
            cix = jnp.where(cand[:, None], conf_q_l,
                            jnp.int32(conf_size))
            scratch = scratch.at[cix.reshape(-1)].max(
                jnp.broadcast_to(vkey[:, None],
                                 cix.shape).reshape(-1), mode="drop")
            g = scratch[jnp.where(cix < conf_size, cix,
                                  jnp.int32(conf_size - 1))]
            g = jnp.where(cix < conf_size, g, 0)
            gmax = g.reshape(B, -1).max(axis=1)
            conflict = cand & (gmax > vkey)
            if _SERIAL:
                # diagnostic mode (GOLDRUSH_WAVE_SERIAL): only the first
                # candidate commits per round — isolates conflict-proxy
                # quality from the round mechanism
                conflict = cand & (jnp.cumsum(cand.astype(jnp.int32)) > 1)
            committable = cand & ~conflict

            # 5. full-res trim recheck, only for committable zone rows
            if rech_on:
                dec, ts, te, na, q, h, m, ov = recheck_rows(
                    table, zone & committable,
                    dec, ts, te, na, q, h, m, ov)
            # recheck-flipped drops obey the same rotation-safety guard
            dropf = dropf | (committable & (dec == 0) & safe)
            commit = committable & (dec > 0)

            # 6. rotation horizon (read-order pessimistic base count):
            # pess(j) >= the true read-order cumulative count through j as
            # long as any read <= j is unresolved, so no read at-or-beyond
            # the true crossing commits before the rotation; the first
            # unresolved read always may (it IS the crossing read then)
            act = pending & ~dropf
            n64 = n_tiles.astype(jnp.int64)
            ts64, te64 = ts.astype(jnp.int64), te.astype(jnp.int64)
            l_trim = jnp.where(te64 == n64 - 1, L64 - ts64 * TL,
                               (te64 - ts64 + 1) * TL)
            rec_len = jnp.where(dec == 1, L64,
                                jnp.where(dec == 2, l_trim, 0))
            pot = jnp.where(commit, rec_len, jnp.where(act, L64, 0))
            pess = base0 + jnp.cumsum(
                jnp.where(in_path, clen + pot, 0))
            first_active = act & (jnp.cumsum(act.astype(jnp.int32)) == 1)
            allowed = commit & ((pess <= target_eff) | first_active) \
                & (done == 0)

            # 7. block-id bases in window order + merged insert
            blocks = jnp.where(
                allowed,
                jnp.where(dec == 1, 1 + L64 // (TL * bs),
                          1 + (te64 - ts64) // bs),
                0)
            base_arr = (ids_ins + 1
                        + (jnp.cumsum(blocks) - blocks)).astype(jnp.uint32)
            lo = jnp.where(dec == 1, 0, ts64).astype(jnp.int32)
            hi = jnp.where(dec == 1, (n64 - 1), te64).astype(jnp.int32)
            table = insert_rows(table, allowed, lo, hi, base_arr, dec == 2)
            ids_ins = ids_ins + blocks.sum()
            clen = jnp.where(allowed, rec_len, clen)

            # rotation fires only on a first-active escape commit whose
            # read-order committed count crosses the target (see module
            # docstring: the horizon blocks every other crossing commit)
            cumc = base0 + jnp.cumsum(jnp.where(in_path, clen, 0))
            fire = silver and jnp.any(allowed & first_active
                                      & (cumc > target_eff))
            if silver:
                c_ord = jnp.where(
                    jnp.any(allowed & first_active),
                    jnp.min(jnp.where(allowed & first_active, order, B)),
                    jnp.int32(B))
                path_idx = jnp.where(fire, path_idx + 1, path_idx)
                overflow = fire & (max_paths < path_idx)
                done = jnp.where(overflow, jnp.int64(1), done)
                do_reset = fire & ~overflow
                table = jax.lax.cond(do_reset, reset_table,
                                     lambda t: t, table)
                rot_pos = jnp.where(fire, c_ord, rot_pos)
                ids_ins = jnp.where(do_reset, jnp.int64(0), ids_ins)

            # 8. finalize rows
            fin = dropf | allowed
            dec_a = jnp.where(fin, dec, dec_a)
            ts_a = jnp.where(fin, ts, ts_a)
            te_a = jnp.where(fin, te, te_a)
            na_a = jnp.where(fin, na, na_a)
            q_a = jnp.where(fin, q, q_a)
            h_a = jnp.where(fin, h, h_a)
            m_a = jnp.where(fin, m, m_a)
            ov_a = jnp.where(fin, ov, ov_a)
            pending = pending & ~fin & (done == 0)

            out = (table, scratch, pending, dec_a, ts_a, te_a, na_a, q_a,
                   h_a, m_a, ov_a, clen, ids_ins, path_idx, done, rot_pos,
                   rnd + 1)
            if mesh is not None:
                out = tuple(
                    jax.lax.with_sharding_constraint(a, repl)
                    if a is not table else a for a in out)
            return out

        z32 = jnp.zeros((B,), jnp.int32)
        z64 = jnp.zeros((B,), jnp.int64)
        carry0 = (table0,
                  jnp.zeros((conf_size + 1,), jnp.uint32),
                  jnp.broadcast_to(done0 == 0, (B,)),
                  z32, z32, z32, z32, z64, z64, z64, z64,
                  z64,                        # committed_len
                  ids_ins0, path_idx0, done0,
                  jnp.int32(-1),              # rot_pos
                  jnp.uint32(1))              # round (epoch) counter
        fin = jax.lax.while_loop(round_cond, round_body, carry0)
        (table, _, _, dec_a, ts_a, te_a, na_a, q_a, h_a, m_a, ov_a, clen,
         ids_ins, path_idx, done, rot_pos, _) = fin

        in_path = order > rot_pos
        ins_bases = jnp.where(rot_pos < 0, ins_bases0, jnp.int64(0)) \
            + jnp.where(in_path, clen, 0).sum()
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
        return out_filt, rows, scal

    return consume
