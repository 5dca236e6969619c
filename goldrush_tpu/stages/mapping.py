"""Minimizer-anchor mapping: the TPU-native replacement for the reference's
external mappers (minimap2 map-ont at bin/goldrush:275-276, ntLink minimizer
mapping).  Device computes minimizers; anchors join by sorted-hash merge and
chain by diagonal voting — a minimap2-lite sufficient for molecule spans
(tigmint), polish targeting, and scaffolding joins.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io import fastq
from ..ops.minimizers import batch_minimizers

MAX_SEQ = (1 << 20) - 1   # position packing limit per sequence chunk


@dataclass
class MinimizerIndex:
    k: int
    w: int
    hashes: np.ndarray      # uint64 sorted
    tid: np.ndarray         # int32 target id per entry
    pos: np.ndarray         # int32 target position per entry
    lengths: np.ndarray     # int64 target lengths
    names: list


def _seq_minimizers(seqs: list[bytes], k: int, w: int, batch: int = 32):
    """Minimizers for arbitrary-length sequences (device-hashed, chunked to
    the position-packing limit)."""
    CH = MAX_SEQ - k - 1
    jobs = []           # (seq_idx, chunk_offset, codes)
    for i, s in enumerate(seqs):
        for off in range(0, max(len(s) - k + 1, 1), CH):
            jobs.append((i, off, fastq.encode(s[off:off + CH + k - 1])))
    out = [[] for _ in seqs]
    jobs.sort(key=lambda j: len(j[2]))
    b = 0
    while b < len(jobs):
        grp = jobs[b:b + batch]
        b += batch
        L = max(max(len(c) for _, _, c in grp), k + w)
        # pad to power-of-two length buckets and a fixed batch width: one
        # compiled executable per bucket instead of one per distinct max
        # length (each compile is seconds on a remote-tunnel TPU)
        L = 1 << max(10, (L - 1).bit_length())
        if len(grp) < batch:
            grp = grp + [(-1, 0, np.zeros(0, np.uint8))] * (batch - len(grp))
        codes = np.zeros((len(grp), L), dtype=np.uint8)
        lens = np.zeros(len(grp), dtype=np.int64)
        for j, (_, _, c) in enumerate(grp):
            cc = np.where(c > 3, 0, c)      # Ns hash as A; fine for anchors
            codes[j, :len(cc)] = cc
            lens[j] = len(cc)
        res = batch_minimizers(codes, lens, k, w)
        for (i, off, _), (pos, h) in zip(grp, res):
            if i >= 0 and len(pos):
                out[i].append((pos + off, h))
    final = []
    for chunks in out:
        if not chunks:
            final.append((np.zeros(0, np.int64), np.zeros(0, np.uint64)))
        else:
            p = np.concatenate([c[0] for c in chunks])
            h = np.concatenate([c[1] for c in chunks])
            final.append((p, h))
    return final


def build_index(seqs: list[bytes], names: list[str], k: int, w: int
                ) -> MinimizerIndex:
    mins = _seq_minimizers(seqs, k, w)
    tids, poss, hs = [], [], []
    for i, (p, h) in enumerate(mins):
        tids.append(np.full(len(p), i, dtype=np.int32))
        poss.append(p.astype(np.int32))
        hs.append(h)
    h = np.concatenate(hs) if hs else np.zeros(0, np.uint64)
    tid = np.concatenate(tids) if tids else np.zeros(0, np.int32)
    pos = np.concatenate(poss) if poss else np.zeros(0, np.int32)
    order = np.argsort(h, kind="stable")
    return MinimizerIndex(k=k, w=w, hashes=h[order], tid=tid[order],
                          pos=pos[order],
                          lengths=np.array([len(s) for s in seqs]),
                          names=list(names))


@dataclass
class Hit:
    tid: int
    strand: int             # +1 / -1
    q_start: int
    q_end: int
    t_start: int
    t_end: int
    n_anchors: int
    offset: int             # t = q + offset (fwd) / t = offset - q (rev)
    t_anchors: np.ndarray | None = None   # anchor target positions (sorted
    # ascending; populated when map_sequence(keep_anchors=True) — tigmint
    # molecule splitting needs the intra-hit gap structure)


def map_sequence(index: MinimizerIndex, q_pos: np.ndarray, q_hash: np.ndarray,
                 min_anchors: int = 4, diag_bin: int = 500,
                 max_hits: int = 8, keep_anchors: bool = False) -> list[Hit]:
    """Map one query's minimizer set against the index by diagonal voting."""
    if len(q_hash) == 0 or len(index.hashes) == 0:
        return []
    lo = np.searchsorted(index.hashes, q_hash, side="left")
    hi = np.searchsorted(index.hashes, q_hash, side="right")
    counts = hi - lo
    # skip ultra-repetitive minimizers
    keep = counts <= 64
    reps = np.repeat(np.arange(len(q_hash))[keep], counts[keep])
    if len(reps) == 0:
        return []
    flat = np.concatenate([np.arange(l, h) for l, h in
                           zip(lo[keep], hi[keep])])
    qp = q_pos[reps].astype(np.int64)
    tp = index.pos[flat].astype(np.int64)
    tid = index.tid[flat].astype(np.int64)
    # two strand hypotheses per anchor
    hits: list[Hit] = []
    for strand in (1, -1):
        diag = (qp - tp) if strand == 1 else (qp + tp)
        key = tid * (1 << 24) + (diag + (1 << 22)) // diag_bin
        uniq, inv, cnt = np.unique(key, return_inverse=True,
                                   return_counts=True)
        good = np.nonzero(cnt >= min_anchors)[0]
        order = good[np.argsort(-cnt[good])][:max_hits]
        for g in order:
            m = inv == g
            t = int(tid[m][0])
            qs, qe = int(qp[m].min()), int(qp[m].max()) + index.k
            ts, te = int(tp[m].min()), int(tp[m].max()) + index.k
            off = int(np.median(diag[m]))
            hits.append(Hit(tid=t, strand=strand, q_start=qs, q_end=qe,
                            t_start=ts, t_end=te, n_anchors=int(cnt[g]),
                            offset=off,
                            t_anchors=np.sort(tp[m]) if keep_anchors
                            else None))
    # merge hits of the same (target, strand) whose diagonals are within two
    # bins — one alignment's anchors straddling a bin boundary otherwise
    # shows up as several fragments
    hits.sort(key=lambda h: -h.n_anchors)
    merged: list[Hit] = []
    for h in hits:
        for m in merged:
            if m.tid == h.tid and m.strand == h.strand and \
                    abs(m.offset - h.offset) <= 2 * diag_bin:
                m.q_start = min(m.q_start, h.q_start)
                m.q_end = max(m.q_end, h.q_end)
                m.t_start = min(m.t_start, h.t_start)
                m.t_end = max(m.t_end, h.t_end)
                m.n_anchors += h.n_anchors
                if keep_anchors:
                    m.t_anchors = np.sort(
                        np.concatenate([m.t_anchors, h.t_anchors]))
                break
        else:
            merged.append(h)
    merged.sort(key=lambda h: -h.n_anchors)
    return merged


def map_reads(index: MinimizerIndex, reads: list[bytes], **kw) -> list[list[Hit]]:
    mins = _seq_minimizers(reads, index.k, index.w)
    return [map_sequence(index, p, h, **kw) for p, h in mins]
