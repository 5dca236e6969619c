"""ntCard streaming distinct-k-mer (F0) estimator — the --ntcard path.

Behavior of the reference's vendored estimator (goldrush_path/ntcard.hpp:
81-154, 248-274): per spaced seed, hashes are sampled into two banks of
2^rBits uint16 counters — bank 0 takes hashes with the top (sBits+1) bits
equal to 1, bank 1 those whose top sBits bits equal sMask = 2^(sBits-1)-1 —
then F0 and the multiplicity spectrum come from the counter-value histogram
by the ntCard deconvolution (Mohamadi et al. 2017):

  F0 = (rBits*ln2 - ln p[0]) * 2^(sBits+rBits)

The hash universe for -g sizing is the sum of per-seed F0 estimates.
Counting runs on device: hashes -> sample masks -> scatter-add counters.

Defaults follow the reference: rBits=27, sBits=11 (7 when total input
< 50 GB), nSamp=2 (ntcard.hpp:31-41, :182-183).  rBits is configurable so
tests can run small.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..io import fastq
from ..ops.nthash import build_seed_family, hash_positions


@dataclass
class NtCardParams:
    rbits: int = 27
    sbits: int = 7           # reference uses 7 for inputs < 50 GB
    cov_max: int = 10000
    batch: int = 64


def _sample_and_count(counters: jax.Array, hashes: jax.Array,
                      valid: jax.Array, rbits: int, sbits: int) -> jax.Array:
    """counters: uint32 [2 * 2^rbits + 1] (last = discard); one seed's
    hashes [N]."""
    rbuck = 1 << rbits
    smask = (1 << (sbits - 1)) - 1
    top_s1 = hashes >> jnp.uint64(63 - sbits)
    top_s = hashes >> jnp.uint64(64 - sbits)
    ind = jnp.where(top_s1 == 1, 0, jnp.where(top_s == smask, 1, 2))
    slot = (hashes & jnp.uint64(rbuck - 1)).astype(jnp.int64)
    idx = jnp.where((ind < 2) & valid, ind.astype(jnp.int64) * rbuck + slot,
                    2 * rbuck)
    return counters.at[idx.reshape(-1)].add(jnp.uint32(1), mode="drop")


def _estimate_f0(counter: np.ndarray, rbits: int, sbits: int,
                 cov_max: int) -> tuple[float, np.ndarray]:
    """compEst (ntcard.hpp:114-154): counter histogram -> F0 + spectrum."""
    rbuck = 1 << rbits
    nsamp = 2
    cmax = 65536
    p = np.zeros((nsamp, cmax), dtype=np.float64)
    for i in range(nsamp):
        vals = np.minimum(counter[i * rbuck:(i + 1) * rbuck], cmax - 1)
        p[i] = np.bincount(vals.astype(np.int64), minlength=cmax)
    p_mean = p.mean(axis=0)
    if p_mean[0] <= 0:
        p_mean[0] = 1.0
    f0 = float(int((rbits * math.log(2) - math.log(p_mean[0]))
                   * (1 << (sbits + rbits))))
    f = np.zeros(cmax)
    denom = p_mean[0] * (math.log(p_mean[0]) - rbits * math.log(2))
    if denom != 0:
        f[1] = -1.0 * p_mean[1] / denom
        for i in range(2, min(cov_max + 2, cmax)):
            s = float(np.dot(np.arange(1, i), p_mean[i - 1:0:-1] * f[1:i]))
            f[i] = -1.0 * p_mean[i] / denom - s / (i * p_mean[0])
    spectrum = np.abs((f * f0).astype(np.int64))
    return f0, spectrum


def estimate_genome_size(input_path: str, seeds: list[str],
                         p: NtCardParams | None = None) -> int:
    """calc_ntcard_genome_size equivalent: sum of per-seed F0 estimates."""
    p = p or NtCardParams()
    rbuck = 1 << p.rbits
    fams = build_seed_family(seeds)
    counters = [jnp.zeros(2 * rbuck + 1, dtype=jnp.uint32)
                for _ in seeds]
    spans = [len(s) for s in seeds]
    for block in fastq.read_blocks(input_path, block_records=p.batch):
        L = max(max(len(r.seq) for r in block), max(spans) + 1)
        codes = np.zeros((len(block), L), dtype=np.uint8)
        lens = np.zeros(len(block), dtype=np.int64)
        for i, r in enumerate(block):
            c = fastq.encode(r.seq)
            c = np.where(c > 3, 0, c)
            codes[i, :len(c)] = c
            lens[i] = len(c)
        P = L - spans[0] + 1
        if P < 1:
            continue
        hashes = hash_positions(codes, fams, P)
        for s in range(len(seeds)):
            # lockstep iterator semantics: every frame up to P_0 counts for
            # every seed (stale tails repeat), matching stRead's loop
            n_s = np.maximum(lens - spans[0] + 1, 0)
            valid = jnp.asarray(np.arange(P)[None, :] < n_s[:, None])
            # clamp stale tail: positions beyond lens-spans[s]+1 repeat last
            ns_own = np.maximum(lens - spans[s] + 1, 1)
            idx = np.minimum(np.arange(P)[None, :], ns_own[:, None] - 1)
            hs = jnp.take_along_axis(hashes[:, s, :], jnp.asarray(idx),
                                     axis=1)
            counters[s] = _sample_and_count(counters[s], hs, valid,
                                            p.rbits, p.sbits)
    total = 0
    for s in range(len(seeds)):
        cnt = np.asarray(counters[s][:2 * rbuck])
        f0, _ = _estimate_f0(cnt, p.rbits, p.sbits, p.cov_max)
        total += int(f0)
    return total
