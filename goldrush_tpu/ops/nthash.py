"""JAX spaced-seed ntHash kernels (device-side, position-parallel).

The reference computes hashes with a sequential rolling iterator per seed
(multiLensfrHashIterator.hpp + btllib SeedNtHash, driven by a 6-thread host
producer pool, read_hashing.cpp:78-117).  A rolling recurrence is the wrong
shape for a TPU; instead we use an algebraic identity that makes every
position independent:

  fwd(p) = XOR_{j in care} rol64(TAB[s[p+j]], span-1-j)
         = rol64( XOR_{j in care} ror64(TAB[s[p+j]], (p+j) mod 64),
                  (span-1+p) mod 64 )

i.e. per-base values U[i] = ror64(TAB[s[i]], i mod 64) are position-local
(one small-table gather per base), the inner XOR is a spaced correlation
computed from statically-shifted slices, and the per-position rotation is a
single vectorized rotate.  The reverse-strand hash factors the same way with
U'[i] = rol64(TABC[s[i]], i mod 64) and rotation (-p) mod 64.  The
multi-length seed family (left + i*'0' + right) lets all seeds share the two
half-correlations: V_s[p] = VL[p] ^ VR[p + half + s].

Output parity is tested against the NumPy oracle (ops/nthash_np.py), which in
turn mirrors the reference iterator semantics.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .nthash_np import NT_TAB, NT_TABC


def _ror64_np(x: np.ndarray, r: int) -> np.ndarray:
    r %= 64
    if r == 0:
        return x.astype(np.uint64)
    with np.errstate(over="ignore"):
        return ((x >> np.uint64(r)) | (x << np.uint64(64 - r))).astype(np.uint64)


def _rol64_np(x: np.ndarray, r: int) -> np.ndarray:
    return _ror64_np(x, (64 - r) % 64)


@dataclasses.dataclass(frozen=True)
class SeedFamily:
    """Precomputed device tables for one multi-length seed family."""

    seeds: tuple[str, ...]
    half: int                      # length of the shared left half
    spans: tuple[int, ...]         # span of each seed (k, k+1, ..)
    care_left: tuple[int, ...]     # care offsets within the left half
    care_right: tuple[int, ...]    # care offsets relative to right-half start
    # device tables are derived from `seeds`; excluded from eq/hash so the
    # dataclass stays usable as a jit static argument
    rot_f: jax.Array = dataclasses.field(repr=False, compare=False)
    rot_r: jax.Array = dataclasses.field(repr=False, compare=False)

    @property
    def h(self) -> int:
        return len(self.seeds)

    @property
    def k(self) -> int:
        return self.spans[0]

    @property
    def pad_needed(self) -> int:
        """Extra positions beyond P frames that the correlations read."""
        mx = max(self.care_right, default=0)
        return self.half + (self.h - 1) + mx + 1


def build_seed_family(seeds: list[str]) -> SeedFamily:
    left = seeds[0][: len(seeds[0]) // 2]
    right = seeds[0][len(left):]
    for i, s in enumerate(seeds):
        assert s == left + "0" * i + right, (
            "seed list is not a left+zeros+right family from make_seed_pattern")
    care_left = tuple(j for j, c in enumerate(left) if c == "1")
    care_right = tuple(j for j, c in enumerate(right) if c == "1")
    rot_f = np.zeros((64, 4), dtype=np.uint64)
    rot_r = np.zeros((64, 4), dtype=np.uint64)
    for r in range(64):
        rot_f[r] = _ror64_np(NT_TAB, r)
        rot_r[r] = _rol64_np(NT_TABC, r)
    return SeedFamily(
        seeds=tuple(seeds),
        half=len(left),
        spans=tuple(len(s) for s in seeds),
        care_left=care_left,
        care_right=care_right,
        rot_f=jnp.asarray(rot_f.reshape(-1)),
        rot_r=jnp.asarray(rot_r.reshape(-1)),
    )


def _rol64_var(x: jax.Array, r: jax.Array) -> jax.Array:
    """Vectorized uint64 rotate-left by per-element amounts in [0, 64)."""
    r = r.astype(jnp.uint64)
    shifted = (x << r) | (x >> (jnp.uint64(64) - r))
    return jnp.where(r == 0, x, shifted)


@partial(jax.jit, static_argnames=("fam", "num_frames"))
def hash_positions(codes: jax.Array, fam: SeedFamily, num_frames: int
                   ) -> jax.Array:
    """Canonical hashes for every position of a padded batch of sequences.

    codes: uint8/int32 [B, L] base codes 0..3 (padding may be any value in
    0..3; caller masks invalid frames).  Returns uint64 [B, h, num_frames]
    where entry [b, s, p] is the canonical spaced-seed hash of
    codes[b, p : p+span_s].  Frames past a read's valid range contain garbage
    the caller must mask/clamp (see mibf.query).
    """
    B, L = codes.shape
    need = num_frames + fam.pad_needed
    if L < need:
        codes = jnp.pad(codes, ((0, 0), (0, need - L)))
        L = need
    codes = codes.astype(jnp.int32)
    pos = jnp.arange(L, dtype=jnp.int32)
    flat_idx = ((pos % 64) << 2)[None, :] + codes
    u_f = fam.rot_f[flat_idx]        # [B, L] uint64
    u_r = fam.rot_r[flat_idx]

    def corr(u, offsets, width):
        acc = jnp.zeros((B, width), dtype=jnp.uint64)
        for c in offsets:
            acc = acc ^ jax.lax.dynamic_slice_in_dim(u, c, width, axis=1)
        return acc

    P = num_frames
    span_extra = fam.half + (fam.h - 1)   # widest right-half start offset
    vl = corr(u_f, fam.care_left, P)
    vr = corr(u_f, fam.care_right, P + span_extra)
    wl = corr(u_r, fam.care_left, P)
    wr = corr(u_r, fam.care_right, P + span_extra)

    p_idx = jnp.arange(P, dtype=jnp.int32)
    outs = []
    for s in range(fam.h):
        off = fam.half + s
        v = vl ^ jax.lax.dynamic_slice_in_dim(vr, off, P, axis=1)
        w = wl ^ jax.lax.dynamic_slice_in_dim(wr, off, P, axis=1)
        fwd = _rol64_var(v, (fam.spans[s] - 1 + p_idx) % 64)
        rev = _rol64_var(w, (64 - p_idx % 64) % 64)
        outs.append(jnp.minimum(fwd, rev))
    return jnp.stack(outs, axis=1)    # [B, h, P]
