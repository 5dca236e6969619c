"""Feasibility probes for the Pallas consume-sweep kernel.

Answers, on the real chip:
  1. does an in-kernel VMEM dynamic gather (table[idx_vector]) compile, and
     how fast is it?
  2. do in-kernel cumsum/cummax over VMEM blocks compile, and how fast?
  3. a fused toy sweep: blockwise gather + prefix + elementwise at chunk
     scale (6.1M entries) vs the XLA equivalents.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import goldrush_tpu  # noqa
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 6_144_000           # entries per chunk
BLK = 64 * 1024         # entries per grid step
TAB = 1 << 20           # VMEM window slots (4 MB u32)

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, TAB, N, dtype=np.int32))
table = jnp.asarray(rng.integers(0, 1 << 30, TAB, dtype=np.uint32))
vals = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.uint32))


@jax.jit
def _sc(x):
    return x.astype(jnp.float32).sum()


def t(name, fn, *args, n=6):
    try:
        out = fn(*args)
        float(_sc(out))
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(_sc(out))
    print(f"{name:44s} {(time.time()-t0)/n*1000:9.2f} ms")


# ---- 1. VMEM dynamic gather ------------------------------------------------
def gather_kernel(tab_ref, idx_ref, out_ref):
    i = idx_ref[:]
    out_ref[:] = tab_ref[i]


@jax.jit
def pallas_gather(table, idx):
    grid = N // BLK
    return pl.pallas_call(
        gather_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TAB,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
    )(table, idx)


# ---- 2. in-kernel prefix ops ------------------------------------------------
def prefix_kernel(x_ref, out_ref):
    out_ref[:] = jnp.cumsum(x_ref[:])


@jax.jit
def pallas_cumsum_blocks(vals):
    grid = N // BLK
    return pl.pallas_call(
        prefix_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((BLK,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
    )(vals)


def cummax_kernel(x_ref, out_ref):
    out_ref[:] = jax.lax.cummax(x_ref[:])


@jax.jit
def pallas_cummax_blocks(vals):
    grid = N // BLK
    return pl.pallas_call(
        cummax_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((BLK,), lambda i: (i,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
    )(vals)


# ---- 3. fused toy sweep: gather + block cumsum + elementwise ---------------
def sweep_kernel(tab_ref, idx_ref, val_ref, carry_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = jnp.uint32(0)

    g = tab_ref[idx_ref[:]]
    s = jnp.cumsum(val_ref[:] & jnp.uint32(1)) + carry_ref[0]
    out_ref[:] = g + s
    carry_ref[0] = s[-1]


@jax.jit
def pallas_sweep(table, idx, vals):
    grid = N // BLK
    return pl.pallas_call(
        sweep_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TAB,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.uint32)],
    )(table, idx, vals)


# XLA equivalents for comparison
t("XLA gather 6.1M from 4MB", jax.jit(lambda tb, i: tb[i]), table, idx)
t("XLA cumsum 6.1M u32", jax.jit(lambda v: jnp.cumsum(v)), vals)
t("XLA cummax 6.1M u32", jax.jit(lambda v: jax.lax.cummax(v)), vals)
t("pallas VMEM gather 6.1M from 4MB", pallas_gather, table, idx)
t("pallas block cumsum 6.1M", pallas_cumsum_blocks, vals)
t("pallas block cummax 6.1M", pallas_cummax_blocks, vals)
t("pallas fused sweep (gather+cumsum+add)", pallas_sweep, table, idx, vals)
