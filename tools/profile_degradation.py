"""Pin down the axon-backend degradation: what triggers it, what restores it.

Sequence: time a big-carry scan (fast baseline) -> perform ONE d2h fetch of
an unrelated small array -> re-time -> fetch the CARRY itself -> re-time ->
try restoration (device_put fresh arrays, new executable).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import goldrush_tpu  # noqa
import jax
import jax.numpy as jnp

SIZE = 142_400_000
ALLOC = SIZE + 64
N = 96_000
B = 16

rng = np.random.default_rng(0)
slots_b = jnp.asarray(
    np.sort(rng.integers(0, SIZE, (B, N), dtype=np.int64), axis=1),
    dtype=jnp.int32)
recruit = jnp.asarray(rng.random(B) < 0.55)


def step(carry, xs):
    words, counts = carry
    s, rec = xs

    def ins(wc):
        w, c = wc
        c = c.at[s].add(jnp.uint32(1), mode="drop")
        post = c[s]
        w = w.at[s].add(post ^ jnp.uint32(3), mode="drop")
        return w, c

    carry = jax.lax.cond(rec, ins, lambda wc: wc, (words, counts))
    return carry, jnp.uint32(0)


def scan(carry, slots, rec):
    return jax.lax.scan(step, carry, (slots, rec))


fn = jax.jit(scan, donate_argnums=(0,))


def timeit(tag, carry, n=5):
    out = fn(carry, slots_b, recruit)
    jax.block_until_ready(out[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(out[0], slots_b, recruit)
    jax.block_until_ready(out[0])
    print(f"{tag:52s} {(time.time()-t0)/n*1000:9.2f} ms/call")
    return out[0]


carry = (jnp.zeros(ALLOC, dtype=jnp.uint32),
         jnp.zeros(ALLOC, dtype=jnp.uint32))
carry = timeit("baseline (no prior d2h)", carry)

# trigger 1: fetch a SMALL unrelated device array
small = jnp.arange(1024, dtype=jnp.uint32) * 3
_ = np.asarray(small)
carry = timeit("after d2h of small unrelated array", carry)

# trigger 2: fetch a tiny slice of the carry itself
_ = np.asarray(carry[0][:8])
carry = timeit("after d2h of carry[:8] slice", carry)

# trigger 3: fetch scan ys output (small)
out = fn(carry, slots_b, recruit)
_ = np.asarray(out[1])
carry = out[0]
carry = timeit("after d2h of scan ys (small output)", carry)

# restoration A: fresh device arrays
carry2 = (jnp.zeros(ALLOC, dtype=jnp.uint32),
          jnp.zeros(ALLOC, dtype=jnp.uint32))
carry2 = timeit("fresh zeros arrays (same executable)", carry2)

# restoration B: device_put of host data
w = jax.device_put(np.zeros(ALLOC, dtype=np.uint32))
c = jax.device_put(np.zeros(ALLOC, dtype=np.uint32))
carry3 = timeit("device_put'd arrays (same executable)", (w, c))

# restoration C: new executable
fn2 = jax.jit(scan, donate_argnums=(0,))
fn = fn2
carry4 = (jnp.zeros(ALLOC, dtype=jnp.uint32),
          jnp.zeros(ALLOC, dtype=jnp.uint32))
carry4 = timeit("new jit + fresh arrays", carry4)
