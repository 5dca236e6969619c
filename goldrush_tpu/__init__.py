"""goldrush-tpu: TPU-native long-read de novo assembly framework.

A from-scratch JAX/XLA/Pallas implementation of the GoldRush golden-path
algorithm and its downstream pipeline stages.  64-bit integer support is
required for ntHash values, so x64 mode is enabled at import."""

import os

import jax

jax.config.update("jax_enable_x64", True)

# explicit platform override (e.g. GOLDRUSH_PLATFORM=cpu to keep a run off
# the TPU); honored via jax config because some environments pin
# JAX_PLATFORMS at the site level
_plat = os.environ.get("GOLDRUSH_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)

__version__ = "0.1.0"
