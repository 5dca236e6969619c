"""goldrush-tpu: TPU-native long-read de novo assembly framework.

A from-scratch JAX/XLA/Pallas implementation of the GoldRush golden-path
algorithm and its downstream pipeline stages.  64-bit integer support is
required for ntHash values, so x64 mode is enabled at import."""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
