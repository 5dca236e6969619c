"""goldrush-tpu: TPU-native long-read de novo assembly framework.

A from-scratch JAX/XLA/Pallas implementation of the GoldRush golden-path
algorithm and its downstream pipeline stages.  64-bit integer support is
required for ntHash values, so x64 mode is enabled at import."""

import os

import jax

jax.config.update("jax_enable_x64", True)

# explicit platform override (e.g. GOLDRUSH_PLATFORM=cpu to keep a run off
# the TPU); honored via jax config because some environments force-register
# an accelerator plugin and ignore the JAX_PLATFORMS env var — which is why
# JAX_PLATFORMS is ALSO re-applied through the config route here (the
# multichip dry run sets it and expects every engine run on the virtual
# CPU mesh, single-device anchors included)
_plat = os.environ.get("GOLDRUSH_PLATFORM") or os.environ.get(
    "JAX_PLATFORMS")
if _plat:
    jax.config.update("jax_platforms", _plat)

# persistent XLA compilation cache: the engine compiles one executable per
# (batch, tile-bucket) shape; caching them on disk makes pipeline reruns and
# the silver->golden double invocation start hot (set
# GOLDRUSH_CACHE_DIR="" to disable)
_cache = os.environ.get("GOLDRUSH_CACHE_DIR",
                        os.path.expanduser("~/.cache/goldrush_tpu/xla"))
if _cache:
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

__version__ = "0.1.0"
