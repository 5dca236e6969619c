"""Test harness config: force JAX onto a virtual 8-device CPU mesh so sharding
tests run without TPU hardware (the driver separately dry-runs multichip)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"

# This environment force-registers the TPU platform (JAX_PLATFORMS env is
# ignored) and even initializing the TPU client contends with other processes
# for the tunnel.  The config route does work — pin tests to cpu before any
# backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
