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

# This environment force-registers the TPU platform and ignores
# JAX_PLATFORMS=cpu; pin the default device to the cpu backend so tests do
# not contend with bench/dev runs for the single TPU chip.
import jax  # noqa: E402

if any(d.platform != "cpu" for d in jax.devices()):
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
