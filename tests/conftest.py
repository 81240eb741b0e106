"""Test configuration: force an 8-device virtual CPU platform.

This is the TPU-native analog of the reference's single-GPU degradation path
(SURVEY §4): every multi-device code path (mesh sharding, GSPMD collectives)
is exercised on 8 virtual CPU devices so the suite runs anywhere.

The environment's sitecustomize registers a tunneled TPU backend in every
python process (and imports jax while doing so), so the env-var route is too
late here — switch platforms through jax.config instead, before any backend
is initialized by test code.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
