"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
logic (mesh/pjit/shard_map) is exercised without TPU hardware.

Note: this image's sitecustomize registers the axon TPU PJRT plugin at
interpreter start and pins JAX_PLATFORMS=axon, so env vars set here are too
late — we must override through jax.config before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat suite runs skip the big XLA compiles
# (ENet/LNet/DNet graphs dominate wall time). First run populates it.
from s2v_tpu.utils.jitcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

assert jax.devices()[0].platform == "cpu", jax.devices()
