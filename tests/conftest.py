"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding paths are exercised on spoofed CPU devices
(SURVEY.md §4 prescription); real-TPU benchmarking happens in bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The launch environment registers a TPU backend from sitecustomize before
# this conftest runs, so the env var alone is not enough — override the
# already-imported jax's platform config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
