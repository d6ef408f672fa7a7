"""Test bootstrap: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the multi-chip test strategy from SURVEY.md §4: sharding/collective
code paths are validated on a host-platform device mesh; the driver separately
dry-runs the multi-chip path, and benchmarks run on real TPU.
"""

import os

# The session env pins JAX_PLATFORMS to the real TPU; tests run on a virtual
# CPU mesh unless explicitly opted in to hardware (VIDEOGPA_TEST_TPU=1).
if os.environ.get("VIDEOGPA_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("VIDEOGPA_TEST_TPU") != "1":
    # The axon TPU plugin overrides JAX_PLATFORMS; the config knob wins.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
