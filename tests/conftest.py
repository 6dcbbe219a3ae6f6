"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's config-sweep strategy (ci/blackbox.sh topology flags,
ci/regression.sh.in graphics() --clusters=2 --cores=2): we simulate multi-chip
TPU topology with XLA's host-platform device partitioning so sharding tests
run without TPU hardware.

The container's sitecustomize pins JAX_PLATFORMS=axon (the real-TPU tunnel),
so the platform must be overridden through jax.config before first backend
use; set SKYBOX_TEST_PLATFORM=axon to run the suite against the real chip.
"""
import os

platform = os.environ.get("SKYBOX_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if platform == "cpu" and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", platform)
