"""Test harness config: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere, so we set the env at conftest
import time (pytest imports conftest first).
"""

import os

# the axon sitecustomize sets JAX_PLATFORMS=axon at interpreter start;
# re-point to CPU before jax initializes (and belt-and-braces via
# jax.config below)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_DATASETS = "/root/reference/datasets"
