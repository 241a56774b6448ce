"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the survey's test plan (SURVEY.md §4): multi-chip behavior is
validated on host CPU devices via ``--xla_force_host_platform_device_count``;
real-TPU benchmarking happens separately in bench.py.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sandbox's sitecustomize pins JAX_PLATFORMS=axon (single tunneled TPU)
# before conftest runs; jax.config.update is the reliable override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


REFERENCE_DATASETS = "/root/reference/datasets/2D"


@pytest.fixture(scope="session")
def datasets_dir():
    return REFERENCE_DATASETS
