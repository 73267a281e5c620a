"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths (parallel/) are exercised without TPU hardware,
and keep compile times low for the unit tests."""

import os

# The TPU-VM image preloads jax at interpreter startup (sitecustomize) with
# JAX_PLATFORMS pointing at the hardware, so plain env-var assignment here is
# too late for the platform choice — but the backend itself is not yet
# initialized, so jax.config.update still wins.  XLA_FLAGS is read at backend
# init, so setting it here still takes effect.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False, help="run slow tests"
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: mark test as slow to run")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="need --runslow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
