"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (SURVEY.md §4): in-process fake host
environment + single-machine multi-shard tests.  Multi-device sharding is
exercised with XLA's forced host platform device count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: harness may preset e.g. axon
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {devs}"
    return devs
