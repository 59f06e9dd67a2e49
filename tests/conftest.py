"""Test configuration: force an 8-device CPU mesh so sharding/collective
code paths are exercised without TPU hardware (the reference has no
multi-device tests at all — SURVEY.md §4).

NOTE: this environment may pre-import jax at interpreter startup with
JAX_PLATFORMS=axon (real TPU via sitecustomize), so plain env vars are
already baked — jax.config.update is the reliable override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def tmp_cache(tmp_path):
    """Point the global env cache at a throwaway 'fake_cache' directory."""
    from brainmagick_tpu.env import env

    cache = tmp_path / "fake_cache"
    cache.mkdir()
    with env.temporary(cache=cache):
        yield cache
