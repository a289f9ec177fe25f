"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run without TPU hardware (the JAX idiom from SURVEY.md section 4).

The container's sitecustomize registers the axon TPU backend and pins
``jax_platforms`` before pytest starts, so the env-var route is not enough —
we override the config value directly (backends initialize lazily, so this is
safe as long as it happens before the first ``jax.devices()`` call).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    # two-tier suite (round-3 verdict item 7): heavyweight parity/engine
    # files are marked slow; the default CI tier is `pytest -m "not slow"`
    # (< 5 min on a 1-core host), the full tier drops the filter.
    config.addinivalue_line(
        "markers", "slow: heavyweight parity/engine test (full tier only)"
    )
