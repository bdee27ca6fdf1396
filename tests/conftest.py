"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding paths are exercised on a host-platform device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the multi-chip test
strategy in SURVEY.md §4.

Note: the environment's sitecustomize registers the TPU plugin at interpreter
startup, so JAX_PLATFORMS env vars are ineffective here — we must switch the
platform via jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--regen-goldens", action="store_true", default=False,
        help="rewrite tests/goldens/*.png from the current renderer output",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: takes >8s; excluded from smoke")
    config.addinivalue_line(
        "markers",
        "smoke: fast tier, `pytest -m smoke` ~10 min on the 1-core host "
        "(164 tests measured r3); full suite incl. slow ~30 min")


def pytest_collection_modifyitems(config, items):
    # Every test not explicitly marked slow belongs to the smoke tier.
    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.smoke)
