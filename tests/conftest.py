"""Test config: run everything on a virtual 8-device CPU mesh.

Gotcha: the harness pre-imports jax via /root/.axon_site/sitecustomize.py with
JAX_PLATFORMS=axon (tunneled TPU), so env vars set here are too late — we must
use jax.config.update BEFORE any backend is initialized. XLA_FLAGS is still
read at backend-init time, so setting it here works.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses

import jax  # noqa: E402 (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got " + jax.devices()[0].platform
)
assert jax.device_count() >= 8, "expected 8 virtual CPU devices"


# ---------------------------------------------------------------- test tiers
# Default tier: every test not marked `slow` (target: minutes, CI-friendly).
# Full tier: `pytest --runslow` additionally runs the >20s convergence /
# interpret-mode-gradient tests. Documented in README (testing section).
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (>20s: convergence runs, "
             "interpret-mode Pallas gradient checks)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test, excluded from the default tier"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier — pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
