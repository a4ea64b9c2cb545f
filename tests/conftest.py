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
