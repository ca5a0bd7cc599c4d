"""Test env: force an 8-device CPU mesh so distributed logic runs everywhere
(the reference has no single-process multi-rank story at all — SURVEY §4).

Note: the axon sitecustomize imports jax at interpreter start and pins
JAX_PLATFORMS=axon (the single real TPU chip), so plain env vars are too late —
the backend choice must be overridden through jax.config before first backend
initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; this is a no-op)

jax.config.update("jax_platforms", "cpu")

# XLA's default matmul precision downcasts fp32 GEMMs (bf16 MXU passes on TPU,
# oneDNN "ANY" on CPU), which breaks golden-value comparisons; force true fp32.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU; got " + jax.default_backend()
    )
    assert len(jax.devices()) == 8, "expected 8 forced host devices"
