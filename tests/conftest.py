"""Test env: force an 8-device CPU mesh so distributed logic runs everywhere
(the reference has no single-process multi-rank story at all — SURVEY §4)."""
import os

# the axon sitecustomize pins JAX_PLATFORMS=axon (single real TPU chip);
# tests want a deterministic 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# XLA CPU's default matmul precision downcasts fp32 GEMMs (oneDNN "ANY"),
# which breaks golden-value comparisons; force true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")
