"""LayerNorm in fp32 statistics.

Replaces the reference's invokeGeneralLayerNorm / fused residual variants
(/root/reference/src/fastertransformer/kernels/layernorm_kernels.cu). On TPU
these are plain VPU element-wise ops; XLA fuses them into adjacent matmuls, so
no Pallas kernel is needed — only the fp32-statistics discipline matters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def layernorm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * w.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(x.dtype)
