"""NeoX-style rotary position embedding.

The reference applies rotary inside invokeAddFusedQKVBiasTranspose (prefill,
/root/reference/src/fastertransformer/kernels/unfused_attention_kernels.cu) and
inside the fused masked-MHA decode kernel
(kernels/decoder_masked_multihead_attention_utils.h), NeoX style: the first
``rotary_dim`` features of each head are split in half and rotated pairwise
(x[i], x[i + rotary_dim/2]); features past rotary_dim pass through.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def make_rotary_tables(max_seq_len: int, rotary_dim: int, base: float = 10000.0):
    """Precompute cos/sin tables ``[max_seq_len, rotary_dim // 2]`` in fp32."""
    half = rotary_dim // 2
    freq = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    pos = jnp.arange(max_seq_len, dtype=jnp.float32)
    angles = jnp.outer(pos, freq)  # [S, half]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rotary(
    x: jax.Array,  # [..., seq, n_heads, head_dim] or [..., n_heads, head_dim]
    cos: jax.Array,  # [seq, rotary_dim//2] (already gathered at positions)
    sin: jax.Array,
    rotary_dim: int,
    style: str = "neox",
) -> jax.Array:
    """Rotate the first ``rotary_dim`` features of each head.

    style="neox": half-split pairs (i, i+rot/2) — GPT-NeoX / the reference's
    neox_rotary_style. style="gptj": interleaved pairs (2i, 2i+1) —
    rotate_every_two, used by GPT-J (the reference's gptj model family).

    ``cos``/``sin`` must broadcast against ``x[..., :half]`` after inserting the
    head axis: for x ``[B, S, nH, dh]`` pass cos ``[S, half]`` (broadcast as
    ``[1, S, 1, half]``).
    """
    if rotary_dim == 0:
        return x
    half = rotary_dim // 2
    x_rot = x[..., :rotary_dim].astype(jnp.float32)
    x_pass = x[..., rotary_dim:]
    c = jnp.expand_dims(cos, -2)
    s = jnp.expand_dims(sin, -2)
    if style == "gptj":
        pairs = x_rot.reshape(x_rot.shape[:-1] + (half, 2))
        x1 = pairs[..., 0]
        x2 = pairs[..., 1]
        r1 = x1 * c - x2 * s
        r2 = x2 * c + x1 * s
        rotated = jnp.stack([r1, r2], axis=-1).reshape(x_rot.shape).astype(x.dtype)
    else:
        x1 = x_rot[..., :half]
        x2 = x_rot[..., half:]
        r1 = x1 * c - x2 * s
        r2 = x2 * c + x1 * s
        rotated = jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)
    if rotary_dim == x.shape[-1]:
        return rotated
    return jnp.concatenate([rotated, x_pass], axis=-1)
