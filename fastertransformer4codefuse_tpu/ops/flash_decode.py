"""Pallas decode attention over the (optionally int8) KV cache.

The TPU replacement for the reference's fused masked multi-head attention
decode kernel (/root/reference/src/fastertransformer/kernels/
decoder_masked_multihead_attention.cu: one CTA per (batch, head) streaming the
cached keys with online softmax). Here one grid cell handles a block of heads
for one (layer, batch) pair; the layer is scalar-prefetched from the stacked
cache slabs (same trick as the stacked weight kernels), the int8 K/V tiles are
dequantized by per-vector scales that commute out of both contractions, and
the whole [S] extent is processed in one pass (S fits VMEM comfortably at
inference lengths; lengths-masked like the jnp reference).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(scalars_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *, sm_scale, S):
    # scalars: [1 + B] = [layer, positions...]; grid = (B, nH // HB)
    b = pl.program_id(0)
    pos = scalars_ref[1 + b]

    q = q_ref[0]  # [HB, dh]
    HB = q.shape[0]
    # Mosaic rejects batch dims in dot_general; unroll heads with 2D dots
    for h in range(HB):
        k = k_ref[0, 0, h]  # [S, dh]
        scores = jax.lax.dot_general(
            q[h][None, :], k.astype(q.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, S]
        scores = scores * ks_ref[0, 0, h][None, :].astype(jnp.float32) * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col <= pos, scores, MASK_VALUE)

        m = jnp.max(scores)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p)

        pv = (p * vs_ref[0, 0, h][None, :].astype(jnp.float32)).astype(q.dtype)
        v = v_ref[0, 0, h]  # [S, dh]
        out = jax.lax.dot_general(
            pv, v.astype(q.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, dh]
        o_ref[0, h] = (out[0] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "hb"))
def flash_decode_stacked(
    q: jax.Array,  # [B, nH, dh] bf16
    k_all: jax.Array,  # [L, B, nH, S, dh] int8 (or bf16 with unit scales)
    ks_all: jax.Array,  # [L, B, nH, S] scales
    v_all: jax.Array,
    vs_all: jax.Array,
    layer: jax.Array,  # scalar
    positions: jax.Array,  # [B] — newest-token slot per row (inclusive mask)
    sm_scale: float,
    hb: int = 8,  # heads per grid block
) -> jax.Array:
    B, nH, dh = q.shape
    L, B2, nH2, S, dh2 = k_all.shape
    assert (B, nH, dh) == (B2, nH2, dh2)
    while nH % hb:
        hb //= 2
    scalars = jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), positions.astype(jnp.int32)]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nH // hb),
        in_specs=[
            pl.BlockSpec((1, hb, dh), lambda b, h, s_ref: (b, h, 0)),
            pl.BlockSpec((1, 1, hb, S, dh), lambda b, h, s_ref: (s_ref[0], b, h, 0, 0)),
            pl.BlockSpec((1, 1, hb, S), lambda b, h, s_ref: (s_ref[0], b, h, 0)),
            pl.BlockSpec((1, 1, hb, S, dh), lambda b, h, s_ref: (s_ref[0], b, h, 0, 0)),
            pl.BlockSpec((1, 1, hb, S), lambda b, h, s_ref: (s_ref[0], b, h, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, dh), lambda b, h, s_ref: (b, h, 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nH, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(scalars, q, k_all, ks_all, v_all, vs_all)
