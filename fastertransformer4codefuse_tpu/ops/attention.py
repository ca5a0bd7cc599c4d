"""Reference (pure-XLA) attention paths: prefill and single-token decode.

These replace, respectively:
  - the reference's TRT fused flash MHA / unfused bmm+softmax prefill path
    (/root/reference/src/fastertransformer/layers/attention_layers/
     GptContextAttentionLayer.cc:195-310), and
  - the fused masked multi-head decode kernel
    (/root/reference/src/fastertransformer/kernels/
     decoder_masked_multihead_attention.cu).

They are the numerically-canonical implementations; the Pallas flash kernels in
``flash_prefill.py`` / ``flash_decode.py`` must match them. Softmax statistics
in fp32, scores masked with a large negative value (not -inf, to avoid NaN on
fully-masked rows).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# set by the engine: use the Pallas flash kernel for prefill when shapes allow
_FLASH_PREFILL = False


def set_flash_prefill(flag: bool) -> None:
    global _FLASH_PREFILL
    _FLASH_PREFILL = bool(flag)


def _flash_ok(S: int, dh: int) -> bool:
    # below ~2k the fused jnp path measures slightly faster on v5e (246 vs
    # 269ms at S=1024 on 13B) and the S^2 scores tile still fits; flash wins
    # on memory and bandwidth as S grows
    return S >= 2048 and S % 128 == 0 and dh in (64, 128, 256)


def prefill_attention_flash(
    q: jax.Array,  # [B, S, nH, dh]
    k: jax.Array,
    v: jax.Array,
    input_lengths: jax.Array,  # [B]
    sm_scale: float,
) -> jax.Array:
    """Pallas flash-attention prefill (jax.experimental.pallas.ops.tpu).

    The TPU replacement for the reference's TRT fused flash MHA cubins
    (3rdparty/trt_fused_multihead_attention/): causal + right-padding
    expressed as segment ids (pads get segment 2 and only attend each other —
    their outputs are never read)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    B, S, nH, dh = q.shape
    seg = jnp.where(
        jnp.arange(S)[None, :] < input_lengths[:, None], 1, 2
    ).astype(jnp.int32)
    out = flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=True,
        sm_scale=sm_scale,
        segment_ids=SegmentIds(seg, seg),
    )
    return out.transpose(0, 2, 1, 3)


def prefill_attention(
    q: jax.Array,  # [B, S, nH, dh]
    k: jax.Array,  # [B, S, nKV, dh] (nKV < nH under GQA)
    v: jax.Array,  # [B, S, nKV, dh]
    mask: jax.Array,  # [B, S, S] bool, True = may attend (causal & padding)
    sm_scale: float,
    input_lengths=None,  # enables the flash path when set and shapes allow
) -> jax.Array:
    B, S, nH, dh = q.shape
    nKV = k.shape[2]
    if (
        _FLASH_PREFILL
        and input_lengths is not None
        and nKV == nH
        and _flash_ok(S, dh)
    ):
        return prefill_attention_flash(q, k, v, input_lengths, sm_scale)
    if nKV != nH:
        # GQA: group the g query heads sharing each KV head — the KV tensors
        # are contracted per group WITHOUT materializing a repeated copy
        g = nH // nKV
        qg = q.reshape(B, S, nKV, g, dh)
        scores = jnp.einsum(
            "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
        )
        scores = scores * sm_scale
        scores = jnp.where(mask[:, None, None, :, :], scores, MASK_VALUE)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(B, S, nH, dh).astype(q.dtype)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * sm_scale
    scores = jnp.where(mask[:, None, :, :], scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def decode_attention(
    q: jax.Array,  # [B, nH, dh] — one new token per sequence
    k_cache: jax.Array,  # [B, nH, S, dh]
    v_cache: jax.Array,  # [B, nH, S, dh]
    valid: jax.Array,  # [B, S] bool, True = cache slot participates
    sm_scale: float,
) -> jax.Array:
    scores = jnp.einsum(
        "bhd,bhsd->bhs", q, k_cache, preferred_element_type=jnp.float32
    )
    scores = scores * sm_scale
    scores = jnp.where(valid[:, None, :], scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhs,bhsd->bhd", probs.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def make_prefill_mask(input_lengths: jax.Array, seq_len: int) -> jax.Array:
    """Causal & right-padding mask, the analog of invokeBuildDecoderAttentionMask
    (/root/reference/src/fastertransformer/kernels/gpt_kernels.cu).

    Token i may attend token j iff j <= i and j < input_length.
    Returns [B, S, S] bool.
    """
    pos = jnp.arange(seq_len)
    causal = pos[None, :, None] >= pos[None, None, :]  # [1, S, S]
    in_len = pos[None, None, :] < input_lengths[:, None, None]  # [B, 1, S]
    return jnp.logical_and(causal, in_len)


def make_decode_valid(positions: jax.Array, cache_len: int) -> jax.Array:
    """Valid-slot mask for decode: slot j participates iff j <= position[b].

    Unlike the reference, which right-pads ragged batches and carries dead cache
    slots masked via ``masked_tokens`` (GptNeoX.cc decode loop), this engine
    packs each sequence contiguously (new token b goes to slot positions[b]), so
    validity is a single comparison. Returns [B, cache_len] bool; the new
    token's own slot is valid because its K/V are written before attention.
    """
    pos = jnp.arange(cache_len)[None, :]
    return pos <= positions[:, None]
