"""KV cache: dense preallocated slabs, bf16 or int8-quantized.

The analog of the reference's key_cache_/value_cache_ buffers
(/root/reference/src/fastertransformer/models/gptneox/GptNeoX.cc:84-156,
including its x16-byte vectorized K layout, GptNeoX.cc:551-561 — on TPU the
layout question reduces to keeping [S, dh] contiguous per (batch, head)).

INT8 mode stores one symmetric scale per cached vector (per layer, batch,
head, position), halving the HBM traffic of decode attention — the analog of
BitDecoding/KV-quant practice; the reference has no KV quantization at all.

Cache pytree per layer: {"k": [B,nH,S,dh], "v": ...} plus {"k_s": [B,nH,S],
"v_s": ...} when quantized. Stacked over layers for lax.scan.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.config import GptNeoXConfig

Cache = Dict[str, jax.Array]


def init_cache(
    config: GptNeoXConfig, batch: int, max_seq_len: int, dtype=jnp.bfloat16
) -> Cache:
    shape = (
        config.layer_num,
        batch,
        config.head_num,
        max_seq_len,
        config.size_per_head,
    )
    if dtype == jnp.int8:
        c = {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_s": jnp.zeros(shape[:-1], jnp.bfloat16),
            "v_s": jnp.zeros(shape[:-1], jnp.bfloat16),
        }
    else:
        c = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    return c


def quantized(cache_l: Cache) -> bool:
    return "k_s" in cache_l


def _quantize_vec(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-vector symmetric int8 over the last (dh) axis.
    x [..., dh] -> (q [..., dh] int8, scale [...])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(xf / scale[..., None]).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def write_prefill(cache_l: Cache, k: jax.Array, v: jax.Array) -> Cache:
    """Write positions [0, S) (k, v: [B, S, nH, dh], cache [B, nH, Smax, dh])."""
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = dict(cache_l)
    if quantized(cache_l):
        kq, ks = _quantize_vec(kt)
        vq, vs = _quantize_vec(vt)
        out["k"] = jax.lax.dynamic_update_slice(cache_l["k"], kq, (0, 0, 0, 0))
        out["v"] = jax.lax.dynamic_update_slice(cache_l["v"], vq, (0, 0, 0, 0))
        out["k_s"] = jax.lax.dynamic_update_slice(cache_l["k_s"], ks, (0, 0, 0))
        out["v_s"] = jax.lax.dynamic_update_slice(cache_l["v_s"], vs, (0, 0, 0))
    else:
        out["k"] = jax.lax.dynamic_update_slice(
            cache_l["k"], kt.astype(cache_l["k"].dtype), (0, 0, 0, 0)
        )
        out["v"] = jax.lax.dynamic_update_slice(
            cache_l["v"], vt.astype(cache_l["v"].dtype), (0, 0, 0, 0)
        )
    return out


def _row_update(slab: jax.Array, new: jax.Array, positions: jax.Array):
    """slab[b, :, positions[b]] = new[b] for slab [B, nH, S, ...]."""
    if slab.ndim == 3:  # scale slab [B, nH, S], new [B, nH]
        return jax.vmap(
            lambda c, n, p: jax.lax.dynamic_update_slice(c, n[:, None], (0, p))
        )(slab, new, positions)
    return jax.vmap(
        lambda c, n, p: jax.lax.dynamic_update_slice(c, n[:, None, :], (0, p, 0))
    )(slab, new, positions)


def write_decode(
    cache_l: Cache, k: jax.Array, v: jax.Array, positions: jax.Array
) -> Cache:
    """Write one token per row (k, v: [B, 1, nH, dh]; positions [B])."""
    kt = k[:, 0].transpose(0, 1, 2)  # [B, nH, dh]
    vt = v[:, 0]
    out = dict(cache_l)
    if quantized(cache_l):
        kq, ks = _quantize_vec(kt)
        vq, vs = _quantize_vec(vt)
        out["k"] = _row_update(cache_l["k"], kq, positions)
        out["v"] = _row_update(cache_l["v"], vq, positions)
        out["k_s"] = _row_update(cache_l["k_s"], ks, positions)
        out["v_s"] = _row_update(cache_l["v_s"], vs, positions)
    else:
        out["k"] = _row_update(cache_l["k"], kt.astype(cache_l["k"].dtype), positions)
        out["v"] = _row_update(cache_l["v"], vt.astype(cache_l["v"].dtype), positions)
    return out


MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def attend_decode(
    cache_l: Cache, q: jax.Array, valid: jax.Array, sm_scale: float
) -> jax.Array:
    """Single-token attention over the cache.

    q [B, nH, dh]; valid [B, S] bool. Returns [B, nH, dh]. For int8 caches the
    scale factors commute out of both contractions:
      scores = (q . k8) * k_s;   out = sum_s p_s*v_s = (p * v_s) @ v8.
    """
    k8 = cache_l["k"]
    kc = k8.astype(q.dtype) if quantized(cache_l) else k8
    scores = jnp.einsum(
        "bhd,bhsd->bhs", q, kc.astype(q.dtype), preferred_element_type=jnp.float32,
    )
    if quantized(cache_l):
        scores = scores * cache_l["k_s"].astype(jnp.float32)
    scores = scores * sm_scale
    scores = jnp.where(valid[:, None, :], scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    if quantized(cache_l):
        pv = (probs * cache_l["v_s"].astype(jnp.float32)).astype(q.dtype)
    else:
        pv = probs.astype(cache_l["v"].dtype)
    out = jnp.einsum(
        "bhs,bhsd->bhd", pv, cache_l["v"].astype(pv.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)
