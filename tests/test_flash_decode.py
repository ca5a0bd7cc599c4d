"""Interpret-mode coverage of the Pallas flash-decode kernel.

Asserts the seq-chunked online-softmax kernel (ops/flash_decode.py) matches
the XLA attend_decode path on int8 and float caches, across positions that
exercise the DMA-clamp index_map (chunks wholly past ``pos`` map to the last
valid chunk; their data must never leak into the output). Reference behavior
being matched: the fused masked-MHA decode kernel
(/root/reference/src/fastertransformer/kernels/decoder_masked_multihead_attention.cu),
which likewise reads only the valid [0, tlength] prefix of the cache.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastertransformer4codefuse_tpu.engine import kv_cache as kvc
from fastertransformer4codefuse_tpu.ops.flash_decode import flash_decode_stacked


def _make_cache(rng, L, B, nH, S, dh, quantized):
    if quantized:
        cache = {
            "k": jnp.asarray(rng.integers(-127, 128, (L, B, nH, S, dh)), jnp.int8),
            "v": jnp.asarray(rng.integers(-127, 128, (L, B, nH, S, dh)), jnp.int8),
            "k_s": jnp.asarray(rng.random((L, B, nH, S)) * 0.02, jnp.bfloat16),
            "v_s": jnp.asarray(rng.random((L, B, nH, S)) * 0.02, jnp.bfloat16),
        }
    else:
        cache = {
            "k": jnp.asarray(rng.standard_normal((L, B, nH, S, dh)), jnp.bfloat16),
            "v": jnp.asarray(rng.standard_normal((L, B, nH, S, dh)), jnp.bfloat16),
        }
    return cache


@pytest.mark.parametrize(
    "B,nH,dh,S,quantized,pos",
    [
        (1, 8, 128, 640, True, 15),  # pos inside first chunk: clamp skips the rest
        (1, 8, 128, 640, True, 500),
        (2, 4, 128, 384, True, 383),  # full cache valid
        (2, 4, 128, 384, False, 100),  # float cache (no scale operands)
        (1, 2, 256, 256, True, 200),  # dh=256
    ],
)
def test_flash_decode_matches_xla(B, nH, dh, S, quantized, pos):
    rng = np.random.default_rng(0)
    L = 2
    cache = _make_cache(rng, L, B, nH, S, dh, quantized)
    q = jnp.asarray(rng.standard_normal((B, nH, dh)), jnp.bfloat16)
    sm = 1.0 / float(np.sqrt(dh))
    positions = jnp.asarray([(pos + 31 * i) % S for i in range(B)], jnp.int32)
    valid = jnp.arange(S)[None, :] <= positions[:, None]

    kvc.set_flash_decode(False)
    ref = kvc.attend_decode(cache, jnp.int32(1), q, valid, sm, positions=positions)
    out = flash_decode_stacked(
        q, cache["k"], cache.get("k_s"), cache["v"], cache.get("v_s"),
        jnp.int32(1), positions, sm_scale=sm, bs=256, interpret=True,
    )
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    assert float(err) < 0.05, float(err)


def test_flash_decode_clamp_ignores_stale_tail():
    """Poison the cache past ``pos`` with huge values: the clamped chunks and
    masked lanes must not change the output at all."""
    rng = np.random.default_rng(1)
    B, nH, dh, S, L = 1, 4, 128, 512, 1
    cache = _make_cache(rng, L, B, nH, S, dh, quantized=False)
    pos = 100
    poisoned = dict(cache)
    k = np.asarray(cache["k"], np.float32)
    v = np.asarray(cache["v"], np.float32)
    k[..., pos + 1 :, :] = 1e4
    v[..., pos + 1 :, :] = np.nan
    poisoned["k"] = jnp.asarray(k, jnp.bfloat16)
    poisoned["v"] = jnp.asarray(v, jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, nH, dh)), jnp.bfloat16)
    positions = jnp.full((B,), pos, jnp.int32)
    args = dict(sm_scale=0.088, bs=128, interpret=True)
    clean = flash_decode_stacked(
        q, cache["k"], None, cache["v"], None, jnp.int32(0), positions, **args
    )
    dirty = flash_decode_stacked(
        q, poisoned["k"], None, poisoned["v"], None, jnp.int32(0), positions, **args
    )
    assert jnp.array_equal(clean, dirty), "stale tail leaked into flash-decode output"


@pytest.mark.parametrize(
    "B,bw,nH,dh,S,quantized",
    [
        (1, 2, 8, 128, 640, True),
        (2, 4, 4, 128, 512, True),
        (1, 3, 4, 128, 384, False),  # odd beam width, float cache
    ],
)
def test_flash_decode_beam_matches_xla(B, bw, nH, dh, S, quantized):
    """Interpret-mode: the grouped beam kernel (in-kernel cache indirection)
    must match attend_decode_beam's all-pairs XLA formulation."""
    from fastertransformer4codefuse_tpu.ops.flash_decode import (
        flash_decode_beam_stacked,
    )

    rng = np.random.default_rng(1)
    L = 2
    BB = B * bw
    cache = _make_cache(rng, L, BB, nH, S, dh, quantized)
    q = jnp.asarray(rng.standard_normal((BB, nH, dh)), jnp.bfloat16)
    # heterogeneous per-beam lengths exercise the per-row causal bounds
    positions = jnp.asarray(rng.integers(S // 4, S - 1, (BB,)), jnp.int32)
    valid = jnp.arange(S)[None, :] <= positions[:, None]
    indir = jnp.asarray(rng.integers(0, bw, (BB, S)), jnp.int32)
    layer = jnp.int32(1)

    want = kvc.attend_decode_beam(cache, layer, q, valid, 0.11, indir, bw)
    got = flash_decode_beam_stacked(
        q, cache["k"], cache.get("k_s"), cache["v"], cache.get("v_s"),
        layer, positions, indir, bw, sm_scale=0.11, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


@pytest.mark.parametrize(
    "B,nH,nKV,dh,S,quantized,pos",
    [
        (1, 8, 2, 128, 640, True, 500),   # GQA g=4, int8 cache
        (2, 8, 4, 128, 384, False, 100),  # GQA g=2, float cache
        (1, 4, 1, 128, 512, True, 300),   # MQA (single KV head)
    ],
)
def test_flash_decode_gqa_matches_xla(B, nH, nKV, dh, S, quantized, pos):
    """GQA/MQA: the kernel's per-KV-head M=g query dot must match the XLA
    grouped attend (the path LLaMA-family decode used exclusively before)."""
    rng = np.random.default_rng(3)
    L = 2
    cache = _make_cache(rng, L, B, nKV, S, dh, quantized)
    if not quantized:
        # the float-cache GQA REFERENCE path (attend_chunk) does a bf16 PV
        # einsum the CPU backend's thunks reject at this shape — compare in
        # f32 on CPU (the kernel itself is dtype-agnostic)
        cache = {k: v.astype(jnp.float32) for k, v in cache.items()}
    q = jnp.asarray(
        rng.standard_normal((B, nH, dh)),
        jnp.bfloat16 if quantized else jnp.float32,
    )
    sm = 1.0 / float(np.sqrt(dh))
    positions = jnp.asarray([(pos + 17 * i) % S for i in range(B)], jnp.int32)
    valid = jnp.arange(S)[None, :] <= positions[:, None]

    kvc.set_flash_decode(False)
    ref = kvc.attend_decode(cache, jnp.int32(1), q, valid, sm, positions=positions)
    out = flash_decode_stacked(
        q, cache["k"], cache.get("k_s"), cache["v"], cache.get("v_s"),
        jnp.int32(1), positions, sm_scale=sm, bs=256, interpret=True,
    )
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    assert float(err) < 0.05, float(err)
