"""Banded sliding-window attention Pallas kernel (Longformer local path).

The reference implements Longformer's local attention as dedicated CUDA
sliding-chunk kernels (/root/reference/src/fastertransformer/kernels/
longformer_kernels.cu + models/longformer/LongformerEncoder.cc) so the [S, S]
score matrix is never materialized. TPU analog: a banded online-softmax
prefill kernel — the grid only VISITS the KV chunks intersecting each query
chunk's ±w band, so compute and HBM traffic scale with S*(2w+C) instead of
S². Same online-softmax accumulator scheme as ops/flash_decode.py; the band
turns the kv axis from ``n_s`` full chunks into a static ``n_band`` =
ceil((C+2w)/C)+1 visits with clamped index maps (out-of-range visits fully
masked).

Used by models/longformer.encode(use_kernel=True) for the no-global-token
case; rows with global tokens take the dense-masked XLA path (global columns
break the band structure).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(scalars, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            *, w: int, C: int, n_band: int, nc: int, causal: bool = False):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    step = pl.program_id(3)
    off = -(-w // C)  # band starts off chunks left of the q chunk
    jc = qi - off + step  # logical kv chunk this step visits
    valid_chunk = jnp.logical_and(jc >= 0, jc < nc)

    @pl.when(step == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(valid_chunk)
    def _visit():
        length = scalars[b]
        q = q_ref[0, 0, :, :].astype(jnp.float32)  # [C, dh]
        k = k_ref[0, 0, :, :].astype(jnp.float32)  # [C, dh]
        v = v_ref[0, 0, :, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, C]
        qidx = qi * C + jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        kidx = jc * C + jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
        if causal:
            # Mistral-class sliding-window causal band: j in [i-w, i]
            allow = (kidx <= qidx) & (qidx - kidx <= w) & (kidx < length)
        else:
            allow = (jnp.abs(qidx - kidx) <= w) & (kidx < length)
        s = jnp.where(allow, s, NEG)

        m_prev = m_ref[:, :1]  # [C, 1] running max
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # masked entries exp(NEG)≈0
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:, :1] = m_new

    @pl.when(step == n_band - 1)
    def _fini():
        l = l_ref[:, :1]
        o_ref[0, 0, :, :] = (
            acc_ref[...] / jnp.where(l == 0.0, 1.0, l)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("w_half", "chunk", "interpret", "causal")
)
def sliding_window_attention(
    q: jax.Array,  # [B, S, nH, dh] — ALREADY scaled by 1/sqrt(dh)
    k: jax.Array,  # [B, S, nH, dh]
    v: jax.Array,
    w_half: int,
    is_masked: jax.Array,  # [B, S] bool — padding positions
    chunk: int = 128,
    interpret=None,  # None = interpret off-TPU (tests run the CPU backend)
    causal: bool = False,  # sliding-window CAUSAL band [i-w, i] — the
    # Mistral-lineage prefill pattern (band + causality in one mask)
) -> jax.Array:
    """Banded attention: position i attends j iff |i-j| <= w_half (causal:
    i-w_half <= j <= i) and j is a real token. Padded query rows return 0
    (matching models/longformer's dense path / HF's prob zeroing).
    Returns [B, S, nH, dh]."""
    B, S, nH, dh = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w = int(w_half)
    C = min(chunk, max(8, -(-S // 8) * 8))
    Sp = -(-S // C) * C
    nc = Sp // C

    def pad(x):
        # [B, S, nH, dh] -> [B, nH, Sp, dh]: blocked (C, dh) trailing dims
        # satisfy the Mosaic (8, 128)-or-full divisibility rule
        x = jnp.swapaxes(x, 1, 2)
        return jnp.pad(x, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    lengths = jnp.sum((~is_masked).astype(jnp.int32), axis=1)
    n_band = (-(-w // C)) + 1 if causal else 2 * (-(-w // C)) + 1

    spec = pl.BlockSpec(
        (1, 1, C, dh),
        lambda b, h, qi, s, sr: (b, h, qi, 0),
    )
    off = -(-w // C)
    kv_spec = pl.BlockSpec(
        (1, 1, C, dh),
        lambda b, h, qi, s, sr: (
            b, h, jnp.clip(qi - off + s, 0, nc - 1), 0
        ),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nH, nc, n_band),
        in_specs=[spec, kv_spec, kv_spec],
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((C, 128), jnp.float32),
            pltpu.VMEM((C, 128), jnp.float32),
            pltpu.VMEM((C, dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, w=w, C=C, n_band=n_band, nc=nc, causal=causal
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nH, Sp, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nH * Sp * (2 * w + C) * dh,
            bytes_accessed=2 * B * nH * Sp * dh * k.dtype.itemsize,
            transcendentals=B * nH * Sp * (2 * w + C),
        ),
        interpret=interpret,
    )(lengths, qp, kp, vp)
    out = jnp.swapaxes(out, 1, 2)[:, :S]
    # padded query rows -> 0 like the dense path
    return jnp.where(is_masked[:, :, None, None], 0.0, out)
