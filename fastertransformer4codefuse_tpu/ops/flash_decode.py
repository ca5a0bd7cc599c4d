"""Pallas decode attention over the (optionally int8) KV cache.

The TPU replacement for the reference's fused masked multi-head attention
decode kernel (/root/reference/src/fastertransformer/kernels/
decoder_masked_multihead_attention.cu: one CTA per (batch, head) streaming the
cached keys with online softmax). Design notes for the TPU version:

- The sequence axis is CHUNKED through the innermost grid dim (online softmax
  over running (m, l, acc) scratch), so arbitrarily long caches stream
  through a double-buffered pipeline instead of demanding one whole-[S] VMEM
  block (the round-1 kernel's S<=4096 gate came from exactly that).
- A block covers ``hb`` heads (amortizing per-grid-step overhead — a
  head-per-cell grid measured 2x slower on small blocks); the math runs as an
  unrolled per-head loop of two M=1 MXU dots per chunk, scores LANE-major:
  ``scores[1, bs] = q_h[1, dh] @ k_h[bs, dh]^T`` then
  ``pv[1, dh] = p[1, bs] @ v_h[bs, dh]``. M=1 dots stream only ~bs/128 (resp.
  dh/128) MXU column passes, so they are nearly free and leave the VPU to the
  int8->f32 converts; the lane-major orientation makes the per-vector cache
  scales ([bs] slices -> [1, bs]) and the mask iota land with ZERO relayouts.
  The VPU alternative (broadcast-multiply + cross-lane tree reduce) re-walks
  the [bs, dh] tile log2(dh) times and measured 2-3x slower than XLA.
- The layer is scalar-prefetched from the stacked [L, ...] cache slabs (same
  trick as the stacked weight kernels), so the kernel reads straight out of
  the scan-carried cache with no per-layer slice copy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    scalars_ref, q_ref, k_ref, *rest, sm_scale, bs, n_s, hb, has_scale,
):
    if has_scale:
        ks_ref, v_ref, vs_ref, o_ref, ml_ref, acc_ref = rest
    else:
        v_ref, o_ref, ml_ref, acc_ref = rest
    b = pl.program_id(0)
    s_idx = pl.program_id(2)
    pos = scalars_ref[1 + b]  # newest-token slot (inclusive mask bound)

    @pl.when(s_idx == 0)
    def _init():
        for h in range(hb):
            ml_ref[0, h] = MASK_VALUE  # running max
            ml_ref[1, h] = 0.0  # running denom
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # chunks fully past the valid prefix contribute nothing; skip their math
    # (their DMA is already in flight — the win is VPU time, not bytes)
    @pl.when(s_idx * bs <= pos)
    def _compute():
        col = jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1) + s_idx * bs
        valid = col <= pos
        for h in range(hb):
            qb = q_ref[0, h : h + 1].astype(jnp.float32)  # [1, dh]
            kf = k_ref[0, 0, h].astype(jnp.float32)  # [bs, dh]
            # scores = q @ k^T: M=1 MXU dot, LANE-major [1, bs]
            scores = jax.lax.dot_general(
                qb, kf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, bs]
            if has_scale:
                ks = ks_ref[0, 0, h : h + 1].astype(jnp.float32)  # [1, bs]
                scores = scores * ks
            scores = jnp.where(valid, scores * sm_scale, MASK_VALUE)

            m_prev = ml_ref[0, h]
            l_prev = ml_ref[1, h]
            m_new = jnp.maximum(m_prev, jnp.max(scores))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(scores - m_new)  # [1, bs]; masked cols -> 0

            if has_scale:
                # OOB tail loads can hold NaN bit patterns in the scale slab
                # and 0 * NaN = NaN — re-mask after the multiply
                vs = vs_ref[0, 0, h : h + 1].astype(jnp.float32)  # [1, bs]
                pv_w = jnp.where(valid, p * vs, 0.0)
            else:
                pv_w = p
            vf = v_ref[0, 0, h].astype(jnp.float32)  # [bs, dh]
            if not has_scale:
                # float caches: tail garbage could be NaN while p is 0
                # (fresh sublane-major iota, not a relayout of `valid`)
                row = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0) + s_idx * bs
                vf = jnp.where(row <= pos, vf, 0.0)
            # pv = p @ v: M=1 MXU dot, K=bs on v's sublanes (canonical)
            pv = jax.lax.dot_general(
                pv_w, vf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, dh]
            acc_ref[h : h + 1] = alpha * acc_ref[h : h + 1] + pv
            ml_ref[0, h] = m_new
            ml_ref[1, h] = alpha * l_prev + jnp.sum(p)

    @pl.when(s_idx == n_s - 1)
    def _done():
        for h in range(hb):
            denom = jnp.maximum(ml_ref[1, h], 1e-20)
            o_ref[0, h : h + 1] = (acc_ref[h : h + 1] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "hb", "bs", "interpret"))
def flash_decode_stacked(
    q: jax.Array,  # [B, nH, dh] bf16
    k_all: jax.Array,  # [L, B, nH, S, dh] int8 or bf16
    ks_all,  # [L, B, nH, S] scales, or None for float caches
    v_all: jax.Array,
    vs_all,
    layer: jax.Array,  # scalar
    positions: jax.Array,  # [B] — newest-token slot per row (inclusive mask)
    sm_scale: float,
    hb: int = 8,  # heads per grid block
    bs: int = 1024,  # sequence chunk (any S; ragged tail masked)
    interpret: bool = False,  # CPU emulation for tests
) -> jax.Array:
    B, nH, dh = q.shape
    L, B2, nH2, S, dh2 = k_all.shape
    assert (B, nH, dh) == (B2, nH2, dh2)
    has_scale = ks_all is not None
    while nH % hb:
        hb //= 2
    bs = min(bs, -(-S // 128) * 128)
    n_s = -(-S // bs)  # ceil: tail chunk rows are masked by the pos bound
    scalars = jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), positions.astype(jnp.int32)]
    )
    # Chunks wholly past this row's newest token carry no valid data: clamp
    # their block index to the last valid chunk. Consecutive grid steps then
    # map to the SAME block and the Pallas pipeline skips the re-fetch, so the
    # kernel streams only ceil(pos/bs) chunks of cache while the XLA path
    # always reads the full allocation — the length-proportional read the
    # reference gets from its per-timestep loop (decoder_masked_multihead_
    # attention_template.hpp, ti < tlength loop).
    def _s_clamp(b, s, sr):
        return jnp.minimum(s, sr[1 + b] // bs)

    kv_spec = pl.BlockSpec(
        (1, 1, hb, bs, dh), lambda b, h, s, sr: (sr[0], b, h, _s_clamp(b, s, sr), 0)
    )
    sc_spec = pl.BlockSpec(
        (1, 1, hb, bs), lambda b, h, s, sr: (sr[0], b, h, _s_clamp(b, s, sr))
    )
    in_specs = [pl.BlockSpec((1, hb, dh), lambda b, h, s, sr: (b, h, 0)), kv_spec]
    operands = [q, k_all]
    if has_scale:
        in_specs += [sc_spec, kv_spec, sc_spec]
        operands += [ks_all, v_all, vs_all]
    else:
        in_specs += [kv_spec]
        operands += [v_all]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nH // hb, n_s),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, dh), lambda b, h, s, sr: (b, h, 0)),
        scratch_shapes=[
            pltpu.SMEM((2, hb), jnp.float32),  # running (max, denom) per head
            pltpu.VMEM((hb, dh), jnp.float32),  # running numerators
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, sm_scale=sm_scale, bs=bs, n_s=n_s, hb=hb, has_scale=has_scale
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nH, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nH * S * dh,
            bytes_accessed=2 * B * nH * S * dh * k_all.dtype.itemsize,
            transcendentals=B * nH * S,
        ),
        interpret=interpret,
    )(scalars, *operands)
