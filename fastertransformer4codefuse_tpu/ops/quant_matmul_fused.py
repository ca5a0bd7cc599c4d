"""Fused-pair Pallas quant matmuls for the parallel-residual decode block.

The GPT-J-style parallel residual (out = x + attn(ln1 x) + ffn(ln2 x)) lets
two GEMM pairs merge into single kernels, halving the per-layer pallas_call
count (each call pays a fixed pipeline-ramp + dispatch cost that dominates at
decode widths, M<=32):

  A. qkv + up   — both read the SAME hidden width K: one grid over the
     CONCATENATED output columns [N1 | N2], selecting input (ln1 vs ln2),
     weight, scale, and bias block by the column-segment the grid is in.
  B. proj + down — both write the SAME output width N: one grid over the
     CONCATENATED contraction [K1 | K2]; the per-segment scale multiplies
     each partial sum (per-output-channel scales commute out of each
     segment's contraction but differ between segments), and the epilogue
     adds the stacked layer bias AND the residual x, so the kernel's output
     IS the layer output (the reference fuses the same 4-way add in
     invokeAddBiasAttentionFfnResidual, add_residual_kernels.cu, then still
     pays separate QKV/proj/up/down GEMM launches; here the adds AND the
     pair-merge ride one kernel).

Index-map discipline: the inactive segment's operand indices FREEZE at the
last block the active phase fetched (plain ``min``/``where`` clamps), so the
Pallas pipeline sees an unchanged index and skips the re-fetch — each weight
byte streams from HBM exactly once per call.

Both kernels read the int4 (nibble-packed, low-first — see quant_matmul_w4)
or int8 stacked payloads via scalar-prefetched layer index, and take the
STACKED [L, N] biases (indexed in-kernel), eliminating the per-layer bias
dynamic-slice ops the unmerged path paid each step.

Reference analog: the CUTLASS fpA-intB GEMMs + epilogues
(/root/reference/src/fastertransformer/kernels/cutlass_kernels/fpA_intB_gemm/,
layers/FfnLayer.cc:198-215) restructured around TPU dispatch economics.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant_matmul_w4 import _epilogue, _largest_divisor_tile, _pad_to


def _fit_vmem(bk: int, bn: int, pack: int, n_div: int):
    """Two weight operands, double-buffered, must leave room for x/acc/out:
    cap each weight block at ~2MB (8MB of the ~16MB VMEM for weight buffers)."""
    while (bk // pack) * bn > 2 * 1024 * 1024 and bn > 1280:
        half = bn // 2
        if n_div % half:
            break
        bn = half
    return bn


def _unpack(p_block, bits, dtype):
    """[bk(/2), bn] payload block -> [bk, bn] weights in activation dtype."""
    if bits == 4:
        return pltpu.bitcast(p_block, jnp.int4).astype(dtype)
    return p_block.astype(dtype)


def _seg_dot_arr(x, p_ref, s_ref, acc_ref, bits, G):
    """acc += (x @ unpack(p)) * scale for one (bk, bn) weight block, with the
    activation tile passed as an ARRAY (so callers can feed dynamic VMEM
    scratch slices, e.g. the staged FFN hidden in the up+proj+down kernel).

    G=0: per-channel scale [1, bn] multiplies the partial sum (exact: the
    scale is constant across this segment's K). G>0: one dot per K-group,
    each scaled by its [1, bn] group-scale row (quant_matmul_w4's group
    formulation)."""
    w = _unpack(p_ref[0], bits, x.dtype)
    if not G:
        part = jnp.dot(x, w, preferred_element_type=jnp.float32)
        acc_ref[...] += part * s_ref[0, 0][None, :].astype(jnp.float32)
        return
    bk = w.shape[0]
    for g in range(bk // G):
        part = jnp.dot(
            x[:, g * G : (g + 1) * G],
            w[g * G : (g + 1) * G],
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] += part * s_ref[0, g][None, :].astype(jnp.float32)


def _seg_dot(x_ref, p_ref, s_ref, acc_ref, bits, G):
    _seg_dot_arr(x_ref[...], p_ref, s_ref, acc_ref, bits, G)


# ---------------------------------------------------------------- kernel A


def _kernel_qkv_up(
    l_ref, x1_ref, x2_ref, p1_ref, p2_ref, s1_ref, s2_ref, b1_ref, b2_ref,
    o_ref, acc_ref, *, n_k, nj1, bits, G, out_dtype, act1, act2,
):
    j = pl.program_id(1)

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j < nj1)
    def _seg1():
        _seg_dot(x1_ref, p1_ref, s1_ref, acc_ref, bits, G)

    @pl.when(j >= nj1)
    def _seg2():
        _seg_dot(x2_ref, p2_ref, s2_ref, acc_ref, bits, G)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _done():
        @pl.when(j < nj1)
        def _o1():
            o_ref[...] = _epilogue(acc_ref[...], b1_ref, act1).astype(out_dtype)

        @pl.when(j >= nj1)
        def _o2():
            o_ref[...] = _epilogue(acc_ref[...], b2_ref, act2).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits", "G", "out_dtype", "bm", "bn", "bk", "act1", "act2", "interpret"
    ),
)
def fused_qkv_up(
    x1: jax.Array,  # [M, K] (ln1 output — feeds the qkv columns)
    x2: jax.Array,  # [M, K] (ln2 output — feeds the up columns)
    p1: jax.Array,  # [L, K(/2), N1] int8 payload (qkv)
    p2: jax.Array,  # [L, K(/2), N2] int8 payload (up)
    s1: jax.Array,  # [L, N1] or [L, K/G, N1]
    s2: jax.Array,
    b1: jax.Array,  # [L, 1, N1] stacked bias (pre-shaped OUTSIDE the layer
    # scan: reshaping [L, N] per call lowers to a full relayout copy of the
    # bias slab per layer per step — measured 0.7ms/step on 13B)
    b2: jax.Array,  # [L, 1, N2]
    layer: jax.Array,
    bits: int,
    G: int = 0,
    out_dtype=None,
    bm: int = 0,
    bn: int = 0,
    bk: int = 1024,
    act1: str | None = None,
    act2: str | None = None,  # up's activation, when Mosaic-fusable
    interpret: bool = False,  # CPU emulation for tests
):
    """One pallas_call computing [x1 @ W1 | x2 @ W2] over concatenated output
    columns. Returns [M, N1 + N2]; the caller slices qkv = [:, :N1],
    up = [:, N1:]."""
    M, K = x1.shape
    L, Kp_, N1 = p1.shape
    N2 = p2.shape[2]
    pack = 2 if bits == 4 else 1
    assert Kp_ * pack == K and p2.shape[1] * pack == K
    assert b1.shape == (L, 1, N1) and b2.shape == (L, 1, N2)
    out_dtype = out_dtype or x1.dtype
    if bm == 0:
        bm = 256 if M >= 256 else max(16, 1 << (max(M - 1, 1)).bit_length())
    if bn == 0:
        bn = _largest_divisor_tile(math.gcd(N1, N2), 2560)
    assert N1 % bn == 0 and N2 % bn == 0
    if G:
        # Mosaic tiling: the [1, bk//G, bn] scale block's middle dim must be
        # a multiple of 8 (or the whole K/G axis), so bk must be >= 8*G
        bk = _largest_divisor_tile(K, max(bk, 8 * G), floor=8 * G)
        # bk == K is also legal: the scale block then covers the whole K/G axis
        assert bk % (8 * G) == 0 or bk == K, (bk, G, K)
    else:
        bk = _largest_divisor_tile(K, bk)
    bn = _fit_vmem(bk, bn, pack, math.gcd(N1, N2))
    nj1, nj2 = N1 // bn, N2 // bn
    n_k = K // bk
    x1p, x2p = _pad_to(x1, bm, 0), _pad_to(x2, bm, 0)
    Mp = x1p.shape[0]

    # Inactive-segment operands freeze at their last-active block (min/where
    # clamps) so the pipeline never re-fetches them; p2 pays one warm-up
    # block at grid start.
    def w1_map(i, j, k, l):
        return (l[0], jnp.where(j < nj1, k, n_k - 1), jnp.minimum(j, nj1 - 1))

    def w2_map(i, j, k, l):
        return (l[0], jnp.where(j < nj1, 0, k), jnp.maximum(j - nj1, 0))

    if G:
        s_block = (1, bk // G, bn)
        s1_spec = pl.BlockSpec(s_block, w1_map)
        s2_spec = pl.BlockSpec(s_block, w2_map)
        s1_op, s2_op = s1, s2
    else:
        s1_spec = pl.BlockSpec(
            (1, 1, bn), lambda i, j, k, l: (l[0], 0, jnp.minimum(j, nj1 - 1))
        )
        s2_spec = pl.BlockSpec(
            (1, 1, bn), lambda i, j, k, l: (l[0], 0, jnp.maximum(j - nj1, 0))
        )
        s1_op, s2_op = s1.reshape(L, 1, N1), s2.reshape(L, 1, N2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // bm, nj1 + nj2, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k, l: (i, k)),
            pl.BlockSpec((bm, bk), lambda i, j, k, l: (i, k)),
            pl.BlockSpec((1, bk // pack, bn), w1_map),
            pl.BlockSpec((1, bk // pack, bn), w2_map),
            s1_spec,
            s2_spec,
            pl.BlockSpec(
                (1, 1, bn), lambda i, j, k, l: (l[0], 0, jnp.minimum(j, nj1 - 1))
            ),
            pl.BlockSpec(
                (1, 1, bn), lambda i, j, k, l: (l[0], 0, jnp.maximum(j - nj1, 0))
            ),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_qkv_up, n_k=n_k, nj1=nj1, bits=bits, G=G,
            out_dtype=out_dtype, act1=act1, act2=act2,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N1 + N2), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * (N1 + N2) * K,
            bytes_accessed=2 * Mp * K * 2 + K * (N1 + N2) // pack + Mp * (N1 + N2) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x1p, x2p, p1, p2, s1_op, s2_op, b1, b2,
    )
    return out[:M]


# ---------------------------------------------------------------- kernel B


def _kernel_proj_down(
    l_ref, x1_ref, x2_ref, p1_ref, p2_ref, s1_ref, s2_ref, b_ref, r_ref,
    o_ref, acc_ref, *, n_k, nk1, bits, G, out_dtype,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(k < nk1)
    def _seg1():
        _seg_dot(x1_ref, p1_ref, s1_ref, acc_ref, bits, G)

    @pl.when(k >= nk1)
    def _seg2():
        _seg_dot(x2_ref, p2_ref, s2_ref, acc_ref, bits, G)

    @pl.when(k == n_k - 1)
    def _done():
        y = acc_ref[...] + b_ref[0].astype(jnp.float32)
        y = y + r_ref[...].astype(jnp.float32)
        o_ref[...] = y.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("bits", "G", "out_dtype", "bm", "bn", "bk", "interpret")
)
def fused_proj_down(
    x1: jax.Array,  # [M, K1] (attention output — contracts with proj)
    x2: jax.Array,  # [M, K2] (activated FFN hidden — contracts with down)
    p1: jax.Array,  # [L, K1(/2), N] int8 payload (proj)
    p2: jax.Array,  # [L, K2(/2), N] int8 payload (down)
    s1: jax.Array,  # [L, N] or [L, K1/G, N]
    s2: jax.Array,
    bias: jax.Array,  # [L, 1, N] stacked (down_b: the pre-summed parallel
    # bias), pre-shaped outside the layer scan (see fused_qkv_up)
    residual: jax.Array,  # [M, N] — the block input x
    layer: jax.Array,
    bits: int,
    G: int = 0,
    out_dtype=None,
    bm: int = 0,
    bn: int = 0,
    bk: int = 640,  # sweep: 99.7us/layer at bk=640/bn=5120 vs 107 at bk=2560
    interpret: bool = False,  # CPU emulation for tests
):
    """One pallas_call computing x1 @ W1 + x2 @ W2 + bias[layer] + residual —
    the ENTIRE parallel-residual merge: its output is the layer output."""
    M, K1 = x1.shape
    K2 = x2.shape[1]
    L, _, N = p1.shape
    pack = 2 if bits == 4 else 1
    assert p1.shape[1] * pack == K1 and p2.shape[1] * pack == K2
    assert bias.shape == (L, 1, N)
    out_dtype = out_dtype or x1.dtype
    if bm == 0:
        bm = 256 if M >= 256 else max(16, 1 << (max(M - 1, 1)).bit_length())
    if bn == 0:
        bn = _largest_divisor_tile(N, 5120)
    if bk == 0:
        bk = _largest_divisor_tile(math.gcd(K1, K2), 640)
    if G:
        # scale-block middle dim (bk//G) must be a multiple of 8 — see kernel A
        bk = _largest_divisor_tile(math.gcd(K1, K2), max(bk, 8 * G), floor=8 * G)
        # bk == K1 == K2 also legal (scale blocks cover their whole K/G axes)
        assert bk % (8 * G) == 0 or bk == K1 == K2, (bk, G, K1, K2)
    else:
        bk = _largest_divisor_tile(math.gcd(K1, K2), bk)
    bn = _fit_vmem(bk, bn, pack, N)
    assert K1 % bk == 0 and K2 % bk == 0
    nk1, nk2 = K1 // bk, K2 // bk
    n_k = nk1 + nk2
    x1p, x2p = _pad_to(x1, bm, 0), _pad_to(x2, bm, 0)
    rp = _pad_to(residual, bm, 0)
    Mp = x1p.shape[0]

    def w1_map(i, j, k, l):
        return (l[0], jnp.minimum(k, nk1 - 1), j)

    def w2_map(i, j, k, l):
        return (l[0], jnp.maximum(k - nk1, 0), j)

    if G:
        s1_spec = pl.BlockSpec((1, bk // G, bn), w1_map)
        s2_spec = pl.BlockSpec((1, bk // G, bn), w2_map)
        s1_op, s2_op = s1, s2
    else:
        s1_spec = pl.BlockSpec((1, 1, bn), lambda i, j, k, l: (l[0], 0, j))
        s2_spec = pl.BlockSpec((1, 1, bn), lambda i, j, k, l: (l[0], 0, j))
        s1_op, s2_op = s1.reshape(L, 1, N), s2.reshape(L, 1, N)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // bm, N // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k, l: (i, jnp.minimum(k, nk1 - 1))),
            pl.BlockSpec((bm, bk), lambda i, j, k, l: (i, jnp.maximum(k - nk1, 0))),
            pl.BlockSpec((1, bk // pack, bn), w1_map),
            pl.BlockSpec((1, bk // pack, bn), w2_map),
            s1_spec,
            s2_spec,
            pl.BlockSpec((1, 1, bn), lambda i, j, k, l: (l[0], 0, j)),
            pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_proj_down, n_k=n_k, nk1=nk1, bits=bits, G=G,
            out_dtype=out_dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * (K1 + K2),
            bytes_accessed=Mp * (K1 + K2) * 2 + (K1 + K2) * N // pack + 2 * Mp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x1p, x2p, p1, p2, s1_op, s2_op, bias, rp,
    )
    return out[:M]


# ---------------------------------------------------------------- kernel C


def _kernel_upd(
    l_ref, xu_ref, xp_ref, pu_ref, pp_ref, pd_ref, su_ref, sp_ref, sd_ref,
    bu_ref, bd_ref, r_ref, o_ref, accu_ref, h_ref, acc_ref,
    *, n_up, n_proj, n_down, bkd, bits, G, act, out_dtype,
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        accu_ref[...] = jnp.zeros_like(accu_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(k < n_up)
    def _up():
        _seg_dot(xu_ref, pu_ref, su_ref, accu_ref, bits, G)

    @pl.when(k == n_up)
    def _stage_h():
        # finalize the FFN hidden: bias + activation on the f32 accumulator,
        # staged into [n_down, bm, bkd] tiles so the down phase reads cheap
        # leading-dim slices (a dynamic LANE slice of [bm, F] would relayout)
        hv = _epilogue(accu_ref[...], bu_ref, act)
        for i in range(n_down):
            h_ref[i] = hv[:, i * bkd : (i + 1) * bkd].astype(h_ref.dtype)

    @pl.when(jnp.logical_and(k >= n_up, k < n_up + n_proj))
    def _proj():
        _seg_dot(xp_ref, pp_ref, sp_ref, acc_ref, bits, G)

    @pl.when(k >= n_up + n_proj)
    def _down():
        kd = k - (n_up + n_proj)
        _seg_dot_arr(h_ref[kd], pd_ref, sd_ref, acc_ref, bits, G)

    @pl.when(k == n_up + n_proj + n_down - 1)
    def _done():
        y = acc_ref[...] + bd_ref[0].astype(jnp.float32)
        y = y + r_ref[...].astype(jnp.float32)
        o_ref[...] = y.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits", "G", "act", "out_dtype", "bm", "bku", "bkp", "bkd",
        "vmem_mb", "interpret",
    ),
)
def fused_up_proj_down(
    x_up: jax.Array,  # [M, H] (ln2 output — feeds the FFN up GEMM)
    x_proj: jax.Array,  # [M, H] (attention output — feeds proj)
    residual: jax.Array,  # [M, N] — the block input x
    p_up: jax.Array,  # [L, H(/2), F] int8 payload
    p_proj: jax.Array,  # [L, H(/2), N]
    p_down: jax.Array,  # [L, F(/2), N]
    s_up: jax.Array,  # [L, F] or [L, H/G, F]
    s_proj: jax.Array,  # [L, N] or [L, H/G, N]
    s_down: jax.Array,  # [L, N] or [L, F/G, N]
    b_up: jax.Array,  # [L, 1, F] stacked up bias
    b_down: jax.Array,  # [L, 1, N] stacked pre-summed parallel bias
    layer: jax.Array,
    bits: int,
    G: int = 0,
    act: str | None = "gelu-tanh",  # must be Mosaic-fusable (caller gates)
    out_dtype=None,
    bm: int = 0,
    bku: int = 0,  # up-phase K tile (weight block [bku/pack, F])
    bkp: int = 0,  # proj-phase K tile
    bkd: int = 0,  # down-phase K tile
    vmem_mb: int = 64,
    interpret: bool = False,  # CPU emulation for tests
):
    """The decode block's ENTIRE non-attention GEMM work as one pallas_call:

        out = x + attn @ W_proj + act(ln2(x) @ W_up + b_up) @ W_down + b_down

    Three phased weight streams (up -> proj -> down) ride a single Pallas
    pipeline: one pallas_call = one pipeline ramp (the first chunk's DMA is
    the only unoverlapped one) for ~118MB of int4 weights, where the split
    up-kernel + proj+down-kernel pair pays two ramps plus an extra dispatch
    and a full [M, F] hidden round-trip through HBM. The FFN hidden never
    leaves VMEM: it is staged as [n_down, bm, bkd] bf16 tiles at the up->proj
    boundary. Inactive phases' operand indices freeze (clamped maps), so each
    weight byte streams exactly once per call.

    Reference analog: GptNeoXDecoder.cc:333-360 (FFN + invokeAddBias-
    AttentionFfnResidual + the proj GEMM of DecoderSelfAttentionLayer.cc:
    635-652), restructured so the whole post-attention block is one kernel.
    """
    M, H = x_up.shape
    L, _, F = p_up.shape
    N = p_proj.shape[2]
    pack = 2 if bits == 4 else 1
    assert x_proj.shape == (M, H) and residual.shape == (M, N)
    assert p_up.shape == (L, H // pack, F)
    assert p_proj.shape == (L, H // pack, N)
    assert p_down.shape == (L, F // pack, N)
    assert b_up.shape == (L, 1, F) and b_down.shape == (L, 1, N)
    out_dtype = out_dtype or x_up.dtype
    if bm == 0:
        bm = 256 if M >= 256 else max(16, 1 << (max(M - 1, 1)).bit_length())
    # Default tiles come from the autotune cache (tools/tile_autotune.py
    # --kernels upd, key fused_upd{bits}); the miss fallback is the measured
    # compile-safe sweet spot on v5e (Mosaic compile time explodes >100x for
    # a [1024, 5120] down block in this kernel, while [512, 5120] compiles in
    # seconds — probed 2026-08-18): up [256p, F] ~5MB, proj [640p, N] ~3.3MB,
    # down [512p, N] ~2.6MB.
    if not (bku and bkp and bkd):
        import os as _os

        env = _os.environ.get("FTCF_UPD_TILES")  # "bku,bkp,bkd" A/B knob
        if env:
            bku, bkp, bkd = (int(v) for v in env.split(","))
        else:
            from .tile_tuning import lookup_entry

            e = lookup_entry(f"fused_upd{bits}", bm, H, F, G) or {}
            bku = bku or int(e.get("bku", 0))
            bkp = bkp or int(e.get("bkp", 0))
            bkd = bkd or int(e.get("bkd", 0))
    if bku == 0:
        bku = _largest_divisor_tile(H, min(256 * pack, H))
    if bkp == 0:
        bkp = _largest_divisor_tile(H, min(640 * pack, H))
    if bkd == 0:
        bkd = _largest_divisor_tile(F, min(512 * pack, F))
    if G:
        # group-scale blocks [1, bk/G, bn]: middle dim must be a multiple of
        # 8 (or the whole axis) — see fused_qkv_up
        bku = _largest_divisor_tile(H, max(bku, 8 * G), floor=8 * G)
        bkp = _largest_divisor_tile(H, max(bkp, 8 * G), floor=8 * G)
        bkd = _largest_divisor_tile(F, max(bkd, 8 * G), floor=8 * G)
        for bk, K in ((bku, H), (bkp, H), (bkd, F)):
            assert bk % (8 * G) == 0 or bk == K, (bk, G, K)
    n_up, n_proj, n_down = H // bku, H // bkp, F // bkd
    n_k = n_up + n_proj + n_down
    xup, xpp = _pad_to(x_up, bm, 0), _pad_to(x_proj, bm, 0)
    rp = _pad_to(residual, bm, 0)
    Mp = xup.shape[0]

    def ku(k):
        return jnp.minimum(k, n_up - 1)

    def kp(k):
        return jnp.clip(k - n_up, 0, n_proj - 1)

    def kd(k):
        return jnp.clip(k - n_up - n_proj, 0, n_down - 1)

    if G:
        su_spec = pl.BlockSpec((1, bku // G, F), lambda i, k, l: (l[0], ku(k), 0))
        sp_spec = pl.BlockSpec((1, bkp // G, N), lambda i, k, l: (l[0], kp(k), 0))
        sd_spec = pl.BlockSpec((1, bkd // G, N), lambda i, k, l: (l[0], kd(k), 0))
        su_op, sp_op, sd_op = s_up, s_proj, s_down
    else:
        su_spec = pl.BlockSpec((1, 1, F), lambda i, k, l: (l[0], 0, 0))
        sp_spec = pl.BlockSpec((1, 1, N), lambda i, k, l: (l[0], 0, 0))
        sd_spec = pl.BlockSpec((1, 1, N), lambda i, k, l: (l[0], 0, 0))
        su_op = s_up.reshape(L, 1, F)
        sp_op = s_proj.reshape(L, 1, N)
        sd_op = s_down.reshape(L, 1, N)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // bm, n_k),
        in_specs=[
            pl.BlockSpec((bm, bku), lambda i, k, l: (i, ku(k))),
            pl.BlockSpec((bm, bkp), lambda i, k, l: (i, kp(k))),
            pl.BlockSpec((1, bku // pack, F), lambda i, k, l: (l[0], ku(k), 0)),
            pl.BlockSpec((1, bkp // pack, N), lambda i, k, l: (l[0], kp(k), 0)),
            pl.BlockSpec((1, bkd // pack, N), lambda i, k, l: (l[0], kd(k), 0)),
            su_spec,
            sp_spec,
            sd_spec,
            pl.BlockSpec((1, 1, F), lambda i, k, l: (l[0], 0, 0)),
            pl.BlockSpec((1, 1, N), lambda i, k, l: (l[0], 0, 0)),
            pl.BlockSpec((bm, N), lambda i, k, l: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, N), lambda i, k, l: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bm, F), jnp.float32),  # up accumulator
            pltpu.VMEM((n_down, bm, bkd), x_up.dtype),  # staged FFN hidden
            pltpu.VMEM((bm, N), jnp.float32),  # proj+down accumulator
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_upd, n_up=n_up, n_proj=n_proj, n_down=n_down, bkd=bkd,
            bits=bits, G=G, act=act, out_dtype=out_dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * (F * H + N * H + N * F),
            bytes_accessed=(H * F + H * N + F * N) // pack + 3 * Mp * H * 2,
            transcendentals=Mp * F,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        xup, xpp, p_up, p_proj, p_down, su_op, sp_op, sd_op, b_up, b_down, rp,
    )
    return out[:M]
