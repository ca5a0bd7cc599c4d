"""Pallas fused dequant-matmul: bf16/f32 activations x int8 weights.

The TPU replacement for the reference's CUTLASS fpA-intB mixed GEMM
(/root/reference/src/fastertransformer/kernels/cutlass_kernels/fpA_intB_gemm/,
cutlass_extensions' interleaved tile iterators + fast int8->fp16 converters).

Design: the weight tile is DMA'd HBM->VMEM as int8 (half the bytes of bf16 —
the entire int8 speedup for bandwidth-bound decode GEMMs lives in this DMA),
converted to the activation dtype on the VPU, fed to the MXU with fp32
accumulation, and the per-output-channel scale is applied once on the fp32
accumulator at the K-loop epilogue (scales commute out of the contraction).
No CUTLASS-style offline layout interleave is needed: Mosaic handles (32,128)
int8 tiling natively.

Grid: (M/bm, N/bn, K/bk), K innermost ("arbitrary" = sequential reduction),
M/N "parallel" across megacores. Pallas double-buffers the HBM loads across
grid steps automatically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(x_ref.dtype)  # VPU int8 -> act dtype
    acc_ref[...] += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _done():
        scale = s_ref[...].astype(jnp.float32)  # [1, bn]
        o_ref[...] = (acc_ref[...] * scale).astype(out_dtype)


def _largest_divisor_tile(dim: int, want: int, floor: int = 128) -> int:
    """Largest multiple of `floor` that divides `dim` and is <= `want`."""
    want = min(want, dim)
    for cand in range(want - want % floor, floor - 1, -floor):
        if dim % cand == 0:
            return cand
    return dim  # fall back to the whole dim (always divides)


def _pad_to(x, mult, axis):
    rem = x.shape[axis] % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, mult - rem)
    return jnp.pad(x, pad)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "interpret")
)
def quant_matmul_pallas(
    x: jax.Array,  # [M, K] bf16/f32
    w: jax.Array,  # [K, N] int8
    scale: jax.Array,  # [N] f32 per-output-channel
    out_dtype=None,
    bm: int = 0,  # 0 = auto
    bn: int = 512,
    bk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    M, K = x.shape
    K2, N = w.shape
    assert K == K2 and scale.shape == (N,)
    out_dtype = out_dtype or x.dtype

    if bm == 0:
        bm = 256 if M >= 256 else max(16, 1 << (max(M - 1, 1)).bit_length())
    bn = min(bn, N)
    bk = min(bk, K)

    xp = _pad_to(_pad_to(x, bm, 0), bk, 1)
    wp = _pad_to(_pad_to(w, bk, 0), bn, 1)
    sp = _pad_to(scale.reshape(1, N), bn, 1)
    Mp, Kp = xp.shape
    Np = wp.shape[1]
    n_k = Kp // bk

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, out_dtype=out_dtype),
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * 2 + Kp * Np + Mp * Np * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wp, sp)
    return out[:M, :N]


def _kernel_stacked(
    l_ref, x_ref, w_ref, s_ref, *rest, n_k: int, out_dtype, act, has_bias
):
    if has_bias:
        b_ref, o_ref, acc_ref = rest
    else:
        b_ref, (o_ref, acc_ref) = None, rest

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[0].astype(x_ref.dtype)
    acc_ref[...] += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _done():
        from .quant_matmul_w4 import _epilogue

        scale = s_ref[0].astype(jnp.float32)  # [1, bn]
        o_ref[...] = _epilogue(acc_ref[...] * scale, b_ref, act).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "act"))
def quant_matmul_pallas_stacked(
    x: jax.Array,  # [M, K]
    w_all: jax.Array,  # [L, K, N] int8 — whole stacked weight stays in HBM
    s_all: jax.Array,  # [L, N] f32
    layer: jax.Array,  # scalar int32, selected via scalar prefetch
    out_dtype=None,
    bm: int = 0,
    bn: int = 0,  # 0 = autotune cache, else 2560
    bk: int = 0,  # 0 = autotune cache, else 2048 (sweep: 141.2us vs 146.1 @1024)
    bias=None,  # [N] per-layer, or [L, 1, N] stacked (indexed in-kernel)
    act: str | None = None,  # fused activation in the epilogue
):
    """Layer-indexed fused dequant matmul over the stacked per-layer weights.

    XLA cannot fuse a dynamic layer slice into a Pallas custom call, so a
    per-layer-slice operand materializes a full copy of the weight every call
    (observed 50-70us per GEMM on 13B — the reason the sliced kernel lost to
    the XLA composition). Scalar-prefetching the layer index instead makes the
    kernel DMA its tiles straight from the stacked HBM array.
    """
    M, K = x.shape
    L, K2, N = w_all.shape
    assert K == K2 and s_all.shape == (L, N)
    out_dtype = out_dtype or x.dtype
    if bm == 0:
        bm = 256 if M >= 256 else max(16, 1 << (max(M - 1, 1)).bit_length())
    if not (bn and bk):
        from .tile_tuning import lookup

        tuned = lookup("stacked_int8", bm, K, N)
        bn = bn or (tuned[0] if tuned else 2560)
        bk = bk or (tuned[1] if tuned else 2048)
    bn = _largest_divisor_tile(N, bn)
    bk = _largest_divisor_tile(K, bk)
    # VMEM budget: double-buffered int8 weight + bf16 x tiles, f32 acc, bf16
    # out. bk=2048 wins at decode widths (bm=16) but overflows the 16MB scoped
    # limit at prefill widths (bm=256: 2*2048*2560 + ... ~ 16.4MB) — shrink bk
    # then bn until the working set fits. A fused activation epilogue adds
    # several full [bm, bn] f32 temporaries on the Mosaic stack (measured: the
    # gelu-tanh epilogue at [256, 2560] pushed the scoped allocation from
    # ~12M to 23.2M, past the 21M limit) — budget ~3 extra f32 blocks for it.
    def _working_set():
        est = 2 * bk * bn + 4 * bm * bk + 6 * bm * bn
        if act is not None:
            est += 12 * bm * bn
        return est

    while _working_set() > 14 * 1024 * 1024:
        if bk > 1024:
            bk = _largest_divisor_tile(K, bk // 2)
        elif bn > 640:
            bn = _largest_divisor_tile(N, bn // 2)
        else:
            break
    xp = _pad_to(x, bm, 0)
    Mp = xp.shape[0]
    n_k = K // bk

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k, l_ref: (i, k)),
        pl.BlockSpec((1, bk, bn), lambda i, j, k, l_ref: (l_ref[0], k, j)),
        pl.BlockSpec((1, 1, bn), lambda i, j, k, l_ref: (l_ref[0], 0, j)),
    ]
    operands = [xp, w_all, s_all.reshape(L, 1, N)]
    if bias is not None:
        if bias.ndim == 3:  # [L, 1, N] stacked — indexed by the prefetched layer
            assert bias.shape == (L, 1, N)
            in_specs.append(
                pl.BlockSpec((1, 1, bn), lambda i, j, k, l_ref: (l_ref[0], 0, j))
            )
            operands.append(bias)
        else:
            assert bias.shape == (N,)
            in_specs.append(pl.BlockSpec((1, bn), lambda i, j, k, l_ref: (0, j)))
            operands.append(bias.reshape(1, N))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // bm, N // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l_ref: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_stacked, n_k=n_k, out_dtype=out_dtype, act=act,
            has_bias=bias is not None,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * 2 + K * N + Mp * N * 2,
            transcendentals=0,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    return out[:M]


def quant_matmul_reference(x, w, scale):
    """jnp reference for tests."""
    acc = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    return (acc * scale[None, :].astype(jnp.float32)).astype(x.dtype)
