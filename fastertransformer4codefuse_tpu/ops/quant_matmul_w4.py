"""Pallas W4A16 fused dequant-matmul: bf16 activations x nibble-packed int4.

The packed byte tile is DMA'd HBM->VMEM once (half the int8 kernel's bytes)
and unpacked with Mosaic's native int8->int4 ``bitcast`` — byte row i becomes
int4 rows (2i, 2i+1) with the LOW nibble first (verified on v5e) — then
converted and fed to the MXU. This is the TPU replacement for the reference's
CUTLASS int4 fpA-intB path (cutlass_extensions' interleaved int4 tile
iterators); the packing convention in QuantizedTensor(bits=4) matches the
hardware bitcast so no in-kernel shuffles are needed.

Packing (interleaved along K): byte[i, n] = (q[2i+1, n] << 4) | (q[2i, n] & 0xF).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, n_k, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w4 = pltpu.bitcast(p_ref[...], jnp.int4)  # [bk, bn], rows interleaved lo/hi
    acc_ref[...] += jnp.dot(
        x_ref[...], w4.astype(x_ref.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _done():
        o_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)).astype(out_dtype)


def _shrink_bn_for_vmem(bm: int, bn: int, bk: int = 0, act=None,
                        grouped: bool = False) -> int:
    """Wide bn (5120) wins at decode widths (bm<=32: up/down 86->81us measured)
    but overflows the 16MB VMEM budget at prefill widths; shrink it so the
    working set stays within budget. Mirrors the int8 kernel's act-aware
    estimate: double-buffered packed-weight + x tiles, f32 accumulator, out,
    and ~3 extra [bm, bn] f32 temporaries when an activation epilogue lowers
    in-kernel (the gelu-tanh epilogue measured +11MB of Mosaic scoped
    allocation at [256, 2560] on the int8 kernel). The GROUP-wise kernel's
    per-group dot loop keeps ~2 more [bm, bn] f32 partials live (observed:
    16.31M scoped at [256, 5120] bk=1024 g128 — over the 16M stack limit —
    where the per-channel kernel fit)."""
    def ws(bn_):
        est = bk * bn_ + 4 * bm * bk + 6 * bm * bn_  # int4 weight = bk*bn/2 *2buf
        if act is not None:
            est += 12 * bm * bn_
        if grouped:
            est += 8 * bm * bn_
        return est

    while ws(bn) > 14 * 1024 * 1024 and bn > 1024:
        bn //= 2
    return bn


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


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk"))
def quant_matmul_w4_pallas(
    x: jax.Array,  # [M, K] bf16 (K rows match the UNPACKED interleaved order)
    packed: jax.Array,  # [K//2, N] int8, interleaved nibbles along K
    scale: jax.Array,  # [N] f32
    out_dtype=None,
    bm: int = 0,
    bn: int = 0,  # 0 = autotune cache, else 1024
    bk: int = 0,  # 0 = autotune cache, else 1024 (unpacked-K tile; even)
):
    M, K = x.shape
    Kh, N = packed.shape
    assert K == 2 * Kh and scale.shape == (N,)
    out_dtype = out_dtype or x.dtype
    if bm == 0:
        bm = 256 if M >= 256 else max(16, 1 << (max(M - 1, 1)).bit_length())
    if not (bn and bk):
        from .tile_tuning import lookup

        tuned = lookup("w4", bm, K, N)
        bn = bn or (tuned[0] if tuned else 1024)
        bk = bk or (tuned[1] if tuned else 1024)
    # prefer a divisor tile over padding: padding the packed operand copies
    # the whole weight every call (258MB for a 13B int4 LM head)
    if N % 128 == 0:
        bn = _largest_divisor_tile(N, min(bn, N))
    else:
        bn = min(bn, N)
    if K % 256 == 0:
        bk = _largest_divisor_tile(K, min(bk, K), floor=256)
    else:
        bk = min(bk, K)
    bnv = _shrink_bn_for_vmem(bm, bn, bk)
    if bnv != bn:  # prefill-width safety; divisor tile avoids a pad copy
        bn = _largest_divisor_tile(N, bnv) if N % 128 == 0 else bnv

    xp = _pad_to(_pad_to(x, bm, 0), bk, 1)
    pp = _pad_to(_pad_to(packed, bk // 2, 0), bn, 1)
    sp = _pad_to(scale.reshape(1, N), bn, 1)
    Mp, Kp = xp.shape
    Np = pp.shape[1]
    n_k = Kp // bk

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, out_dtype=out_dtype),
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j)),
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
            bytes_accessed=Mp * Kp * 2 + Kp * Np // 2 + Mp * Np * 2,
            transcendentals=0,
        ),
    )(xp, pp, sp)
    return out[:M, :N]


def _epilogue(y: jax.Array, b_ref, act) -> jax.Array:
    """Shared kernel epilogue: f32 bias add + activation.

    Fusing these into the matmul's final grid step removes one whole-XLA-op
    round trip per GEMM (bias/gelu as separate [1, N] fusions measured
    ~2-4us of fixed dispatch each at decode widths — ~200us/step on 13B)."""
    if b_ref is not None:
        y = y + b_ref[0].astype(jnp.float32)
    if act is not None:
        y = apply_act(y, act)
    return y


# Activations the Mosaic lowering can express in a kernel epilogue. Exact-erf
# gelu is NOT here: Pallas TPU has no erf/erfc primitive (checked on v5e,
# jax 0.8 — "Unimplemented primitive ... erf"), so dispatchers must apply it
# as a trailing XLA op instead of fusing it.
PALLAS_FUSABLE_ACTS = frozenset({None, "gelu-tanh", "relu", "silu"})


def apply_act(y: jax.Array, act: str) -> jax.Array:
    """Activation on the f32 partial tile; must mirror models.gptneox._activation
    (the canonical XLA path) bit-for-policy: exact-erf gelu is the HF/CodeFuse
    default."""
    if act == "gelu":
        return jax.nn.gelu(y, approximate=False)
    if act == "gelu-tanh":
        return jax.nn.gelu(y, approximate=True)
    if act == "relu":
        return jax.nn.relu(y)
    if act == "silu":
        return jax.nn.silu(y)
    raise ValueError(f"unknown activation {act!r}")


def _kernel_stacked(l_ref, x_ref, p_ref, s_ref, *rest, n_k, out_dtype, act, has_bias):
    if has_bias:
        b_ref, o_ref, acc_ref = rest
    else:
        b_ref, (o_ref, acc_ref) = None, rest

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w4 = pltpu.bitcast(p_ref[0], jnp.int4)  # [bk, bn], rows interleaved lo/hi
    acc_ref[...] += jnp.dot(
        x_ref[...], w4.astype(x_ref.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _done():
        y = acc_ref[...] * s_ref[0].astype(jnp.float32)
        o_ref[...] = _epilogue(y, b_ref, act).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk", "act"))
def quant_matmul_w4_pallas_stacked(
    x: jax.Array,  # [M, K]
    packed_all: jax.Array,  # [L, K//2, N] int8
    s_all: jax.Array,  # [L, N]
    layer: jax.Array,
    out_dtype=None,
    bm: int = 0,
    bn: int = 0,  # 0 = autotune cache, else 5120
    bk: int = 0,  # 0 = autotune cache, else 2048 (sweep: 76.9us vs 78.5 @1024)
    bias=None,  # [N] per-layer, or [L, 1, N] stacked (indexed in-kernel via
    # the prefetched layer — avoids a per-layer bias slice op per step)
    act: str | None = None,  # fused activation in the epilogue
):
    """Layer-indexed W4 kernel over the stacked weights (see
    quant_matmul.quant_matmul_pallas_stacked for why scalar-prefetch beats a
    sliced operand)."""
    M, K = x.shape
    L, Kh, N = packed_all.shape
    assert K == 2 * Kh and s_all.shape == (L, N)
    out_dtype = out_dtype or x.dtype
    if bm == 0:
        bm = 256 if M >= 256 else max(16, 1 << (max(M - 1, 1)).bit_length())
    if not (bn and bk):
        from .tile_tuning import lookup

        tuned = lookup("stacked_w4", bm, K, N)
        bn = bn or (tuned[0] if tuned else 5120)
        bk = bk or (tuned[1] if tuned else 2048)
    bk = _largest_divisor_tile(K, bk)
    bn = _largest_divisor_tile(N, _shrink_bn_for_vmem(bm, bn, bk, act))
    xp = _pad_to(x, bm, 0)
    Mp = xp.shape[0]
    n_k = K // bk

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k, l_ref: (i, k)),
        pl.BlockSpec((1, bk // 2, bn), lambda i, j, k, l_ref: (l_ref[0], k, j)),
        pl.BlockSpec((1, 1, bn), lambda i, j, k, l_ref: (l_ref[0], 0, j)),
    ]
    operands = [xp, packed_all, s_all.reshape(L, 1, N)]
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
            bytes_accessed=Mp * K * 2 + K * N // 2 + Mp * N * 2,
            transcendentals=0,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    return out[:M]


def _kernel_stacked_group(
    l_ref, x_ref, p_ref, s_ref, *rest, n_k, G, out_dtype, act, has_bias
):
    if has_bias:
        b_ref, o_ref, acc_ref = rest
    else:
        b_ref, (o_ref, acc_ref) = None, rest

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # one dot per K-group, scale applied on the [bm, bn] partial sum — the
    # group scale is per (group, out-channel), so it commutes out of each
    # group's contraction; multiplying the small partial sum is G x cheaper
    # than scaling the [bk, bn] weight tile
    w4 = pltpu.bitcast(p_ref[0], jnp.int4)  # [bk, bn]
    bk = w4.shape[0]
    for g in range(bk // G):
        part = jnp.dot(
            x_ref[:, g * G : (g + 1) * G],
            w4[g * G : (g + 1) * G].astype(x_ref.dtype),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] += part * s_ref[0][g][None, :].astype(jnp.float32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _done():
        o_ref[...] = _epilogue(acc_ref[...], b_ref, act).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("G", "out_dtype", "bm", "bn", "bk", "act")
)
def quant_matmul_w4_group_stacked(
    x: jax.Array,  # [M, K]
    packed_all: jax.Array,  # [L, K//2, N] int8
    s_all: jax.Array,  # [L, K//G, N]
    layer: jax.Array,
    G: int,
    out_dtype=None,
    bm: int = 0,
    bn: int = 0,  # 0 = autotune cache, else 5120
    bk: int = 0,  # 0 = autotune cache, else 1024
    bias=None,  # [N] per-layer or [L, 1, N] stacked (see the per-channel kernel)
    act: str | None = None,  # fused activation in the epilogue
):
    """Group-wise-scale W4 kernel: the scale applies inside the contraction,
    so it folds into the weight tile on the VPU before the MXU pass (an
    epilogue multiply would be wrong across K-groups)."""
    M, K = x.shape
    L, Kh, N = packed_all.shape
    assert K == 2 * Kh and s_all.shape == (L, K // G, N)
    out_dtype = out_dtype or x.dtype
    if bm == 0:
        bm = 256 if M >= 256 else max(16, 1 << (max(M - 1, 1)).bit_length())
    if not (bn and bk):
        from .tile_tuning import lookup

        tuned = lookup("stacked_w4g", bm, K, N, G)
        bn = bn or (tuned[0] if tuned else 5120)
        bk = bk or (tuned[1] if tuned else 1024)
    bk = _largest_divisor_tile(K, bk)
    bn = _largest_divisor_tile(
        N, _shrink_bn_for_vmem(bm, bn, bk, act, grouped=True)
    )
    assert bk % G == 0, f"k-tile {bk} must hold whole groups of {G}"
    xp = _pad_to(x, bm, 0)
    Mp = xp.shape[0]
    n_k = K // bk

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k, l_ref: (i, k)),
        pl.BlockSpec((1, bk // 2, bn), lambda i, j, k, l_ref: (l_ref[0], k, j)),
        pl.BlockSpec((1, bk // G, bn), lambda i, j, k, l_ref: (l_ref[0], k, j)),
    ]
    operands = [xp, packed_all, s_all]
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
            _kernel_stacked_group, n_k=n_k, G=G, out_dtype=out_dtype, act=act,
            has_bias=bias is not None,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * 2 + K * N // 2
            + K * N // G * s_all.dtype.itemsize + Mp * N * 2,
            transcendentals=0,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    return out[:M]
