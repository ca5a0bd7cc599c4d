"""Per-kernel decode-GEMM microbenchmark on the real chip.

Times the stacked W4/W8 Pallas kernels at the CodeFuse-13B decode shapes and
compares against a pure-DMA speed-of-light kernel that streams the same bytes.
All timing loops run INSIDE one jit (lax.fori_loop cycling the layer index) —
the axon tunnel's sync floor (~30ms) forbids per-op timing.

Usage: python tools/kernel_bench.py [--iters 200] [--bm 16] [--quick]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fastertransformer4codefuse_tpu.utils.compile_cache import enable as _cc
_cc()  # persistent XLA cache: recompiles of unchanged programs become instant
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 40  # CodeFuse-13B layers
SHAPES = {
    "qkv": (5120, 15360),
    "proj": (5120, 5120),
    "up": (5120, 20480),
    "down": (20480, 5120),
}
HBM_GBPS = 819.0  # v5e


def _dma_kernel(l_ref, p_ref, o_ref):
    # the pipeline DMAs the whole block regardless; touch one row only so
    # compute is ~free and the timing isolates the HBM stream
    o_ref[...] = jnp.sum(p_ref[0, :1, :128].astype(jnp.int32)).reshape(1, 1)


def dma_baseline(packed_all, layer, bk=1024, bn=2560):
    """Stream one layer's packed bytes through the grid pipeline, no math."""
    Lq, Kh, N = packed_all.shape
    bn = min(bn, N)
    bk2 = min(bk // 2, Kh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // bn, Kh // bk2),
        in_specs=[
            pl.BlockSpec((1, bk2, bn), lambda j, k, l_ref: (l_ref[0], k, j)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda j, k, l_ref: (0, 0)),
    )
    return pl.pallas_call(
        _dma_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), packed_all)


def timed(fn, iters, *args):
    """fn(layer, *args) -> array; run iters times inside one jit, cycling layer."""

    @jax.jit
    def loop(args):
        def body(i, acc):
            y = fn(i % L, *args)
            return acc + y[0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(args))  # compile + warm (scalar fetch = real sync on axon)
    t0 = time.perf_counter()
    float(loop(args))
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--bm", type=int, default=1)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--kernels", default="dma,w4,w4g")
    ap.add_argument("--bk", type=int, default=1024)
    ap.add_argument("--bn", type=int, default=2560)
    args = ap.parse_args()

    from fastertransformer4codefuse_tpu.ops.quant_matmul_w4 import (
        quant_matmul_w4_group_stacked,
        quant_matmul_w4_pallas_stacked,
    )

    shapes = dict(list(SHAPES.items())[:1]) if args.quick else SHAPES
    kernels = args.kernels.split(",")
    rng = np.random.default_rng(0)
    for name, (K, N) in shapes.items():
        packed = jnp.asarray(
            rng.integers(-128, 128, size=(L, K // 2, N), dtype=np.int8)
        )
        scale = jnp.asarray(rng.random((L, N), np.float32) * 0.01)
        gscale = jnp.asarray(rng.random((L, K // 128, N), np.float32) * 0.01)
        x = jnp.asarray(rng.random((args.bm, K), np.float32), jnp.bfloat16)
        sol_us = packed[0].size / HBM_GBPS / 1e3
        print(f"== {name} [{K}x{N}] int4 bytes/layer={packed[0].size/1e6:.1f}MB SoL={sol_us:.1f}us")
        if "dma" in kernels:
            t = timed(
                lambda l, p: dma_baseline(p, l, bk=args.bk, bn=args.bn),
                args.iters, packed,
            )
            print(f"  dma-baseline: {t*1e6:8.1f}us  ({sol_us/(t*1e6)*100:.0f}% SoL)")
        if "w4" in kernels:
            t = timed(
                lambda l, x_, p, s: quant_matmul_w4_pallas_stacked(
                    x_, p, s, l, bk=args.bk, bn=args.bn
                ),
                args.iters, x, packed, scale,
            )
            print(f"  w4-perchan  : {t*1e6:8.1f}us  ({sol_us/(t*1e6)*100:.0f}% SoL)")
        if "w4g" in kernels:
            t = timed(
                lambda l, x_, p, s: quant_matmul_w4_group_stacked(
                    x_, p, s, l, G=128, bk=args.bk, bn=args.bn
                ),
                args.iters, x, packed, gscale,
            )
            print(f"  w4-group128 : {t*1e6:8.1f}us  ({sol_us/(t*1e6)*100:.0f}% SoL)")


if __name__ == "__main__":
    main()
