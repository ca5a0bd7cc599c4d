"""Tile sweep for the fused-pair decode kernels at 13B decode shapes.

Times fused_qkv_up / fused_proj_down over (bk, bn) and compares against the
sum of the separate stacked kernels (the unmerged path) and each pair's DMA
floor. Arrays are passed as jit ARGS (closed-over slabs become HLO constants
and blow the axon remote-compile request limit).

  python tools/fused_sweep.py [--bits 4] [--L 8] [--M 1]
"""
import argparse
import functools
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

H, F, NQKV = 5120, 20480, 15360
HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--M", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.ops.quant_matmul_fused import (
        fused_proj_down, fused_qkv_up,
    )
    from fastertransformer4codefuse_tpu.ops.quant_matmul import (
        quant_matmul_pallas_stacked,
    )
    from fastertransformer4codefuse_tpu.ops.quant_matmul_w4 import (
        quant_matmul_w4_pallas_stacked,
    )
    from fastertransformer4codefuse_tpu.utils.profiling import summarize_trace, trace

    L, M, bits = args.L, args.M, args.bits
    pack = 2 if bits == 4 else 1
    rng = np.random.default_rng(0)

    def mk(k, n):
        return (
            jnp.asarray(rng.integers(-128, 128, (L, k // pack, n)), jnp.int8),
            jnp.asarray(rng.random((L, n)) * 0.01, jnp.float32),
            jnp.asarray(rng.standard_normal((L, 1, n)), jnp.float32),
        )

    qkv_q, qkv_s, qkv_b = mk(H, NQKV)
    up_q, up_s, up_b = mk(H, F)
    proj_q, proj_s, _ = mk(H, H)
    down_q, down_s, down_b = mk(F, H)
    x_h = jnp.asarray(rng.standard_normal((M, H)), jnp.bfloat16)
    x_f = jnp.asarray(rng.standard_normal((M, F)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((M, H)), jnp.bfloat16)

    wbytes_a = H * (NQKV + F) // pack
    wbytes_b = (H + F) * H // pack
    print(f"bits={bits}  A(qkv+up) SoL={wbytes_a/HBM_GBPS/1e3:.1f}us  "
          f"B(proj+down) SoL={wbytes_b/HBM_GBPS/1e3:.1f}us")

    def timed(name, fn, *arrays):
        @functools.partial(jax.jit)
        def many(*ops):
            acc = jnp.zeros((), jnp.float32)
            for l in range(L):
                acc = acc + fn(jnp.int32(l), *ops).astype(jnp.float32)
            return acc

        try:
            float(many(*arrays))
        except Exception as e:
            print(f"  {name:28s} FAIL {type(e).__name__}: {str(e)[:90]}")
            return
        tdir = "/tmp/fused_sweep"
        shutil.rmtree(tdir, ignore_errors=True)
        with trace(tdir):
            float(many(*arrays))
        rows = summarize_trace(tdir, top=40)
        kern = sum(ms for n, ms, _, _ in rows if "fused" in n or "quant_matmul" in n)
        print(f"  {name:28s} {kern/L*1000:7.1f}us/layer")

    stacked = (
        quant_matmul_w4_pallas_stacked if bits == 4 else quant_matmul_pallas_stacked
    )

    # unmerged baselines
    timed(
        "separate qkv+up",
        lambda l, xq, q1, s1, q2, s2: stacked(xq, q1, s1, l)[0, 0]
        + stacked(xq, q2, s2, l)[0, 0],
        x_h, qkv_q, qkv_s, up_q, up_s,
    )
    timed(
        "separate proj+down",
        lambda l, xh, xf, q1, s1, q2, s2: stacked(xh, q1, s1, l)[0, 0]
        + stacked(xf, q2, s2, l)[0, 0],
        x_h, x_f, proj_q, proj_s, down_q, down_s,
    )

    for bk in (1024, 2048, 2560):
        for bn in (1280, 2560, 5120):
            if NQKV % bn or F % bn:
                continue
            timed(
                f"fused qkv+up bk={bk} bn={bn}",
                lambda l, x1, x2, p1, p2, s1, s2, b1, b2, bk=bk, bn=bn: fused_qkv_up(
                    x1, x2, p1, p2, s1, s2, b1, b2, l, bits=bits,
                    bk=bk, bn=bn,
                )[0, 0],
                x_h, x_h, qkv_q, up_q, qkv_s, up_s, qkv_b, up_b,
            )
    for bk in (640, 1280, 2560):
        for bn in (1280, 2560, 5120):
            if H % bn:
                continue
            timed(
                f"fused proj+down bk={bk} bn={bn}",
                lambda l, x1, x2, p1, p2, s1, s2, b, r, bk=bk, bn=bn: fused_proj_down(
                    x1, x2, p1, p2, s1, s2, b, r, l, bits=bits,
                    bk=bk, bn=bn,
                )[0, 0],
                x_h, x_f, proj_q, down_q, proj_s, down_s, down_b, res,
            )


if __name__ == "__main__":
    main()
