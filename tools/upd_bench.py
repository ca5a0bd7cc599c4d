"""Mega-kernel microbench: fused_up_proj_down vs the split pair on the chip.

Times the whole post-attention decode block (FFN up + act + proj + down +
residual) at CodeFuse-13B shapes: the mega kernel streams all three weights
through ONE pipeline ramp; the split path pays the up kernel's ramp + the
proj+down kernel's ramp + an extra dispatch + an HBM round-trip of the
[M, F] hidden.

Usage: python tools/upd_bench.py [--iters 200] [--bits 4] [--G 0]
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

L = 40
H, F = 5120, 20480
HBM_GBPS = 819.0


def timed(fn, iters, *args):
    @jax.jit
    def loop(args):
        def body(i, acc):
            y = fn(i % L, *args)
            return acc + y[0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(args))
    t0 = time.perf_counter()
    float(loop(args))
    return (time.perf_counter() - t0) / iters


def run_config(bits, G, args):
    from fastertransformer4codefuse_tpu.ops.quant_matmul_fused import (
        fused_proj_down,
        fused_up_proj_down,
    )
    from fastertransformer4codefuse_tpu.ops.quant_matmul import (
        quant_matmul_pallas_stacked,
    )
    from fastertransformer4codefuse_tpu.ops.quant_matmul_w4 import (
        quant_matmul_w4_group_stacked,
        quant_matmul_w4_pallas_stacked,
    )
    pack = 2 if bits == 4 else 1
    rng = np.random.default_rng(0)

    def payload(K, N):
        return jnp.asarray(rng.integers(-128, 128, (L, K // pack, N)), jnp.int8)

    def scales(K, N):
        shape = (L, N) if not G else (L, K // G, N)
        return jnp.asarray(rng.random(shape) * 0.01, jnp.float32)

    p_up, p_proj, p_down = payload(H, F), payload(H, H), payload(F, H)
    s_up, s_proj, s_down = scales(H, F), scales(H, H), scales(F, H)
    b_up = jnp.asarray(rng.standard_normal((L, 1, F)) * 0.01, jnp.float32)
    b_down = jnp.asarray(rng.standard_normal((L, 1, H)) * 0.01, jnp.float32)
    x_up = jnp.asarray(rng.standard_normal((1, H)), jnp.bfloat16)
    x_proj = jnp.asarray(rng.standard_normal((1, H)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((1, H)), jnp.bfloat16)

    total_mb = (H * F + H * H + F * H) // pack / 1e6
    sol = total_mb * 1e6 / HBM_GBPS / 1e3
    print(f"bits={bits} G={G}  bytes/layer={total_mb:.1f}MB  SoL={sol:.1f}us")

    t = timed(
        lambda l, *a: fused_up_proj_down(
            *a, l, bits=bits, G=G, act="gelu-tanh",
            bku=args.bku, bkp=args.bkp, bkd=args.bkd, vmem_mb=args.vmem,
        ),
        args.iters,
        x_up, x_proj, res, p_up, p_proj, p_down, s_up, s_proj, s_down,
        b_up, b_down,
    )
    gbps = total_mb * 1e6 / t / 1e9
    print(f"  mega up+proj+down: {t*1e6:8.1f}us  {gbps:6.0f} GB/s  ({sol/(t*1e6)*100:.0f}% SoL)")

    # split path: stacked up kernel + fused proj+down
    if bits == 4 and G:
        up_fn = lambda l, x, p, s, b: quant_matmul_w4_group_stacked(
            x, p, s, l, G=G, bias=b, act="gelu-tanh"
        )
    elif bits == 4:
        up_fn = lambda l, x, p, s, b: quant_matmul_w4_pallas_stacked(
            x, p, s, l, bias=b, act="gelu-tanh"
        )
    else:
        up_fn = lambda l, x, p, s, b: quant_matmul_pallas_stacked(
            x, p, s, l, bias=b, act="gelu-tanh"
        )

    def split(l, x_up, x_proj, res, p_up, p_proj, p_down, s_up, s_proj,
              s_down, b_up, b_down):
        h = up_fn(l, x_up, p_up, s_up, b_up)
        return fused_proj_down(
            x_proj, h, p_proj, p_down, s_proj, s_down, b_down, res, l,
            bits=bits, G=G,
        )

    t2 = timed(
        split, args.iters,
        x_up, x_proj, res, p_up, p_proj, p_down, s_up, s_proj, s_down,
        b_up, b_down,
    )
    gbps2 = total_mb * 1e6 / t2 / 1e9
    print(f"  split up | proj+down: {t2*1e6:8.1f}us  {gbps2:6.0f} GB/s  ({sol/(t2*1e6)*100:.0f}% SoL)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--configs", default="4:0", help="comma list of bits:G")
    ap.add_argument("--bku", type=int, default=0)
    ap.add_argument("--bkp", type=int, default=0)
    ap.add_argument("--bkd", type=int, default=0)
    ap.add_argument("--vmem", type=int, default=64)
    args = ap.parse_args()
    for case in args.configs.split(","):
        bits, G = map(int, case.split(":"))
        run_config(bits, G, args)


if __name__ == "__main__":
    main()
