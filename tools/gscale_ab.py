"""A/B: f32 vs bf16 group scales for the stacked W4 group kernel.

Differential timing (N vs 3N iterations inside one jit) — the axon tunnel's
~30ms sync floor cancels in the delta. Usage:

  python tools/gscale_ab.py [--shapes qkv,up,down,proj] [--iters 200]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from fastertransformer4codefuse_tpu.utils.compile_cache import enable as _cc
_cc()

L = 8
HBM_GBPS = 819.0
SHAPES = {
    "qkv": (5120, 15360),
    "proj": (5120, 5120),
    "up": (5120, 20480),
    "down": (20480, 5120),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="qkv,up,down,proj")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--bm", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.ops.quant_matmul_w4 import (
        quant_matmul_w4_group_stacked,
    )

    G = 128
    rng = np.random.default_rng(0)
    for name in args.shapes.split(","):
        K, N = SHAPES[name]
        packed = jnp.asarray(rng.integers(-128, 128, (L, K // 2, N), np.int8))
        s32 = jnp.asarray(rng.random((L, K // G, N), np.float32) * 0.01)
        x = jnp.asarray(rng.random((args.bm, K), np.float32), jnp.bfloat16)
        w_sol = K * N * 0.5 / HBM_GBPS / 1e3

        for sdt in ("f32", "bf16"):
            s = s32 if sdt == "f32" else s32.astype(jnp.bfloat16)
            sbytes = K * N // G * (4 if sdt == "f32" else 2)
            sol = w_sol + sbytes / HBM_GBPS / 1e3

            def make_loop(iters):
                @jax.jit
                def loop(ops):
                    x_, p_, s_ = ops

                    def body(i, acc):
                        y = quant_matmul_w4_group_stacked(
                            x_, p_, s_, i % L, G=G
                        )
                        return acc + y[0, 0].astype(jnp.float32)

                    return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

                return loop

            l1, l3 = make_loop(args.iters), make_loop(3 * args.iters)
            ops = (x, packed, s)
            float(l1(ops)); float(l3(ops))
            samples = []
            for _ in range(3):
                t0 = time.perf_counter(); float(l1(ops)); t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); float(l3(ops)); t3 = time.perf_counter() - t0
                t = (t3 - t1) / (2 * args.iters) * 1e6
                if t > 0.6 * w_sol:
                    samples.append(t)
                if len(samples) >= 2:
                    break
            t = sorted(samples)[len(samples) // 2] if samples else float("nan")
            print(f"  {name:5s} {sdt:4s}: {t:7.1f}us  (SoL w+s {sol:5.1f}us, "
                  f"{sol/t*100:3.0f}%)", flush=True)


if __name__ == "__main__":
    main()
