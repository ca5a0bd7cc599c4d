"""Sweep Pallas tile shapes for the stacked W4 decode GEMMs.

Times each variant by tracing an UNROLLED 40-layer jit (one pallas call per
layer) and reading per-op device times from the xprof summary — immune to
fori_loop/dispatch overhead, matches what the engine sees inside its scan.

  python tools/tile_sweep.py --shape up --bm 16
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

L = 8  # instances; enough layers to amortize, keeps compile time sane
SHAPES = {
    "qkv": (5120, 15360),
    "proj": (5120, 5120),
    "up": (5120, 20480),
    "down": (20480, 5120),
}
HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="up")
    ap.add_argument("--bm", type=int, default=16)
    ap.add_argument("--kernel", default="w4g", choices=["w4", "w4g", "w8"])
    ap.add_argument("--tiles", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.ops.quant_matmul_w4 import (
        quant_matmul_w4_group_stacked,
        quant_matmul_w4_pallas_stacked,
    )
    from fastertransformer4codefuse_tpu.ops.quant_matmul import (
        quant_matmul_pallas_stacked,
    )
    from fastertransformer4codefuse_tpu.utils.profiling import summarize_trace, trace

    K, N = SHAPES[args.shape]
    itemsize = 0.5 if args.kernel.startswith("w4") else 1.0
    sol_us = K * N * itemsize / HBM_GBPS / 1e3
    rng = np.random.default_rng(0)
    if args.kernel.startswith("w4"):
        packed = jnp.asarray(rng.integers(-128, 128, size=(L, K // 2, N), dtype=np.int8))
    else:
        packed = jnp.asarray(rng.integers(-128, 128, size=(L, K, N), dtype=np.int8))
    if args.kernel == "w4g":
        scale = jnp.asarray(rng.random((L, K // 128, N), np.float32) * 0.01)
    else:
        scale = jnp.asarray(rng.random((L, N), np.float32) * 0.01)
    x = jnp.asarray(rng.random((args.bm, K), np.float32), jnp.bfloat16)

    if args.tiles:
        tiles = [tuple(map(int, t.split("x"))) for t in args.tiles.split(",")]
    else:
        tiles = [
            (1024, 2560),  # round-1 default
            (2048, 2560),
            (1024, 5120),
            (2560, 2048),
            (2560, 4096),
            (5120, 2048),
            (5120, 1024),
        ]

    print(f"== {args.shape} [{K}x{N}] {args.kernel} bm={args.bm} SoL={sol_us:.1f}us")
    for bk, bn in tiles:
        if K % bk or N % bn or bk % 256:
            print(f"  bk={bk:5d} bn={bn:5d}: skip (not a divisor)")
            continue

        def call(xx, pp, ss, l):
            if args.kernel == "w4g":
                return quant_matmul_w4_group_stacked(xx, pp, ss, l, G=128, bk=bk, bn=bn)
            if args.kernel == "w4":
                return quant_matmul_w4_pallas_stacked(xx, pp, ss, l, bk=bk, bn=bn)
            return quant_matmul_pallas_stacked(xx, pp, ss, l, bk=bk, bn=bn)

        @jax.jit
        def many(xx, pp, ss):
            acc = jnp.zeros((), jnp.float32)
            for l in range(L):
                acc = acc + call(xx, pp, ss, l)[0, 0].astype(jnp.float32)
            return acc

        try:
            float(many(x, packed, scale))  # compile+warm
            tdir = "/tmp/tile_sweep"
            shutil.rmtree(tdir, ignore_errors=True)
            with trace(tdir):
                float(many(x, packed, scale))
            rows = summarize_trace(tdir, top=3 * L)
            hits = [(ms, cnt) for name, ms, cnt, _ in rows if "quant_matmul" in name]
            t_us = sum(ms for ms, _ in hits) / max(sum(c for _, c in hits), 1) * 1000
            print(f"  bk={bk:5d} bn={bn:5d}: {t_us:7.1f}us  ({sol_us/t_us*100:4.0f}% SoL)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  bk={bk:5d} bn={bn:5d}: FAIL {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
