"""Group-scale W4 kernel formulations, wall-clock timed with in-jit repetition.

The axon tunnel costs ~30ms per host sync, so each variant runs L layers x R
reps inside ONE jit and we divide wall time by L*R. Variants:

  cur    — shipping kernel: one dot per K-group, scale applied on the partial
  wscale — scale the dequantized bf16 weight tile ([bk/G, G, bn] * s), one dot
  wscale32 — same but scale in f32 then cast to bf16 (precision probe)
  vsum   — per-group dots summed in registers, single acc_ref update
  batched — one dot_general with the group axis as a batch dim, then a
            scale-weighted reduce over groups

Usage: python tools/w4g_variants2.py [--shape up] [--bk 1024] [--bn 5120]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

L = int(os.environ.get("NLAYERS", "8"))
R = int(os.environ.get("REPS", "20"))
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
    ap.add_argument("--bk", type=int, default=1024)
    ap.add_argument("--bn", type=int, default=5120)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fastertransformer4codefuse_tpu.ops.quant_matmul_w4 import (
        quant_matmul_w4_group_stacked,
    )

    K, N = SHAPES[args.shape]
    G = 128
    bm, bk, bn = args.bm, args.bk, min(args.bn, N)
    sol_us = K * N * 0.5 / HBM_GBPS / 1e3
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(-128, 128, size=(L, K // 2, N), dtype=np.int8))
    gscale = jnp.asarray(rng.random((L, K // G, N), np.float32) * 0.01)
    x = jnp.asarray(rng.random((bm, K), np.float32), jnp.bfloat16)

    def make(body):
        n_k = K // bk
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, N // bn, n_k),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k, l_ref: (i, k)),
                pl.BlockSpec((1, bk // 2, bn), lambda i, j, k, l_ref: (l_ref[0], k, j)),
                pl.BlockSpec((1, bk // G, bn), lambda i, j, k, l_ref: (l_ref[0], k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l_ref: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        )

        def call(xx, pp, ss, l):
            return pl.pallas_call(
                functools.partial(body, n_k=n_k),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary"),
                ),
                cost_estimate=pl.CostEstimate(
                    flops=2 * bm * N * K,
                    bytes_accessed=bm * K * 2 + K * N // 2 + K * N // G * 4 + bm * N * 2,
                    transcendentals=0,
                ),
            )(jnp.asarray(l, jnp.int32).reshape(1), xx, pp, ss)

        return call

    def body_wscale(l_ref, x_ref, p_ref, s_ref, o_ref, acc_ref, *, n_k):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w4 = pltpu.bitcast(p_ref[0], jnp.int4)  # [bk, bn]
        wf = w4.astype(jnp.bfloat16).reshape(bk // G, G, bn)
        wf = (wf * s_ref[0][:, None, :].astype(jnp.bfloat16)).reshape(bk, bn)
        acc_ref[...] += jnp.dot(x_ref[...], wf, preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(2) == n_k - 1)
        def _done():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    def body_wscale32(l_ref, x_ref, p_ref, s_ref, o_ref, acc_ref, *, n_k):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w4 = pltpu.bitcast(p_ref[0], jnp.int4)
        wf = w4.astype(jnp.float32).reshape(bk // G, G, bn)
        wf = (wf * s_ref[0][:, None, :]).reshape(bk, bn).astype(jnp.bfloat16)
        acc_ref[...] += jnp.dot(x_ref[...], wf, preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(2) == n_k - 1)
        def _done():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    def body_vsum(l_ref, x_ref, p_ref, s_ref, o_ref, acc_ref, *, n_k):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w4 = pltpu.bitcast(p_ref[0], jnp.int4)
        tot = None
        for g in range(bk // G):
            part = jnp.dot(
                x_ref[:, g * G : (g + 1) * G],
                w4[g * G : (g + 1) * G].astype(x_ref.dtype),
                preferred_element_type=jnp.float32,
            ) * s_ref[0][g][None, :].astype(jnp.float32)
            tot = part if tot is None else tot + part
        acc_ref[...] += tot

        @pl.when(pl.program_id(2) == n_k - 1)
        def _done():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    def body_batched(l_ref, x_ref, p_ref, s_ref, o_ref, acc_ref, *, n_k):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        ng = bk // G
        w4 = pltpu.bitcast(p_ref[0], jnp.int4)
        wg = w4.astype(x_ref.dtype).reshape(ng, G, bn)
        xg = x_ref[...].reshape(bm, ng, G).transpose(1, 0, 2)  # [ng, bm, G]
        parts = jax.lax.dot_general(
            xg, wg,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [ng, bm, bn]
        acc_ref[...] += jnp.sum(
            parts * s_ref[0][:, None, :].astype(jnp.float32), axis=0
        )

        @pl.when(pl.program_id(2) == n_k - 1)
        def _done():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    variants = {
        "cur": lambda xx, pp, ss, l: quant_matmul_w4_group_stacked(
            xx, pp, ss, l, G=G, bk=bk, bn=bn
        ),
        "wscale": make(body_wscale),
        "wscale32": make(body_wscale32),
        "vsum": make(body_vsum),
        "batched": make(body_batched),
    }
    if args.only:
        keep = args.only.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    print(f"== {args.shape} [{K}x{N}] bm={bm} bk={bk} bn={bn} SoL={sol_us:.1f}us")
    ref = None
    for name, call in variants.items():
        @jax.jit
        def many(xx, pp, ss, call=call):
            def step(c, l):
                y = call(xx, pp, ss, l % L)
                return c + y[0, 0].astype(jnp.float32), None
            c, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                jnp.arange(L * R, dtype=jnp.int32))
            return c

        try:
            y = np.asarray(call(x, packed, gscale, 0), np.float32)
            if ref is None:
                ref = y
            err = float(np.max(np.abs(y - ref)))
            rel = err / max(float(np.max(np.abs(ref))), 1e-9)
            float(many(x, packed, gscale))  # compile + warm
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(many(x, packed, gscale))
                best = min(best, time.perf_counter() - t0)
            t_us = best / (L * R) * 1e6
            print(f"  {name:9s}: {t_us:7.1f}us  ({sol_us/t_us*100:4.0f}% SoL)  "
                  f"relerr={rel:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:9s}: FAIL {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
