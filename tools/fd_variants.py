"""Isolate flash-decode kernel costs: DMA-only, +convert, +scores, full.

  python tools/fd_variants.py --S 1088 --bs 512
"""
import argparse
import functools
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

L = 8
HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=1088)
    ap.add_argument("--bs", type=int, default=512)
    ap.add_argument("--hb", type=int, default=8)
    ap.add_argument("--which", default="dma,conv,scores,scores_bf16,full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fastertransformer4codefuse_tpu.utils.profiling import summarize_trace, trace

    B, nH, dh = 1, 40, 128
    S, bs, hb = args.S, args.bs, args.hb
    rng = np.random.default_rng(0)
    k_all = jnp.asarray(rng.integers(-127, 128, (L, B, nH, S, dh)), jnp.int8)
    v_all = jnp.asarray(rng.integers(-127, 128, (L, B, nH, S, dh)), jnp.int8)
    q = jnp.asarray(rng.standard_normal((B, nH, dh)), jnp.bfloat16)
    positions = jnp.full((B,), S - 16, jnp.int32)
    n_s = -(-S // bs)
    nbytes = 2 * B * nH * S * dh
    sol_us = nbytes / HBM_GBPS / 1e3

    def build(body, n_out_dh=dh):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nH // hb, n_s),
            in_specs=[
                pl.BlockSpec((1, hb, dh), lambda b, h, s, sr: (b, h, 0)),
                pl.BlockSpec((1, 1, hb, bs, dh), lambda b, h, s, sr: (sr[0], b, h, s, 0)),
                pl.BlockSpec((1, 1, hb, bs, dh), lambda b, h, s, sr: (sr[0], b, h, s, 0)),
            ],
            out_specs=pl.BlockSpec((1, hb, n_out_dh), lambda b, h, s, sr: (b, h, 0)),
            scratch_shapes=[
                pltpu.VMEM((hb, 128), jnp.float32),
                pltpu.VMEM((hb, 128), jnp.float32),
                pltpu.VMEM((hb, dh), jnp.float32),
            ],
        )

        def call(l):
            scalars = jnp.concatenate(
                [jnp.asarray(l, jnp.int32).reshape(1), positions]
            )
            return pl.pallas_call(
                body,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((B, hb * (nH // hb), n_out_dh), jnp.bfloat16)
                if False
                else jax.ShapeDtypeStruct((B, nH, n_out_dh), jnp.bfloat16),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary"),
                ),
            )(scalars, q, k_all, v_all)

        return call

    def body_dma(sr, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        s = pl.program_id(2)
        @pl.when(s == n_s - 1)
        def _():
            o_ref[0] = (
                k_ref[0, 0, :, :1, :].astype(jnp.float32)
                + v_ref[0, 0, :, :1, :].astype(jnp.float32)
            )[:, 0, :].astype(o_ref.dtype)

    def body_conv(sr, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        s = pl.program_id(2)
        kf = k_ref[0, 0].astype(jnp.float32)
        vf = v_ref[0, 0].astype(jnp.float32)
        acc_ref[...] += jnp.sum(kf, axis=1) + jnp.sum(vf, axis=1)  # sublane reduce
        @pl.when(s == n_s - 1)
        def _():
            o_ref[0] = acc_ref[...].astype(o_ref.dtype)

    def body_scores(sr, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        s = pl.program_id(2)
        qf = q_ref[0].astype(jnp.float32)
        kf = k_ref[0, 0].astype(jnp.float32)
        scores = jnp.sum(qf[:, None, :] * kf, axis=-1)  # [hb, bs] lane reduce
        vf = v_ref[0, 0].astype(jnp.float32)
        acc_ref[...] += jnp.sum(vf, axis=1)
        m_ref[...] += jnp.max(scores, axis=1, keepdims=True)
        @pl.when(s == n_s - 1)
        def _():
            o_ref[0] = (acc_ref[...] + m_ref[:, :1]).astype(o_ref.dtype)

    def body_scores_bf16(sr, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        s = pl.program_id(2)
        qb = q_ref[0]
        kb = k_ref[0, 0].astype(jnp.bfloat16)
        scores = jnp.sum(qb[:, None, :] * kb, axis=-1).astype(jnp.float32)
        vf = v_ref[0, 0].astype(jnp.float32)
        acc_ref[...] += jnp.sum(vf, axis=1)
        m_ref[...] += jnp.max(scores, axis=1, keepdims=True)
        @pl.when(s == n_s - 1)
        def _():
            o_ref[0] = (acc_ref[...] + m_ref[:, :1]).astype(o_ref.dtype)

    def body_full_batched(sr, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        """Full online-softmax, all hb heads batched: one batched dot for
        scores, one exp on [hb, bs], one batched dot for pv."""
        s = pl.program_id(2)
        pos = sr[1]

        @pl.when(s == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, -1e30)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        kf = k_ref[0, 0].astype(jnp.bfloat16)  # [hb, bs, dh]
        vf = v_ref[0, 0].astype(jnp.bfloat16)
        qb = q_ref[0].astype(jnp.bfloat16)  # [hb, dh]
        scores = jax.lax.dot_general(
            qb[:, None, :], kf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # [hb, bs]
        col = jax.lax.broadcasted_iota(jnp.int32, (hb, bs), 1) + s * bs
        scores = jnp.where(col <= pos, scores * 0.088, -1e30)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16)[:, None, :], vf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # [hb, dh]
        acc_ref[...] = alpha * acc_ref[...] + pv
        m_ref[:, :1] = m_new
        l_ref[:, :1] = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)

        @pl.when(s == n_s - 1)
        def _done():
            o_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-20)).astype(o_ref.dtype)

    from fastertransformer4codefuse_tpu.ops.flash_decode import flash_decode_stacked

    def full_call(l):
        return flash_decode_stacked(
            q, k_all, None, v_all, None, l, positions,
            sm_scale=1.0 / np.sqrt(dh), hb=hb, bs=bs,
        )

    variants = {
        "dma": build(body_dma),
        "conv": build(body_conv),
        "scores": build(body_scores),
        "scores_bf16": build(body_scores_bf16),
        "full_batched": build(body_full_batched),
        "full": full_call,
    }
    which = args.which.split(",")
    print(f"== S={S} bs={bs} hb={hb} int8-payload SoL={sol_us:.1f}us")
    for name, call in variants.items():
        if name not in which:
            continue
        @jax.jit
        def many(call=call):
            # fori_loop: ONE kernel instance compiled (8 unrolled instances
            # measured ~200s of remote compile through the axon tunnel)
            def body(l, acc):
                return acc + call(l)[0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, L, body, jnp.float32(0))

        try:
            float(many())
            tdir = "/tmp/fd_var"
            shutil.rmtree(tdir, ignore_errors=True)
            with trace(tdir):
                float(many())
            rows = summarize_trace(tdir, top=8 * L)
            tot = sum(ms for _, ms, _, _ in rows)
            t_us = tot / L * 1000
            print(f"  {name:12s}: {t_us:7.1f}us  ({sol_us/t_us*100:4.0f}% SoL)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:12s}: FAIL {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
