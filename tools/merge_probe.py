"""Probe: is merging decode GEMMs into one pallas_call a win?

Times (a) two separate stacked W4 calls (proj 5120->5120 + down 20480->5120)
vs (b) one call over the K-concatenated [25600, 5120] weight, and likewise
(c) qkv + up as two calls vs (d) one N-concatenated [5120, 35840] call.
Uses the existing kernels with offline-concatenated weights; per-channel
scales only (the segment-scale question is handled by the real merged kernel).

  python tools/merge_probe.py
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

L = 8
H, F = 5120, 20480
NQKV = 15360


def main():
    import jax
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.ops.quant_matmul_w4 import (
        quant_matmul_w4_pallas_stacked,
    )
    from fastertransformer4codefuse_tpu.utils.profiling import summarize_trace, trace

    rng = np.random.default_rng(0)

    def mk(k, n):
        return (
            jnp.asarray(rng.integers(-128, 128, (L, k // 2, n)), jnp.int8),
            jnp.asarray(rng.random((L, n)) * 0.01, jnp.float32),
        )

    proj_q, proj_s = mk(H, H)
    down_q, down_s = mk(F, H)
    qkv_q, qkv_s = mk(H, NQKV)
    up_q, up_s = mk(H, F)
    # k-concat for proj+down; n-concat for qkv+up
    pd_q = jnp.concatenate([proj_q, down_q], axis=1)
    qu_q = jnp.concatenate([qkv_q, up_q], axis=2)
    qu_s = jnp.concatenate([qkv_s, up_s], axis=1)

    x_h = jnp.asarray(rng.standard_normal((1, H)), jnp.bfloat16)
    x_f = jnp.asarray(rng.standard_normal((1, F)), jnp.bfloat16)
    x_pd = jnp.concatenate([x_h, x_f], axis=1)

    cases = {
        "separate_pd": lambda l: (
            quant_matmul_w4_pallas_stacked(x_h, proj_q, proj_s, l)
            + quant_matmul_w4_pallas_stacked(x_f, down_q, down_s, l)
        ),
        "merged_pd": lambda l: quant_matmul_w4_pallas_stacked(
            x_pd, pd_q, proj_s, l
        ),
        "separate_qu": lambda l: (
            quant_matmul_w4_pallas_stacked(x_h, qkv_q, qkv_s, l)[0, 0]
            + quant_matmul_w4_pallas_stacked(x_h, up_q, up_s, l)[0, 0]
        ),
        "merged_qu": lambda l: quant_matmul_w4_pallas_stacked(
            x_h, qu_q, qu_s, l
        )[0, 0],
    }
    for name, call in cases.items():
        @jax.jit
        def many(call=call):
            acc = jnp.zeros((), jnp.float32)
            for l in range(L):
                acc = acc + jnp.sum(call(jnp.int32(l))).astype(jnp.float32)
            return acc

        float(many())
        tdir = "/tmp/merge_probe"
        shutil.rmtree(tdir, ignore_errors=True)
        with trace(tdir):
            float(many())
        rows = summarize_trace(tdir, top=40)
        tot = sum(ms for _, ms, _, _ in rows)
        kern = sum(ms for n, ms, _, _ in rows if "quant_matmul" in n)
        print(f"{name:14s} total={tot/L*1000:7.1f}us/layer  kernels={kern/L*1000:7.1f}us/layer")


if __name__ == "__main__":
    main()
