"""Probe: can two concurrent weight operands beat the single-stream Pallas
pipeline rate (~680 GB/s vs XLA's ~749 on v5e)?

Times a stacked W4 matmul with the weight split along K into 1, 2, or 4
separate HBM slabs, all active every grid step (unlike fused_qkv_up's phased
segments). If the per-operand DMA queue is the bottleneck, n streams should
approach n x the issue rate until HBM saturates.

  python tools/dual_stream_probe.py [--bits 4] [--L 8]
"""
import argparse
import functools
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from fastertransformer4codefuse_tpu.utils.compile_cache import enable as _cc
_cc()  # persistent XLA cache: recompiles of unchanged programs become instant

H, F = 5120, 20480
HBM_GBPS = 819.0


def make_kernel(n_streams, n_k, out_dtype, bits, conv="bf16"):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def unpack(p_ref, dtype):
        if bits != 4:
            return p_ref[0].astype(dtype)
        w4 = pltpu.bitcast(p_ref[0], jnp.int4)
        if conv == "bf16":  # current production path
            return w4.astype(dtype)
        if conv == "int8":  # via int8 (exact) then the hw int8->bf16 convert
            return w4.astype(jnp.int8).astype(dtype)
        if conv == "f32":
            return w4.astype(jnp.float32).astype(dtype)
        if conv == "raw":  # hand the int4 operand straight to the MXU dot
            return w4
        raise ValueError(conv)

    def kernel(l_ref, *refs):
        x_refs = refs[:n_streams]
        p_refs = refs[n_streams : 2 * n_streams]
        s_ref = refs[2 * n_streams]
        o_ref, acc_ref = refs[2 * n_streams + 1 :]

        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        for x_ref, p_ref in zip(x_refs, p_refs):
            w = unpack(p_ref, x_ref.dtype)
            acc_ref[...] += jnp.dot(
                x_ref[...], w, preferred_element_type=jnp.float32
            )

        @pl.when(pl.program_id(2) == n_k - 1)
        def _done():
            o_ref[...] = (
                acc_ref[...] * s_ref[0, 0].astype(jnp.float32)
            ).astype(out_dtype)

    return kernel


def run_case(n_streams, K, N, L, bits, bk, bn, M=1, conv="bf16", vmem_mb=100):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pack = 2 if bits == 4 else 1
    rng = np.random.default_rng(0)
    Ks = K // n_streams
    n_k = Ks // bk
    assert Ks % bk == 0

    ps = [
        jnp.asarray(rng.integers(-128, 128, (L, Ks // pack, N)), jnp.int8)
        for _ in range(n_streams)
    ]
    xs = [jnp.asarray(rng.standard_normal((16, Ks)), jnp.bfloat16) for _ in range(n_streams)]
    s = jnp.asarray(rng.random((L, 1, N)) * 0.01, jnp.float32)

    bm = 16
    in_specs = (
        [pl.BlockSpec((bm, bk), lambda i, j, k, l: (i, k)) for _ in range(n_streams)]
        + [
            pl.BlockSpec((1, bk // pack, bn), lambda i, j, k, l: (l[0], k, j))
            for _ in range(n_streams)
        ]
        + [pl.BlockSpec((1, 1, bn), lambda i, j, k, l: (l[0], 0, j))]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, N // bn, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    call = pl.pallas_call(
        make_kernel(n_streams, n_k, jnp.bfloat16, bits, conv),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * N * K,
            bytes_accessed=K * N // pack,
            transcendentals=0,
        ),
    )

    from fastertransformer4codefuse_tpu.utils.profiling import summarize_trace, trace

    @jax.jit
    def many(*ops):
        acc = jnp.zeros((), jnp.float32)
        for l in range(L):
            acc = acc + call(jnp.asarray(l, jnp.int32).reshape(1), *ops)[0, 0].astype(
                jnp.float32
            )
        return acc

    args = xs + ps + [s]
    try:
        float(many(*args))
    except Exception as e:
        print(f"  streams={n_streams} conv={conv} bk={bk} bn={bn}: FAIL {str(e)[:160]}")
        return
    tdir = "/tmp/dual_probe"
    shutil.rmtree(tdir, ignore_errors=True)
    with trace(tdir):
        float(many(*args))
    rows = summarize_trace(tdir, top=30)
    kern = sum(ms for n, ms, _, _ in rows if "kernel" in n or "pallas" in n or "many" in n)
    tot = sum(ms for _, ms, _, _ in rows)
    us = tot / L * 1000
    gbps = (K * N // pack) / (us * 1e-6) / 1e9
    print(f"  streams={n_streams} conv={conv} bk={bk} bn={bn}: {us:7.1f}us/layer  {gbps:6.0f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--K", type=int, default=F)
    ap.add_argument("--N", type=int, default=H)
    ap.add_argument(
        "--cases", default="4096:5120,5120:5120,10240:5120",
        help="comma list of bk:bn tile pairs",
    )
    args = ap.parse_args()
    K, N = args.K, args.N
    print(f"shape {K}x{N} bits={args.bits}  SoL(819)= "
          f"{K*N//(2 if args.bits==4 else 1)/HBM_GBPS/1e3:.1f}us")
    for case in args.cases.split(","):
        bk, bn = map(int, case.split(":"))
        run_case(1, K, N, args.L, args.bits, bk, bn)


def run_noprefetch(K, N, L, bits):
    """Per-layer kernels on STATIC weight slices (no scalar-prefetch grid):
    does dropping PrefetchScalarGridSpec recover the ~716 GB/s the LM-head
    (non-stacked) kernel streams at?"""
    import jax
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.ops.quant_matmul_w4 import (
        quant_matmul_w4_pallas,
    )
    from fastertransformer4codefuse_tpu.utils.profiling import summarize_trace, trace

    pack = 2 if bits == 4 else 1
    rng = np.random.default_rng(0)
    ps = [
        jnp.asarray(rng.integers(-128, 128, (K // pack, N)), jnp.int8)
        for _ in range(L)
    ]
    ss = [jnp.asarray(rng.random((N,)) * 0.01, jnp.float32) for _ in range(L)]
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)

    @jax.jit
    def many(x, *ops):
        acc = jnp.zeros((), jnp.float32)
        for l in range(L):
            acc = acc + quant_matmul_w4_pallas(
                x, ops[l], ops[L + l], bn=5120, bk=2048
            )[0, 0].astype(jnp.float32)
        return acc

    args = ps + ss
    float(many(x, *args))
    tdir = "/tmp/dual_probe_np"
    shutil.rmtree(tdir, ignore_errors=True)
    with trace(tdir):
        float(many(x, *args))
    rows = summarize_trace(tdir, top=30)
    tot = sum(ms for _, ms, _, _ in rows)
    us = tot / L * 1000
    gbps = (K * N // pack) / (us * 1e-6) / 1e9
    print(f"  no-prefetch bk=2048 bn=5120: {us:7.1f}us/layer  {gbps:6.0f} GB/s")


if __name__ == "__main__":
    main()
