"""Probe: hand-rolled N-deep DMA pipeline vs the Pallas BlockSpec pipeline.

The BlockSpec grid pipeline is strictly double-buffered and tops out at
~680 GB/s streaming stacked int4 weights (dual_stream_probe), while XLA's
convert-into-dot sustains ~749 on the same chip. This kernel bypasses the
automatic pipeline: weights stay in HBM (memory_space=ANY) and the kernel
issues its own ``pltpu.make_async_copy`` per chunk with NBUF slots in
flight, dotting chunk c while chunks c+1..c+NBUF-1 stream.

  python tools/manual_dma_probe.py [--bits 4] [--L 40] [--nbuf 3] [--ckh 512]
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


def build(K, N, L, bits, nbuf, ckh, vmem_mb):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pack = 2 if bits == 4 else 1
    Kh = K // pack
    assert Kh % ckh == 0
    n_c = Kh // ckh
    ck = ckh * pack  # unpacked K rows per chunk
    M = 16

    def kernel(l_ref, x_ref, p_ref, s_ref, o_ref, bufs, acc, sems):
        l = l_ref[0]

        def dma(slot, c):
            return pltpu.make_async_copy(
                p_ref.at[l, pl.ds(c * ckh, ckh), :],
                bufs.at[slot],
                sems.at[slot],
            )

        for i in range(nbuf - 1):  # warm-up: fill all but one slot
            dma(i, i).start()
        acc[...] = jnp.zeros_like(acc)

        def body(c, _):
            slot = jax.lax.rem(c, nbuf)
            nxt = c + nbuf - 1

            @pl.when(nxt < n_c)
            def _():
                dma(jax.lax.rem(nxt, nbuf), nxt).start()

            dma(slot, c).wait()
            if bits == 4:
                w = pltpu.bitcast(bufs[slot], jnp.int4).astype(jnp.bfloat16)
            else:
                w = bufs[slot].astype(jnp.bfloat16)
            acc[...] += jnp.dot(
                x_ref[c], w, preferred_element_type=jnp.float32
            )
            return _

        jax.lax.fori_loop(0, n_c, body, None)
        o_ref[...] = (acc[...] * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # layer
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x [n_c, M, ck]
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed [L, Kh, N] in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale [1, N]
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((nbuf, ckh, N), jnp.int8),
            pltpu.VMEM((M, N), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024,
        ),
    )
    return call, n_c, ck, M


def run_case(K, N, L, bits, nbuf, ckh, vmem_mb=100):
    import jax
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.utils.profiling import summarize_trace, trace

    pack = 2 if bits == 4 else 1
    call, n_c, ck, M = build(K, N, L, bits, nbuf, ckh, vmem_mb)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.integers(-128, 128, (L, K // pack, N)), jnp.int8)
    x = jnp.asarray(rng.standard_normal((n_c, M, ck)), jnp.bfloat16)
    s = jnp.asarray(rng.random((1, N)) * 0.01, jnp.float32)

    @jax.jit
    def many(x, p, s):
        acc = jnp.zeros((), jnp.float32)
        for l in range(L):
            acc = acc + call(jnp.full((1,), l, jnp.int32), x, p, s)[0, 0].astype(
                jnp.float32
            )
        return acc

    try:
        float(many(x, p, s))
    except Exception as e:
        print(f"  nbuf={nbuf} ckh={ckh}: FAIL {str(e)[:160]}")
        return
    tdir = "/tmp/manual_dma_probe"
    shutil.rmtree(tdir, ignore_errors=True)
    with trace(tdir):
        float(many(x, p, s))
    rows = summarize_trace(tdir, top=30)
    tot = sum(ms for _, ms, _, _ in rows)
    us = tot / L * 1000
    gbps = (K * N // pack) / (us * 1e-6) / 1e9
    print(f"  nbuf={nbuf} ckh={ckh} ({ckh * N / 1e6:.1f}MB chunks): "
          f"{us:7.1f}us/layer  {gbps:6.0f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--L", type=int, default=40)
    ap.add_argument("--K", type=int, default=F)
    ap.add_argument("--N", type=int, default=H)
    ap.add_argument("--cases", default="3:512,4:512,3:1024")
    args = ap.parse_args()
    K, N = args.K, args.N
    print(f"shape {K}x{N} bits={args.bits}  SoL(819)= "
          f"{K * N // (2 if args.bits == 4 else 1) / HBM_GBPS / 1e3:.1f}us")
    for case in args.cases.split(","):
        nbuf, ckh = map(int, case.split(":"))
        run_case(K, N, args.L, args.bits, nbuf, ckh)


if __name__ == "__main__":
    main()
