"""Per-op device-time bench: Pallas flash-decode vs the XLA attend_decode path.

Times L unrolled layer instances (trace summary, immune to dispatch floor) at
CodeFuse-13B decode attention shapes over an int8 (or bf16) KV cache.

  python tools/flash_decode_bench.py [--seqs 1088,2048,4096,8192] [--batch 1]
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from fastertransformer4codefuse_tpu.utils.compile_cache import enable as _cc
_cc()  # persistent XLA cache: recompiles of unchanged programs become instant

L = 8
HBM_GBPS = 819.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", default="1088,2048,4096,8192")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--nh", type=int, default=40)
    ap.add_argument("--dh", type=int, default=128)
    ap.add_argument("--dtype", default="int8", choices=["int8", "bf16"])
    ap.add_argument("--bs", type=int, default=512)
    ap.add_argument("--hb", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.engine import kv_cache as kvc
    from fastertransformer4codefuse_tpu.ops.flash_decode import flash_decode_stacked
    from fastertransformer4codefuse_tpu.utils.profiling import summarize_trace, trace

    B, nH, dh = args.batch, args.nh, args.dh
    rng = np.random.default_rng(0)
    for S in map(int, args.seqs.split(",")):
        if args.dtype == "int8":
            cache = {
                "k": jnp.asarray(rng.integers(-127, 128, (L, B, nH, S, dh)), jnp.int8),
                "v": jnp.asarray(rng.integers(-127, 128, (L, B, nH, S, dh)), jnp.int8),
                "k_s": jnp.asarray(rng.random((L, B, nH, S)) * 0.02, jnp.bfloat16),
                "v_s": jnp.asarray(rng.random((L, B, nH, S)) * 0.02, jnp.bfloat16),
            }
            ks, vs = cache["k_s"], cache["v_s"]
            nbytes = 2 * B * nH * S * (dh + 2)
        else:
            cache = {
                "k": jnp.asarray(rng.standard_normal((L, B, nH, S, dh)), jnp.bfloat16),
                "v": jnp.asarray(rng.standard_normal((L, B, nH, S, dh)), jnp.bfloat16),
            }
            ks = vs = None
            nbytes = 2 * B * nH * S * dh * 2
        q = jnp.asarray(rng.standard_normal((B, nH, dh)), jnp.bfloat16)
        positions = jnp.full((B,), S - 16, jnp.int32)
        valid = jnp.arange(S)[None, :] <= positions[:, None]
        sm = 1.0 / np.sqrt(dh)
        sol_us = nbytes / HBM_GBPS / 1e3

        def xla_call(l):
            kvc.set_flash_decode(False)
            return kvc.attend_decode(cache, l, q, valid, sm, positions=positions)

        def flash_call(l):
            return flash_decode_stacked(
                q, cache["k"], ks, cache["v"], vs, l, positions,
                sm_scale=sm, bs=args.bs, hb=args.hb,
            )

        print(f"== B={B} nH={nH} dh={dh} S={S} {args.dtype}  SoL={sol_us:.1f}us")
        for name, call in [("xla", xla_call), ("pallas", flash_call)]:
            @jax.jit
            def many(call=call):
                acc = jnp.zeros((), jnp.float32)
                for l in range(L):
                    acc = acc + call(jnp.int32(l))[0, 0, 0].astype(jnp.float32)
                return acc

            try:
                float(many())
                tdir = "/tmp/fd_bench"
                shutil.rmtree(tdir, ignore_errors=True)
                with trace(tdir):
                    float(many())
                rows = summarize_trace(tdir, top=6 * L)
                tot = sum(ms for _, ms, _, _ in rows)
                t_us = tot / L * 1000
                print(f"  {name:7s}: {t_us:7.1f}us  ({sol_us/t_us*100:4.0f}% SoL)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:7s}: FAIL {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
