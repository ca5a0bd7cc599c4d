"""Beam-4 vs batch-4-sampling decode step-time on the real chip.

The reference's beam search keeps the KV cache FIXED and resolves a
cache_indirection inside the decode attention kernel (GptNeoX.cc:776-778,
1011-1017); round 1 physically gathered the whole [L, BB, nH, S, dh] cache
every step. This measures the fixed-cache indirection path: beam-4 decode on
a 13B config should land within ~15% of batch-4 sampling (same GEMM bytes,
attention reads the same cache bytes once per beam group).

Usage: python tools/beam_vs_batch.py [--in 256] [--out 48] [--bits 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from fastertransformer4codefuse_tpu.utils.compile_cache import enable as _cc
_cc()  # persistent XLA cache: recompiles of unchanged programs become instant


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_len", type=int, default=256)
    ap.add_argument("--out", dest="out_len", type=int, default=48)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--group", type=int, default=0)
    args = ap.parse_args()

    from fastertransformer4codefuse_tpu import (
        GptNeoXConfig,
        GptNeoXEngine,
        RuntimeConfig,
        init_params,
    )

    cfg = GptNeoXConfig.codefuse_13b()
    params = init_params(
        cfg, dtype="bf16", int8_mode=1, quantize_embeddings=True, weight_bits=args.bits,
        group_size=args.group,
    )
    eng = GptNeoXEngine(
        cfg, params,
        RuntimeConfig(dtype="bf16", int8_mode=1, kv_cache_dtype="int8", seq_bucket=128),
    )
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 50000, size=(args.in_len,)).tolist()

    def run(n, **kw):
        t0 = time.perf_counter()
        eng.generate([prompt] * n, output_len=args.out_len, min_length=args.out_len, **kw)
        return time.perf_counter() - t0

    half = max(args.out_len // 2, 1)

    def steptime(n, **kw):
        # subtract a half-length run so prefill/compile overheads cancel
        run(n, **kw)  # warm (full length)
        t_full = min(run(n, **kw) for _ in range(2))
        eng.generate([prompt] * n, output_len=half, min_length=half, **kw)  # warm
        t_half = min(
            time_of(lambda: eng.generate(
                [prompt] * n, output_len=half, min_length=half, **kw))
            for _ in range(2)
        )
        return (t_full - t_half) / (args.out_len - half)

    def time_of(f):
        t0 = time.perf_counter()
        f()
        return time.perf_counter() - t0

    for bw in (2, 4):
        t_batch = steptime(bw, top_k=4)
        print(f"batch-{bw} sampling step: {t_batch*1e3:.2f} ms "
              f"({bw/t_batch:.1f} tok/s agg)", flush=True)
        t_beam = steptime(1, beam_width=bw)
        print(f"beam-{bw} step:           {t_beam*1e3:.2f} ms  "
              f"({(t_beam/t_batch-1)*100:+.0f}% vs batch-{bw})", flush=True)


if __name__ == "__main__":
    main()
