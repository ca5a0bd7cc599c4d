"""Continuous-batcher throughput bench on the real chip.

Aggregate tokens/sec over a pool of live slots with chunked admission — the
serving regime the reference cannot run at all (its batches are static,
GptNeoX.cc:386-1052). Validates the batched one-hot cache writes at pool
sizes the old per-row-unrolled updates would have bloated the step program
over (kv_cache._row_update history).

  python tools/batcher_bench.py --slots 32 --requests 64
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from fastertransformer4codefuse_tpu.utils.compile_cache import enable as _cc
_cc()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--in-len", type=int, default=100)
    ap.add_argument("--out-len", type=int, default=64)
    ap.add_argument("--max-seq", type=int, default=512)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--prompt-bucket", type=int, default=128)
    args = ap.parse_args()

    import jax

    from fastertransformer4codefuse_tpu import (
        GptNeoXConfig,
        GptNeoXEngine,
        RuntimeConfig,
        init_params,
    )
    from fastertransformer4codefuse_tpu.engine.batcher import ContinuousBatcher

    cfg = GptNeoXConfig.codefuse_13b()
    params = init_params(cfg, dtype="bf16", int8_mode=1, quantize_embeddings=True, weight_bits=args.bits)
    jax.block_until_ready(params)
    eng = GptNeoXEngine(
        cfg, params,
        RuntimeConfig(dtype="bf16", int8_mode=1, kv_cache_dtype="int8",
                      max_batch_size=args.slots, max_seq_len=args.max_seq),
    )
    pool = ContinuousBatcher(
        eng, max_slots=args.slots, max_seq_len=args.max_seq,
        prompt_bucket=args.prompt_bucket,
    )
    rng = np.random.default_rng(0)
    for _ in range(args.requests):
        pool.submit(
            list(rng.integers(0, 50000, size=(args.in_len,)).astype(int)),
            output_len=args.out_len, min_length=args.out_len,
        )

    # warm the three jitted programs with one tick round
    t0 = time.perf_counter()
    pool.step()
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    done = pool.run()
    dt = time.perf_counter() - t0
    total = sum(
        int(len(r.output_ids) - len(r.prompt)) for r in done.values()
        if r.output_ids is not None
    )
    print(
        f"slots={args.slots} requests={args.requests} "
        f"{args.in_len}in/{args.out_len}out bits={args.bits}: "
        f"{total} tokens in {dt:.2f}s (+{warm:.1f}s warm) "
        f"= {total / dt:.1f} tok/s aggregate"
    )


if __name__ == "__main__":
    main()
