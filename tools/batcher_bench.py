"""Continuous-batcher throughput bench on the real chip.

Aggregate tokens/sec over a pool of live slots with chunked admission — the
serving regime the reference cannot run at all (its batches are static,
GptNeoX.cc:386-1052). Validates the batched one-hot cache writes at pool
sizes the old per-row-unrolled updates would have bloated the step program
over (kv_cache._row_update history).

  python tools/batcher_bench.py --slots 32 --requests 64
  python tools/batcher_bench.py --handler --slots 8 --requests 16   # full
      serving path: concurrent CodeFuseHandler.predict() threads through the
      BatchingServer pool, reference request/response schema included
"""
import argparse
import json
import os
import sys
import threading
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
    ap.add_argument("--handler", action="store_true",
                    help="drive the full CodeFuseHandler.predict serving path")
    ap.add_argument("--mixed", choices=("single", "multi", ""), default="",
                    help="mixed-length workload (half 64in/32out, half "
                    "512in/128out) through ONE 8x1024 pool ('single') or "
                    "length-classed pools 16x256 + 4x1024 ('multi')")
    ap.add_argument("--layers", type=int, default=0,
                    help="override layer count (0 = full 13B; 2 for smoke)")
    ap.add_argument("--dtype", default="bf16",
                    help="fp32 for CPU smoke (CPU backend lacks bf16 dots)")
    ap.add_argument("--log-probs", action="store_true",
                    help="pool tracks per-token log-probs (handler mode: on)")
    ap.add_argument("--act-int8", action="store_true",
                    help="SmoothQuant W8A8 on batch-wide GEMMs (chunk "
                    "prefills; requires --bits 8)")
    ap.add_argument("--pipeline", action="store_true",
                    help="pipeline_ticks=True: overlap host sync with the "
                    "next tick's compute (engine/batcher.py)")
    ap.add_argument("--spec", action="store_true",
                    help="speculative pool (engine/spec_pool.SpecPool): the "
                    "tick is a (k+1)-wide verify; repetitive workload")
    ap.add_argument("--spec-k", type=int, default=8)
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
    if args.layers:
        cfg = GptNeoXConfig(**{**cfg.__dict__, "layer_num": args.layers})
    params = init_params(cfg, dtype=args.dtype, int8_mode=1,
                         quantize_embeddings=True, weight_bits=args.bits)
    jax.block_until_ready(params)
    eng = GptNeoXEngine(
        cfg, params,
        RuntimeConfig(dtype=args.dtype, int8_mode=1, kv_cache_dtype="int8",
                      act_int8=args.act_int8,
                      max_batch_size=args.slots, max_seq_len=args.max_seq),
    )
    rng = np.random.default_rng(0)

    if args.spec:
        # Pooled speculative serving: every slot drafts/commits its own
        # width each tick. Repetitive prompts (the prompt-lookup regime).
        from fastertransformer4codefuse_tpu.engine.spec_pool import SpecPool

        pool = SpecPool(
            eng, k=args.spec_k, max_slots=args.slots,
            max_seq_len=args.max_seq, prompt_bucket=args.prompt_bucket,
            pipeline_ticks=args.pipeline,
        )
        prompts = []
        for i in range(args.requests):
            ph = list(rng.integers(2, 50000, size=32))
            prompts.append((ph * (args.in_len // 32 + 1))[: args.in_len])
        # warm the tick/chunk programs
        pool.submit(prompts[0], 2)
        pool.run()
        t0 = time.perf_counter()
        for p in prompts:
            pool.submit(p, args.out_len)
        done = pool.run()
        dt = time.perf_counter() - t0
        total = sum(
            len(r.output_ids) - len(p)
            for r, p in zip(
                (done[u] for u in sorted(done)[-len(prompts):]), prompts
            )
        )
        print(
            f"SPEC pool: {args.requests} reqs x {args.in_len}in/"
            f"{args.out_len}out over {args.slots} slots (k={args.spec_k}): "
            f"{total} tokens in {dt:.2f}s = {total / dt:.1f} tok/s aggregate",
            flush=True,
        )
        return

    if args.mixed:
        # Mixed-length workload: does length-classed routing beat one
        # worst-case pool? Half the requests are short (64in/32out), half
        # long (512in/128out); total request count = --requests.
        from fastertransformer4codefuse_tpu.engine.server import (
            BatchingServer,
            MultiPoolServer,
        )

        if args.mixed == "multi":
            srv = MultiPoolServer(
                eng,
                [dict(max_slots=8, max_seq_len=256, prompt_bucket=128,
                      pipeline_ticks=args.pipeline),
                 dict(max_slots=4, max_seq_len=1024, prompt_bucket=128,
                      pipeline_ticks=args.pipeline)],
            )
        else:
            srv = BatchingServer(
                eng, max_slots=8, max_seq_len=1024, prompt_bucket=128,
                pipeline_ticks=args.pipeline,
            )
        reqs = []
        for i in range(args.requests):
            if i % 2 == 0:
                reqs.append((list(rng.integers(2, 50000, size=(64,))), 32))
            else:
                reqs.append((list(rng.integers(2, 50000, size=(512,))), 128))
        # warm both classes
        srv.generate(reqs[0][0], 4, top_k=1)
        srv.generate(reqs[1][0], 4, top_k=1)
        t0 = time.perf_counter()
        uids = [srv.submit(p, n, top_k=1, min_length=n) for p, n in reqs]
        done_at = {}

        def waiter(uid):
            srv.wait(uid, timeout=3600)
            done_at[uid] = time.perf_counter() - t0

        threads = [threading.Thread(target=waiter, args=(u,)) for u in uids]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        dt = max(done_at.values())
        total = sum(n for _, n in reqs)
        short_lat = sorted(done_at[u] for u, (p, n) in zip(uids, reqs) if n == 32)
        long_lat = sorted(done_at[u] for u, (p, n) in zip(uids, reqs) if n == 128)
        print(
            f"MIXED workload ({args.mixed}): {args.requests} requests "
            f"(half 64/32, half 512/128): {total} tokens in {dt:.2f}s "
            f"= {total / dt:.1f} tok/s aggregate; "
            f"short p50 {short_lat[len(short_lat)//2]:.2f}s "
            f"long p50 {long_lat[len(long_lat)//2]:.2f}s"
        )
        srv.close()
        return

    if args.handler:
        # Full serving path: N concurrent predict() threads sharing the
        # handler's BatchingServer pool (VERDICT r3 item 1 done-criterion:
        # aggregate numbers for the HANDLER path, not the bare pool).
        from fastertransformer4codefuse_tpu.api.handler import CodeFuseHandler

        class IdTok:  # numeric stub tokenizer: "3 4 5" <-> ids
            def encode(self, t):
                return [int(x) for x in t.split()]

            def decode(self, ids):
                return " ".join(str(int(i)) for i in ids)

            def get_vocab(self):
                return {}

        handler = CodeFuseHandler(
            engine=eng, tokenizer=IdTok(), warmup=False,
            pool=dict(max_slots=args.slots, max_seq_len=args.max_seq,
                      prompt_bucket=args.prompt_bucket,
                      pipeline_ticks=args.pipeline,
                      return_log_probs=True),
        )
        prompts = [
            " ".join(str(x) for x in rng.integers(2, 50000, size=(args.in_len,)))
            for _ in range(args.requests)
        ]
        lat = []
        lock = threading.Lock()

        def run_one(i):
            req = {"prompts": [{"prompt": prompts[i], "top_k": 1,
                                "min_length": args.out_len}],
                   "out_seq_length": args.out_len}
            t0 = time.perf_counter()
            code, err, rm = handler.predict(req, f"bench-{i}")
            assert code == 0, err
            res = json.loads(rm["res"])
            with lock:
                lat.append((time.perf_counter() - t0, res["length"][0][0]))

        # warm (compiles the pool programs)
        run_one(0)
        lat.clear()
        t0 = time.perf_counter()
        threads = [
            threading.Thread(target=run_one, args=(i,))
            for i in range(args.requests)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        total = sum(n for _, n in lat)
        lats = sorted(l for l, _ in lat)
        print(
            f"HANDLER path: slots={args.slots} requests={args.requests} "
            f"{args.in_len}in/{args.out_len}out bits={args.bits}: "
            f"{total} tokens in {dt:.2f}s = {total / dt:.1f} tok/s aggregate; "
            f"request latency p50={lats[len(lats)//2]:.2f}s "
            f"p95={lats[int(len(lats)*0.95)]:.2f}s"
        )
        handler.server.close()
        return

    pool = ContinuousBatcher(
        eng, max_slots=args.slots, max_seq_len=args.max_seq,
        prompt_bucket=args.prompt_bucket,
        return_log_probs=args.log_probs,
        pipeline_ticks=args.pipeline,
    )
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
