"""Probe: flash decode inside the continuous batcher — regression post-mortem.

Round-3 finding (kv_cache.flash_decode_disabled): enabling the Pallas flash
decode kernel in the pool's per-tick step program cost 2 x ~200ms of
full-slab relayout copies per tick at 13B B=8/S=1024.

Root cause (found via HLO consumer tracing, NOT the boundary-layout
hypothesis): write_decode's preserve-mode skip (kv_skip) read-modify-writes
via a per-row GATHER whose XLA lowering wants the slabs in position-major
layout ({4,2,3,1,0}), while the Pallas kernel demands canonical operands.
Layout assignment satisfied one of them and re-laid-out both full K/V slabs
every LAYER for the other — regardless of entry-layout pinning (AUTO formats
and explicit Format pinning were both tried; the scan-carry layout decision
is internal). Fix: the pool's skip writes use the layout-neutral
"sacrifice_last" mode (skipped rows write slot S-1, which is always
rewritten by its owning row before becoming attention-valid), leaving no op
with a non-canonical preference.

Measured (13B, B=8, S=1024, v5e): a) xla-attend 70.0 ms/tick,
b/c) flash 50.7 ms/tick = 1.38x — flash_decode="on" is the pool default.

Run on the real chip:  python tools/pool_layout_probe.py --slots 8 --seq 1024
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=0, help="0 = full 13B")
    ap.add_argument("--ticks", type=int, default=30)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--group", type=int, default=128)
    ap.add_argument("--case", default="",
                    help="run one case (a|b|c) in-process; default spawns a "
                    "subprocess per case (engines do not reliably free HBM "
                    "within one TPU process)")
    args = ap.parse_args()

    if not args.case:
        import subprocess
        for case in "abc":
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--case", case]
                + [a for a in sys.argv[1:]],
                capture_output=True, text=True, timeout=3000,
            )
            out = (r.stdout or "").strip()
            print(out or f"# case {case} failed:\n"
                  + "\n".join((r.stderr or "").strip().splitlines()[-12:]),
                  flush=True)
        return

    import jax
    from jax.experimental.layout import Format, Layout

    from fastertransformer4codefuse_tpu import (
        GptNeoXConfig,
        GptNeoXEngine,
        RuntimeConfig,
        init_params,
    )
    from fastertransformer4codefuse_tpu.engine import kv_cache as kvc
    from fastertransformer4codefuse_tpu.engine.batcher import ContinuousBatcher

    cfg = GptNeoXConfig.codefuse_13b()
    if args.layers:
        cfg = GptNeoXConfig(**{**cfg.__dict__, "layer_num": args.layers})
    params = init_params(
        cfg, dtype="bf16", int8_mode=1, weight_bits=args.bits,
        group_size=args.group, quantize_embeddings=True,
    )
    jax.block_until_ready(params)
    eng = GptNeoXEngine(
        cfg, params,
        RuntimeConfig(dtype="bf16", int8_mode=1, kv_cache_dtype="int8",
                      seq_bucket=128),
    )

    def fresh_pool(**kw):
        cb = ContinuousBatcher(
            eng, max_slots=args.slots, max_seq_len=args.seq, prompt_bucket=128,
            **kw,
        )
        rng = np.random.default_rng(0)
        for _ in range(args.slots):
            cb.submit(
                list(rng.integers(2, 50000, size=(args.seq // 2,))),
                args.seq // 2 - 2, top_k=1,
            )
        # admit + finish chunk prefills so every tick is a pure decode tick
        for _ in range(args.seq // 2 // 128 + 2):
            cb.step()
        return cb

    def time_ticks(cb, label):
        cb.step()  # compile
        t0 = time.perf_counter()
        for _ in range(args.ticks):
            cb.step()
        dt = (time.perf_counter() - t0) / args.ticks * 1000
        print(f"{label}: {dt:.1f} ms/tick "
              f"({args.slots * 1000 / dt:.0f} tok/s aggregate)", flush=True)
        return dt

    import contextlib

    @contextlib.contextmanager
    def flash_forced():
        old = kvc._FLASH_DECODE
        kvc._FLASH_DECODE = True
        orig = kvc.flash_decode_disabled

        @contextlib.contextmanager
        def noop():
            yield

        kvc.flash_decode_disabled = noop
        try:
            yield
        finally:
            kvc._FLASH_DECODE = old
            kvc.flash_decode_disabled = orig

    if args.case == "a":
        # today's default: flash gated OFF inside the pool
        cb = fresh_pool()
        time_ticks(cb, "a) xla-attend (default)")
    elif args.case == "b":
        # flash kernel with the plain per-tick jit (the r3 regression)
        with flash_forced():
            cb = fresh_pool()
            time_ticks(cb, "b) flash naive (canonical boundary layout)")
    else:
        # flash kernel + the production "on" pool mode: layout-neutral
        # sacrifice-last skip writes (kv_cache.write_decode) remove the
        # preserve-gather's position-major preference, so the canonical-
        # layout Pallas kernel runs copy-free
        cb = fresh_pool(flash_decode="on")
        time_ticks(cb, "c) flash + sacrifice-last writes (production)")


if __name__ == "__main__":
    main()
