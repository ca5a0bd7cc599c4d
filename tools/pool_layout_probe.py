"""Probe: flash decode inside the continuous batcher via layout pinning.

Round-3 finding (kv_cache.flash_decode_disabled): enabling the Pallas flash
decode kernel in the pool's per-tick step program cost 2x ~100ms of full-slab
relayout copies per tick at B=8/S=512 — the state pytree crosses the jit
boundary every tick in the CANONICAL layout (it was created by jnp.zeros and
donation pins output layout == input layout), so XLA transposes the K and V
slabs into the kernel's preferred layout and back EVERY tick.

Hypothesis: compile the tick with AUTO in/out layouts (jax.experimental.layout
Format(Layout.AUTO)) and device_put the state into the compiled program's
chosen input layouts ONCE — the cache then LIVES in the kernel-preferred
layout across ticks and the per-tick copies disappear, giving the pool the
length-proportional cache reads of the flash kernel (the reference decode
kernel's ti<tlength behavior) at long S.

Measures ms/tick for:  (a) XLA attend path (today's default),
(b) flash kernel naive (the r3 regression), (c) flash kernel + AUTO layouts.

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
    args = ap.parse_args()

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

    def fresh_pool():
        cb = ContinuousBatcher(
            eng, max_slots=args.slots, max_seq_len=args.seq, prompt_bucket=128
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

    # (a) today's default: flash gated OFF inside the pool
    cb = fresh_pool()
    a = time_ticks(cb, "a) xla-attend (default)")
    del cb

    # (b) flash kernel with the plain per-tick jit (the r3 regression)
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

    with flash_forced():
        cb = fresh_pool()
        b = time_ticks(cb, "b) flash naive (canonical boundary layout)")
        del cb

    # (c) flash kernel + AUTO layouts: compile the step with auto in/out
    # formats, move the state into the chosen input layout once, tick.
    with flash_forced():
        cb = fresh_pool()
        state = cb._state
        auto = Format(Layout.AUTO)
        jitted = jax.jit(
            cb._build_step(), donate_argnums=(1,),
            in_shardings=(None, jax.tree.map(lambda _: auto, state)),
        )
        compiled = jitted.lower(eng.params, state).compile()
        try:
            in_fmts = compiled.input_formats  # matches the arg pytrees
        except AttributeError:
            in_fmts = compiled.input_layouts
        state_fmts = in_fmts[1]
        print("   cache k layout chosen:", state_fmts["cache"]["k"], flush=True)
        cb._state = jax.tree.map(jax.device_put, state, state_fmts)
        cb._step_fn = lambda params, st: compiled(params, st)
        c = time_ticks(cb, "c) flash + AUTO layouts (pinned)")
        del cb

    print(f"\nsummary: xla={a:.1f}  flash-naive={b:.1f}  flash-pinned={c:.1f} ms/tick")


if __name__ == "__main__":
    main()
