"""Continuous batching: outputs must match the one-shot engine per request
even when requests share slots across overlapping lifetimes."""
import numpy as np

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.engine.batcher import ContinuousBatcher


def test_continuous_batching_matches_oneshot():
    cfg = GptNeoXConfig.tiny(head_num=4, size_per_head=8, vocab_size=64)
    params = init_params(cfg, dtype="fp32")
    eng = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))

    prompts = [
        [3, 4, 5],
        [9, 8, 7, 6, 5],
        [11, 12],
        [20, 21, 22, 23],
        [30, 31, 32],
    ]
    out_lens = [5, 4, 6, 3, 5]

    # one-shot references (greedy)
    refs = []
    for p, ol in zip(prompts, out_lens):
        o = eng.generate([p], output_len=ol, top_k=1)
        n = int(o.sequence_lengths[0, 0])
        refs.append([int(x) for x in o.output_ids[0, 0, :n]])

    # continuous: 2 slots for 5 requests — forces slot reuse mid-stream
    cb = ContinuousBatcher(eng, max_slots=2, max_seq_len=32, prompt_bucket=8)
    uids = [cb.submit(p, ol, top_k=1) for p, ol in zip(prompts, out_lens)]
    done = cb.run(max_ticks=200)

    for uid, ref in zip(uids, refs):
        r = done[uid]
        assert r.done, f"request {uid} never finished"
        assert r.output_ids == ref, f"uid {uid}: {r.output_ids} != {ref}"


def test_streaming_tokens_via_on_token():
    cfg = GptNeoXConfig.tiny(head_num=4, size_per_head=8, vocab_size=64)
    params = init_params(cfg, dtype="fp32")
    eng = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))
    cb = ContinuousBatcher(eng, max_slots=2, max_seq_len=32, prompt_bucket=8)
    got = []
    cb.pending.append(
        __import__(
            "fastertransformer4codefuse_tpu.engine.batcher", fromlist=["Request"]
        ).Request(uid=0, prompt=[3, 4, 5], output_len=4, top_k=1, on_token=got.append)
    )
    done = cb.run(max_ticks=50)
    r = done[0]
    assert got == r.output_ids[3:], (got, r.output_ids)
