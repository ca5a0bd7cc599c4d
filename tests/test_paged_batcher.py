"""Paged continuous batching: block-table pool outputs must match the
one-shot engine per request, pages must recycle across slot reuse, and
admission must block (not crash) when the page pool is exhausted."""
import numpy as np

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.engine.batcher import ContinuousBatcher


def mk_engine(vocab=64):
    cfg = GptNeoXConfig.tiny(head_num=4, size_per_head=8, vocab_size=vocab)
    params = init_params(cfg, dtype="fp32")
    return GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))


PROMPTS = [
    [3, 4, 5],
    [9, 8, 7, 6, 5],
    [11, 12],
    [20, 21, 22, 23],
    [30, 31, 32],
]
OUT_LENS = [5, 4, 6, 3, 5]


def oneshot_refs(eng):
    refs = []
    for p, ol in zip(PROMPTS, OUT_LENS):
        o = eng.generate([p], output_len=ol, top_k=1)
        n = int(o.sequence_lengths[0, 0])
        refs.append([int(x) for x in o.output_ids[0, 0, :n]])
    return refs


def test_paged_batching_matches_oneshot():
    eng = mk_engine()
    refs = oneshot_refs(eng)
    # 2 slots, 5 requests, page pool with spare room: slot reuse AND page
    # recycling mid-stream
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=8,
        paged=dict(num_pages=12, page_size=8),
    )
    uids = [cb.submit(p, ol, top_k=1) for p, ol in zip(PROMPTS, OUT_LENS)]
    done = cb.run(max_ticks=200)
    for uid, ref in zip(uids, refs):
        r = done[uid]
        assert r.done, f"request {uid} never finished"
        assert r.output_ids == ref, f"uid {uid}: {r.output_ids} != {ref}"
    # every page returned to the free list
    assert cb.allocator.free_pages == 11


def test_paged_admission_blocks_on_page_exhaustion():
    """A pool with pages for only ~one request at a time must still finish
    everything (head-of-line blocking, release on completion) and match the
    one-shot outputs."""
    eng = mk_engine()
    refs = oneshot_refs(eng)
    # each request needs ceil((len+out)/8) <= 2 pages; 3 usable pages force
    # strictly serialized admission even though 2 slots exist
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=8,
        paged=dict(num_pages=4, page_size=8),
    )
    uids = [cb.submit(p, ol, top_k=1) for p, ol in zip(PROMPTS, OUT_LENS)]
    done = cb.run(max_ticks=400)
    for uid, ref in zip(uids, refs):
        r = done[uid]
        assert r.done and r.output_ids == ref
    assert cb.allocator.free_pages == 3


def test_paged_int8_kv_matches_oneshot_int8():
    """Quantized page pool (per-vector int8 scales) against the one-shot
    engine with the same int8 KV cache."""
    cfg = GptNeoXConfig.tiny(head_num=4, size_per_head=8, vocab_size=64)
    params = init_params(cfg, dtype="fp32")
    eng = GptNeoXEngine(
        cfg, params,
        RuntimeConfig(dtype="fp32", seq_bucket=8, kv_cache_dtype="int8"),
    )
    refs = []
    for p, ol in zip(PROMPTS[:3], OUT_LENS[:3]):
        o = eng.generate([p], output_len=ol, top_k=1)
        n = int(o.sequence_lengths[0, 0])
        refs.append([int(x) for x in o.output_ids[0, 0, :n]])
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=8,
        paged=dict(num_pages=10, page_size=8),
    )
    uids = [cb.submit(p, ol, top_k=1) for p, ol in zip(PROMPTS[:3], OUT_LENS[:3])]
    done = cb.run(max_ticks=200)
    for uid, ref in zip(uids, refs):
        assert done[uid].output_ids == ref


def test_paged_mid_flight_interleave():
    """A short request admitted while a long one is mid-generation finishes
    first (the continuous-batching property) under the paged pool."""
    eng = mk_engine()
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=8,
        paged=dict(num_pages=12, page_size=8),
    )
    long_uid = cb.submit([9, 8, 7, 6, 5], 12, top_k=1)
    for _ in range(3):
        cb.step()
    short_uid = cb.submit([3, 4], 2, top_k=1)
    order = []
    for _ in range(200):
        for uid, _t, fin in cb.step():
            if fin:
                order.append(uid)
        if len(order) == 2:
            break
    assert order == [short_uid, long_uid]


def test_paged_int4_kv_matches_oneshot_int4():
    """Nibble-packed page pool end-to-end: pooled outputs match the one-shot
    engine with the same int4 KV cache (per-vector quantization is identical
    whether written whole-prompt, per-chunk, or per-token)."""
    cfg = GptNeoXConfig.tiny(head_num=4, size_per_head=8, vocab_size=64)
    params = init_params(cfg, dtype="fp32")
    eng = GptNeoXEngine(
        cfg, params,
        RuntimeConfig(dtype="fp32", seq_bucket=8, kv_cache_dtype="int4"),
    )
    refs = []
    for p, ol in zip(PROMPTS[:3], OUT_LENS[:3]):
        o = eng.generate([p], output_len=ol, top_k=1)
        n = int(o.sequence_lengths[0, 0])
        refs.append([int(x) for x in o.output_ids[0, 0, :n]])
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=8,
        paged=dict(num_pages=10, page_size=8),
    )
    uids = [cb.submit(p, ol, top_k=1) for p, ol in zip(PROMPTS[:3], OUT_LENS[:3])]
    done = cb.run(max_ticks=200)
    for uid, ref in zip(uids, refs):
        assert done[uid].output_ids == ref
    assert cb.allocator.free_pages == 9


def test_multipool_paged_classes():
    """MultiPoolServer with PAGED classes (each class its own page pool +
    pipelined ticks): routing, parity, and page accounting all compose."""
    from fastertransformer4codefuse_tpu.engine.server import MultiPoolServer

    eng = mk_engine()
    refs = oneshot_refs(eng)
    srv = MultiPoolServer(
        eng,
        [dict(max_slots=2, max_seq_len=16, prompt_bucket=8,
              paged=dict(num_pages=6, page_size=8), pipeline_ticks=True),
         dict(max_slots=2, max_seq_len=32, prompt_bucket=8,
              paged=dict(num_pages=10, page_size=8), pipeline_ticks=True)],
    )
    try:
        uids = [srv.submit(p, ol, top_k=1) for p, ol in zip(PROMPTS, OUT_LENS)]
        for uid, ref in zip(uids, refs):
            r = srv.wait(uid, timeout=120)
            assert r.output_ids == ref
        for s in srv.servers:
            assert s.batcher.allocator.free_pages == s.batcher.allocator.n_pages - 1
    finally:
        srv.close()
