"""Lazy page allocation + preempt-and-recompute (VERDICT r4 item 7).

Reservation-mode admission (the r4 default) blocks a request until EVERY page
it could ever touch is free; lazy mode admits on the prompt's pages alone,
grows block tables just-in-time, and on exhaustion preempts the worst-
(priority, uid) slot — its tokens snapshot to host, its pages free, and it
re-queues to re-prefill prompt+generated (recompute) when pages return.
Outputs must stay EXACTLY the uninterrupted greedy outputs.

The reference has no analog (static batches, dense per-batch caches,
GptNeoX.cc:84-156); vLLM-style preemption is the design reference point.
"""
import numpy as np

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.engine.batcher import ContinuousBatcher

PROMPTS = [[3, 4, 5], [9, 8, 7, 6, 5], [11, 12], [20, 21, 22, 23]]


def mk_engine():
    cfg = GptNeoXConfig.tiny(head_num=4, size_per_head=8, vocab_size=64)
    params = init_params(cfg, dtype="fp32")
    return GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))


def refs_for(eng, prompts, out_lens):
    refs = []
    for p, ol in zip(prompts, out_lens):
        o = eng.generate([p], output_len=ol, top_k=1)
        n = int(o.sequence_lengths[0, 0])
        refs.append([int(x) for x in o.output_ids[0, 0, :n]])
    return refs


def test_lazy_admits_where_reservation_blocks():
    """Demand exceeds reservation capacity: 2 long requests that TOGETHER
    need more pages than exist. Reservation mode serializes them; lazy mode
    runs them concurrently until pressure, preempts one, and both finish
    with exact greedy outputs."""
    eng = mk_engine()
    out_lens = [20, 20]
    prompts = [PROMPTS[0], PROMPTS[1]]
    refs = refs_for(eng, prompts, out_lens)
    # each request needs ceil((3+20)/8)=3..ceil((5+20)/8)=4 pages; pool has 5
    # allocatable -> reservation admits ONE at a time, lazy runs both
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=8,
        paged=dict(num_pages=6, page_size=8, lazy=True),
    )
    uids = [cb.submit(p, ol, top_k=1) for p, ol in zip(prompts, out_lens)]
    # both admitted together (the lazy property) before any pressure
    cb._admit_pending()
    assert len(cb.running) == 2, "lazy admission should co-admit both"
    done = cb.run(max_ticks=400)
    assert cb.preemptions >= 1, "page pressure should have preempted once"
    for uid, ref in zip(uids, refs):
        r = done[uid]
        assert r.done
        assert r.output_ids == ref, (r.output_ids, ref)
    assert cb.allocator.free_pages == 5  # every page returned


def test_lazy_throughput_does_not_collapse():
    """The done criterion: with demand over capacity, total ticks stay within
    a small factor of the no-pressure run (preempt-and-recompute costs the
    re-prefill, not a livelock)."""
    eng = mk_engine()
    out_lens = [16, 16, 16, 16]
    refs = refs_for(eng, PROMPTS, out_lens)

    def run_pool(num_pages):
        cb = ContinuousBatcher(
            eng, max_slots=4, max_seq_len=32, prompt_bucket=8,
            paged=dict(num_pages=num_pages, page_size=8, lazy=True),
        )
        uids = [cb.submit(p, ol, top_k=1) for p, ol in zip(PROMPTS, out_lens)]
        ticks = 0
        for ticks in range(1, 1000):
            cb.step()
            if not (cb.pending or cb.running or cb._inflight):
                break
        return cb, uids, ticks

    cb_roomy, uids_r, ticks_roomy = run_pool(num_pages=13)  # no pressure
    assert cb_roomy.preemptions == 0
    cb_tight, uids_t, ticks_tight = run_pool(num_pages=8)  # ~half the demand
    assert cb_tight.preemptions >= 1
    for uids, cb in ((uids_r, cb_roomy), (uids_t, cb_tight)):
        for uid, ref in zip(uids, refs):
            assert cb.requests[uid].output_ids == ref, (
                cb.requests[uid].output_ids, ref
            )
    # recompute under ~2x overcommit must cost < 3x the tick count
    assert ticks_tight < 3 * ticks_roomy, (ticks_tight, ticks_roomy)


def test_preemption_respects_priority():
    """Under pressure the LOWEST-priority (then youngest) request is the
    victim; the high-priority request never preempts."""
    eng = mk_engine()
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=8,
        paged=dict(num_pages=6, page_size=8, lazy=True),
    )
    hi = cb.submit(PROMPTS[0], 20, top_k=1, priority=0)
    lo = cb.submit(PROMPTS[1], 20, top_k=1, priority=5)
    done = cb.run(max_ticks=400)
    assert done[hi].preemptions == 0
    assert done[lo].preemptions >= 1
    assert done[hi].done and done[lo].done


def test_lazy_with_pipelined_ticks():
    """Preemption under pipeline_ticks: in-flight ticks flush before any
    eviction, so attribution and outputs stay exact."""
    eng = mk_engine()
    out_lens = [18, 18, 12]
    prompts = PROMPTS[:3]
    refs = refs_for(eng, prompts, out_lens)
    cb = ContinuousBatcher(
        eng, max_slots=3, max_seq_len=32, prompt_bucket=8,
        paged=dict(num_pages=7, page_size=8, lazy=True),
        pipeline_ticks=True,
    )
    uids = [cb.submit(p, ol, top_k=1) for p, ol in zip(prompts, out_lens)]
    done = cb.run(max_ticks=600)
    assert cb.preemptions >= 1
    for uid, ref in zip(uids, refs):
        assert done[uid].output_ids == ref, (done[uid].output_ids, ref)
    assert cb.allocator.free_pages == 6


def test_lazy_single_request_too_big_rejected():
    eng = mk_engine()
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=8,
        paged=dict(num_pages=3, page_size=8, lazy=True),
    )
    import pytest

    with pytest.raises(ValueError, match="pages"):
        cb.submit(PROMPTS[0], 25, top_k=1)


def test_lazy_preemption_preserves_sampled_rng_path():
    """A preempted SAMPLED request must resume the same rng fold_in sequence
    (steps0 = tokens generated so far) — outputs equal the uninterrupted
    sampled run."""
    eng = mk_engine()
    kw = dict(top_k=8, random_seed=42, temperature=0.9)
    o = eng.generate([PROMPTS[0]], output_len=16, top_p=0.0,
                     **{k: v for k, v in kw.items()})
    n = int(o.sequence_lengths[0, 0])
    ref = [int(x) for x in o.output_ids[0, 0, :n]]
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=8,
        paged=dict(num_pages=5, page_size=8, lazy=True),
    )
    lo = cb.submit(PROMPTS[0], 16, priority=5, **kw)
    hi = cb.submit(PROMPTS[1], 16, top_k=1, priority=0)
    done = cb.run(max_ticks=400)
    assert done[lo].preemptions >= 1, "test needs the sampled request preempted"
    assert done[lo].output_ids == ref, (done[lo].output_ids, ref)


def test_ensure_pages_survives_requests_retiring_during_flush():
    """Review fix: _ensure_pages must skip requests that RETIRE (done, pages
    released) while a preemption flushes in-flight ticks — previously it
    crashed the driver on r._pages.extend(None) and leaked the fresh pages."""
    eng = mk_engine()
    cb = ContinuousBatcher(
        eng, max_slots=3, max_seq_len=32, prompt_bucket=8,
        paged=dict(num_pages=7, page_size=8, lazy=True),
        pipeline_ticks=True,
    )
    uids = [cb.submit(PROMPTS[i % 4], 18, top_k=1, priority=i % 2)
            for i in range(3)]
    # simulate the race directly: a running request retires mid-flush
    for _ in range(4):
        cb.step()
    victim = next(iter(cb.running.values()))
    victim.done = True
    if victim._pages:
        cb.allocator.release(victim._pages)
    victim._pages = None
    cb._ensure_pages()  # must not raise on the stale entry
    # and the stress path: many early-EOS requests under pressure
    refs = refs_for(eng, PROMPTS, [10] * 4)
    done = cb.run(max_ticks=600)
    for uid in uids:
        assert done[uid].done


def test_streaming_decoder_survives_preemption():
    """Review fix: a preempted+resumed request keeps its stateful
    TokenStreamDecoder — streamed text equals the final decode."""
    import sys

    sys.path.insert(0, "tests")
    from test_api import CharTokenizer

    tok = CharTokenizer()
    eng = mk_engine()
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=8,
        paged=dict(num_pages=6, page_size=8, lazy=True),
    )
    streamed = []
    lo = cb.submit(PROMPTS[1], 20, top_k=1, priority=5,
                   on_text=streamed.append, tokenizer=tok)
    hi = cb.submit(PROMPTS[0], 20, top_k=1, priority=0)
    done = cb.run(max_ticks=500)
    assert done[lo].preemptions >= 1, "test needs the streaming request preempted"
    gen = []
    for t in done[lo].output_ids[len(PROMPTS[1]):]:
        if t == eng.config.end_id:
            break
        gen.append(int(t))
    assert "".join(streamed) == tok.decode(gen), (streamed, gen)


def test_aging_bounds_preemptions_under_sustained_pressure():
    """Priority aging: a low-priority request under a sustained stream of
    high-priority arrivals is preempted at most (priority gap + 1) times —
    each preemption promotes it one class until it stops being victim-
    eligible (the starvation hazard the strict-(priority, uid) order had)."""
    eng = mk_engine()
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=64, prompt_bucket=8,
        paged=dict(num_pages=9, page_size=8, lazy=True),
    )
    lo = cb.submit(PROMPTS[0], 24, top_k=1, priority=3)
    hi_uids = [
        cb.submit(PROMPTS[1 + (i % 2)], 16, top_k=1, priority=0)
        for i in range(6)
    ]
    done = cb.run(max_ticks=2000)
    assert done[lo].done and all(done[u].done for u in hi_uids)
    # gap is 3 classes -> at most 4 preemptions before lo outranks priority 0
    assert done[lo].preemptions <= 4, done[lo].preemptions
