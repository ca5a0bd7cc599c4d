"""Speculative decoding served from the continuous-batching pool: per-slot
drafts, one shared (k+1)-wide verify tick, per-slot commit widths."""
import numpy as np
import pytest

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.engine.spec_pool import SpecPool


def mk_engine(seed=0):
    import jax

    cfg = GptNeoXConfig.tiny(head_num=4, size_per_head=8, vocab_size=64)
    params = init_params(cfg, rng=jax.random.PRNGKey(seed), dtype="fp32")
    eng = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))
    return cfg, eng


PROMPTS = [
    [7, 8, 9, 10, 7, 8, 9, 10, 7, 8, 9, 10, 7, 8],
    [3, 4, 5],
    [11, 12, 11, 12, 11, 12, 11],
    [9, 2, 9, 2, 9],
]


def greedy_ref(eng, prompt, out_len):
    ref = eng.generate([prompt], output_len=out_len, top_k=1)
    n = int(ref.sequence_lengths[0, 0])
    return [int(x) for x in ref.output_ids[0, 0, :n]]


def test_spec_pool_matches_plain_greedy():
    """Every pooled request's output equals the engine's one-shot greedy
    (incl. EOS truncation), with multi-token commits happening."""
    cfg, eng = mk_engine(seed=2)
    pool = SpecPool(eng, k=6, ngram=3, max_slots=4, max_seq_len=64,
                    prompt_bucket=8)
    OUT = 14
    uids = {pool.submit(p, OUT): p for p in PROMPTS}
    done = pool.run()
    for uid, p in uids.items():
        want = greedy_ref(eng, p, OUT)
        assert done[uid].output_ids == want, (p, done[uid].output_ids, want)


def test_spec_pool_multi_token_ticks_and_interleave():
    """A repetitive workload must reach >1 token/tick for some slot, and a
    request submitted mid-flight (after some ticks) still matches greedy."""
    cfg, eng = mk_engine(seed=3)
    pool = SpecPool(eng, k=8, ngram=3, max_slots=2, max_seq_len=64,
                    prompt_bucket=8)
    OUT = 20
    u0 = pool.submit(PROMPTS[0], OUT)
    max_burst = 0
    for _ in range(4):
        for uid, tok, fin in pool.step():
            pass
    # mid-flight join
    u1 = pool.submit(PROMPTS[2], OUT)
    emitted_per_tick = []
    for _ in range(200):
        em = pool.step()
        emitted_per_tick.append(len(em))
        max_burst = max(max_burst, len(em))
        if not pool.pending and not pool.running:
            break
    for uid, p in ((u0, PROMPTS[0]), (u1, PROMPTS[2])):
        want = greedy_ref(eng, p, OUT)
        assert pool.requests[uid].output_ids == want
    # the speedup mechanism: some tick emitted more than one token per slot
    assert max_burst > 2, emitted_per_tick


def test_spec_pool_streaming_and_log_probs_match_static():
    """on_token streams commits in order; cum_log_prob matches the one-shot
    engine's greedy log-prob sum."""
    cfg, eng = mk_engine(seed=1)
    pool = SpecPool(eng, k=6, ngram=3, max_slots=2, max_seq_len=64,
                    prompt_bucket=8, return_log_probs=True)
    OUT = 12
    prompt = PROMPTS[0]
    got_stream = []
    uid = pool.submit(prompt, OUT, on_token=got_stream.append)
    done = pool.run()
    out = done[uid].output_ids
    want = greedy_ref(eng, prompt, OUT)
    assert out == want
    assert got_stream == out[len(prompt):]
    ref = eng.generate([prompt], output_len=OUT, top_k=1,
                       return_cum_log_probs=True)
    np.testing.assert_allclose(
        done[uid].cum_log_prob, float(ref.cum_log_probs[0, 0]), atol=1e-3,
    )


def test_spec_pool_rejects_non_greedy():
    cfg, eng = mk_engine()
    pool = SpecPool(eng, k=4, max_slots=2, max_seq_len=64, prompt_bucket=8)
    with pytest.raises(ValueError):
        pool.make_request([1, 2, 3], 8, top_k=4)
    with pytest.raises(ValueError):
        pool.make_request([1, 2, 3], 8, stop_words=[[5]])
    with pytest.raises(ValueError):
        pool.make_request([1, 2, 3], 60)  # no draft margin left


def test_spec_pool_pipelined_ticks_match():
    """pipeline_ticks=True (the serving/bench default): dispatch-before-fetch
    must not change any output — emissions lag one tick but attribution and
    commits stay exact."""
    cfg, eng = mk_engine(seed=2)
    OUT = 14
    refs = {tuple(p): greedy_ref(eng, p, OUT) for p in PROMPTS}
    pool = SpecPool(eng, k=6, ngram=3, max_slots=2, max_seq_len=64,
                    prompt_bucket=8, pipeline_ticks=True)
    uids = {pool.submit(p, OUT): p for p in PROMPTS}
    done = pool.run()
    for uid, p in uids.items():
        assert done[uid].output_ids == refs[tuple(p)], (p, done[uid].output_ids)
