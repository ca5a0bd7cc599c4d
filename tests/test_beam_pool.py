"""Beam search served from the continuous-batching pool (VERDICT r4 item 2).

Done criterion: a pooled beam request returns IDENTICAL beams to the static
path (sampling/beam.py one-shot loop), and the handler routes beam_width > 1
through the pool. Reference behavior: beams decode inside the same forward as
any batch, DynamicDecodeLayer.cc:309-409 + cache_indirection
(GptNeoX.cc:776-778, 1011-1017).
"""
import json

import numpy as np

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.engine.beam_pool import BeamPool
from fastertransformer4codefuse_tpu.parallel.sharding import build_mesh

PROMPTS = [[3, 4, 5], [9, 8, 7, 6, 5], [11, 12], [20, 21, 22, 23]]
OUT_LENS = [5, 4, 6, 3]


def mk_engine(mesh=None, tp=1):
    cfg = GptNeoXConfig.tiny(head_num=8, size_per_head=8, vocab_size=64)
    params = init_params(cfg, dtype="fp32")
    eng = GptNeoXEngine(
        cfg, params,
        RuntimeConfig(dtype="fp32", seq_bucket=8, tensor_para_size=tp),
        mesh=mesh,
    )
    return eng


def static_beams(eng, prompt, out_len, bw, **kw):
    o = eng.generate([prompt], output_len=out_len, beam_width=bw, **kw)
    beams, cums = [], []
    for j in range(bw):
        n = int(o.sequence_lengths[0, j])
        beams.append([int(x) for x in o.output_ids[0, j, :n]])
        cums.append(float(o.cum_log_probs[0, j]))
    return beams, cums


def test_beam_pool_matches_static_beams():
    eng = mk_engine()
    bw = 2
    kws = [
        dict(),
        dict(beam_search_diversity_rate=0.4),
        dict(len_penalty=0.8),
        dict(temperature=0.8, repetition_penalty=1.2),
    ]
    refs = [
        static_beams(eng, p, ol, bw, **kw)
        for p, ol, kw in zip(PROMPTS, OUT_LENS, kws)
    ]
    pool = BeamPool(eng, max_slots=2, beam_width=bw, max_seq_len=32, prompt_bucket=8)
    uids = [
        pool.submit(p, ol, **kw)
        for p, ol, kw in zip(PROMPTS, OUT_LENS, kws)
    ]
    done = pool.run(max_ticks=300)
    for i, (uid, (ref_beams, ref_cum)) in enumerate(zip(uids, refs)):
        r = done[uid]
        assert r.done, f"req {i} never finished"
        assert r.beam_output_ids == ref_beams, (
            i, r.beam_output_ids, ref_beams
        )
        np.testing.assert_allclose(r.beam_cum_log_probs, ref_cum, rtol=1e-5)
        assert r.output_ids == ref_beams[0]


def test_beam_pool_beam4():
    eng = mk_engine()
    bw = 4
    refs = [static_beams(eng, p, ol, bw) for p, ol in zip(PROMPTS[:2], OUT_LENS[:2])]
    pool = BeamPool(eng, max_slots=2, beam_width=bw, max_seq_len=32, prompt_bucket=8)
    uids = [pool.submit(p, ol) for p, ol in zip(PROMPTS[:2], OUT_LENS[:2])]
    done = pool.run(max_ticks=300)
    for uid, (ref_beams, _) in zip(uids, refs):
        assert done[uid].beam_output_ids == ref_beams


def test_beam_pool_stop_words_match_static():
    eng = mk_engine()
    bw = 2
    # learn a mid-output token from an unconstrained run, then stop on it
    probe, _ = static_beams(eng, PROMPTS[0], 6, bw)
    stop_tok = probe[0][len(PROMPTS[0]) + 2]
    sw = np.array([[[stop_tok], [1]]], np.int32)
    ref_beams, ref_cum = static_beams(
        eng, PROMPTS[0], 6, bw, stop_words_list=sw
    )
    pool = BeamPool(eng, max_slots=2, beam_width=bw, max_seq_len=32, prompt_bucket=8)
    uid = pool.submit(PROMPTS[0], 6, stop_words=[[stop_tok]])
    done = pool.run(max_ticks=200)
    assert done[uid].beam_output_ids == ref_beams


def test_beam_pool_midflight_interleave():
    """A short beam request admitted mid-flight finishes before a long one,
    with both matching their static-path beams (continuous-batching property
    preserved for beams)."""
    eng = mk_engine()
    bw = 2
    ref_long = static_beams(eng, [9, 8, 7, 6, 5], 12, bw)[0]
    ref_short = static_beams(eng, [3, 4], 2, bw)[0]
    pool = BeamPool(eng, max_slots=2, beam_width=bw, max_seq_len=32, prompt_bucket=8)
    long_uid = pool.submit([9, 8, 7, 6, 5], 12)
    for _ in range(3):
        pool.step()
    short_uid = pool.submit([3, 4], 2)
    order = []
    for _ in range(200):
        for uid, _t, fin in pool.step():
            if fin:
                order.append(uid)
        if len(order) == 2:
            break
    assert order == [short_uid, long_uid]
    assert pool.requests[short_uid].beam_output_ids == ref_short
    assert pool.requests[long_uid].beam_output_ids == ref_long


def test_beam_pool_under_tp_mesh():
    """Pooled beams under TP4: the indirection-resolved attention and the
    cross-beam merge must be numerically invisible to the sharding."""
    eng0 = mk_engine()
    bw = 2
    refs = [static_beams(eng0, p, ol, bw) for p, ol in zip(PROMPTS, OUT_LENS)]
    eng = mk_engine(mesh=build_mesh(tp=4), tp=4)
    pool = BeamPool(eng, max_slots=2, beam_width=bw, max_seq_len=32, prompt_bucket=8)
    assert pool._state["cache"]["k"].sharding.spec[2] == "tp"
    uids = [pool.submit(p, ol) for p, ol in zip(PROMPTS, OUT_LENS)]
    done = pool.run(max_ticks=300)
    for uid, (ref_beams, _) in zip(uids, refs):
        assert done[uid].beam_output_ids == ref_beams


def test_handler_routes_beams_through_pool():
    """CodeFuseHandler with a beam pool class serves beam_width=2 requests
    from the pool (no static fallback) with the static path's exact response
    content."""
    from test_api import CharTokenizer, VocabTrie
    from fastertransformer4codefuse_tpu.api.handler import CodeFuseHandler

    tok = CharTokenizer(("vo", "void"))
    cfg = GptNeoXConfig.tiny(vocab_size=64, end_id=1)
    params = init_params(cfg, dtype="fp32")
    eng = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))
    trie = VocabTrie(tok.get_vocab())
    static = CodeFuseHandler(engine=eng, tokenizer=tok, trie=trie, warmup=False)
    pooled = CodeFuseHandler(
        engine=eng, tokenizer=tok, trie=trie, warmup=False,
        pool=[
            dict(max_slots=2, max_seq_len=64, prompt_bucket=8),
            dict(max_slots=2, max_seq_len=64, prompt_bucket=8, beam_width=2),
        ],
    )
    try:
        request = {
            "prompts": [
                {"prompt": "quick sort\n", "last_token": "",
                 "stop_words": [], "len_penalty": 0.6},
            ],
            "out_seq_length": 6,
            "beam_width": 2,
        }
        beam_srv = [
            s for s in pooled.server.servers
            if getattr(s.batcher, "beam_width", 1) == 2
        ][0]
        beam_submits = []
        orig_submit = beam_srv.submit
        beam_srv.submit = lambda *a, **k: beam_submits.append(1) or orig_submit(*a, **k)
        code_s, err_s, res_s = static.predict(request, "static")
        code_p, err_p, res_p = pooled.predict(request, "pooled")
        assert code_s == 0 and code_p == 0, (err_s, err_p)
        rs = json.loads(res_s["res"])
        rp = json.loads(res_p["res"])
        assert rp["generated_code"] == rs["generated_code"]
        assert rp["length"] == rs["length"]
        np.testing.assert_allclose(
            rp["cum_log_prob"], rs["cum_log_prob"], rtol=1e-5
        )
        # prove it actually rode the pool: the beam class saw the submit
        assert beam_submits, "beam request did not route to the beam pool class"
        # sampling requests still route to the bw=1 class
        code_q, _, res_q = pooled.predict(
            {"prompts": [{"prompt": "hello", "top_k": 1, "last_token": "",
                          "stop_words": []}], "out_seq_length": 4},
            "q",
        )
        assert code_q == 0
    finally:
        pooled.server.close()
