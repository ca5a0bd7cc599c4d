"""Encoder micro-batching server: concurrent requests coalesce into batched
forwards with per-request results identical to solo encodes — the
self-contained analog of the reference's Triton dynamic batching for BERT
(triton_backend/bert/BertTritonModel.cc)."""
import threading

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from fastertransformer4codefuse_tpu.engine.encoder_server import (
    EncoderBatchingServer,
)
from fastertransformer4codefuse_tpu.models import registry
from test_bert import make_hf_bert
from fastertransformer4codefuse_tpu.models.bert import (
    config_from_hf_bert,
    encode,
    params_from_hf_bert_state_dict,
)


def test_encoder_server_batches_and_matches_solo():
    hf = make_hf_bert(seed=0)
    cfg = config_from_hf_bert(hf.config)
    params = params_from_hf_bert_state_dict(cfg, hf.state_dict())
    eng = registry.get("bert").make_engine(cfg, params)
    srv = EncoderBatchingServer(eng, max_batch=8, seq_bucket=8, max_seq_len=32)
    try:
        rng = np.random.RandomState(1)
        reqs = [list(rng.randint(0, cfg.vocab_size, size=(n,)))
                for n in (5, 9, 3, 12, 7, 9, 4, 11, 6, 8)]
        solo = []
        for ids in reqs:
            W = -(-len(ids) // 8) * 8
            padded = np.zeros((1, W), np.int32)
            padded[0, : len(ids)] = ids
            h, p = encode(cfg, params, jnp.asarray(padded),
                          jnp.asarray([len(ids)], jnp.int32))
            solo.append((np.asarray(h)[0, : len(ids)], np.asarray(p)[0]))

        results = [None] * len(reqs)

        def call(i):
            results[i] = srv.encode(reqs[i], timeout=120)

        ts = [threading.Thread(target=call, args=(i,)) for i in range(len(reqs))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert all(r is not None for r in results)
        for i, ((h, p), (sh, sp)) in enumerate(zip(results, solo)):
            np.testing.assert_allclose(h, sh, rtol=2e-5, atol=2e-6, err_msg=str(i))
            np.testing.assert_allclose(p, sp, rtol=2e-5, atol=2e-6)
        # dynamic batching actually happened: fewer forwards than requests
        assert srv.batches_run < len(reqs), srv.batches_run
        assert srv.requests_served == len(reqs)
    finally:
        srv.close()


def test_encoder_server_rejects_oversize_and_survives():
    hf = make_hf_bert(seed=1)
    cfg = config_from_hf_bert(hf.config)
    params = params_from_hf_bert_state_dict(cfg, hf.state_dict())
    eng = registry.get("bert").make_engine(cfg, params)
    srv = EncoderBatchingServer(eng, max_batch=4, seq_bucket=8, max_seq_len=16)
    try:
        with pytest.raises(ValueError):
            srv.encode(list(range(40)))
        h, p = srv.encode([1, 2, 3], timeout=120)
        assert h.shape[0] == 3
    finally:
        srv.close()


def test_t5_batching_server_matches_solo():
    """Concurrent T5 generate requests with the same statics coalesce into
    one engine call; greedy AND per-request-seeded sampled outputs equal
    batched solo runs; mixed output_lens split into separate batches."""
    from fastertransformer4codefuse_tpu.engine.encoder_server import (
        T5BatchingServer,
    )
    from fastertransformer4codefuse_tpu.engine.t5_engine import T5Engine
    from test_t5_engine import mk, ids_for

    _hf, cfg, params = mk(seed=2)
    eng = T5Engine(cfg, params)
    srv = T5BatchingServer(eng, max_batch=8, seq_bucket=8, max_seq_len=32)
    try:
        ids = ids_for(cfg, 6, 7)
        # solo references through the same engine (greedy rows + one sampled)
        solo = []
        for i in range(6):
            kw = dict(top_k=1) if i != 3 else dict(top_k=5, random_seed=77)
            o = eng.generate([list(ids[i])], 6, **kw)
            solo.append(o.output_ids[0])
        results = [None] * 6

        def call(i):
            kw = dict(top_k=1) if i != 3 else dict(top_k=5, random_seed=77)
            results[i] = srv.generate(list(ids[i]), 6, timeout=240, **kw)

        ts = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=240)
        for i in range(6):
            np.testing.assert_array_equal(results[i].output_ids, solo[i])
        assert srv.batches_run < 6  # coalescing happened
        # beam request (different statics) still works
        ob = srv.generate(list(ids[0]), 6, beam_width=2, timeout=240)
        ref = eng.generate([list(ids[0])], 6, beam_width=2)
        np.testing.assert_array_equal(ob.output_ids, ref.output_ids[0])
    finally:
        srv.close()
