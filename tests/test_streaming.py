"""Fused-loop streaming (ordered io_callback inside the jitted while_loop):
message content must be byte-identical to the non-streaming outputs, with the
reference's callback message format and per-row repeat semantics
(pybind_callback_utils.cc:79-99)."""
import numpy as np

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)


def make_engine(seed=0):
    cfg = GptNeoXConfig.tiny(vocab_size=70)
    import jax

    params = init_params(cfg, rng=jax.random.PRNGKey(seed), dtype="fp32")
    return cfg, GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))


PROMPTS = [[3, 4, 5], [9, 8, 7, 6]]


def test_stream_matches_batch_greedy():
    cfg, eng = make_engine()
    ref = eng.generate(PROMPTS, output_len=6, top_k=1)
    msgs = []
    out = eng.generate(PROMPTS, output_len=6, top_k=1, callback=msgs.append)
    np.testing.assert_array_equal(out.output_ids, ref.output_ids)
    assert len(msgs) == 6
    for b, p in enumerate(PROMPTS):
        toks = [m["last_tokens"][b][0] for m in msgs]
        assert toks == list(ref.output_ids[b, 0, len(p) : len(p) + 6])
        idxs = [m["idxs"][b][0] for m in msgs]
        assert idxs == list(range(6))


def test_stream_matches_batch_sampled():
    cfg, eng = make_engine(seed=1)
    kw = dict(top_k=[5, 3], top_p=[0.9, 0.0], temperature=0.8, random_seed=[7, 8])
    ref = eng.generate(PROMPTS, output_len=5, **kw)
    msgs = []
    out = eng.generate(PROMPTS, output_len=5, callback=msgs.append, **kw)
    np.testing.assert_array_equal(out.output_ids, ref.output_ids)
    assert len(msgs) == 5


def test_stream_early_stop_and_repeat_semantics():
    """Rows that finish early keep appearing with end_id and a stale idx (the
    reference's last_seq_length forcing); the loop exits when all rows are
    done, so the message count equals the executed steps."""
    cfg, eng = make_engine(seed=2)
    ref = eng.generate(PROMPTS, output_len=6, top_k=1)
    # stop row 0 after its first generated token; row 1 runs to 6
    sw = np.array(
        [[[int(ref.output_ids[0, 0, 3])], [1]], [[-1], [-1]]], np.int32
    )
    msgs = []
    out = eng.generate(
        PROMPTS, output_len=6, top_k=1, stop_words_list=sw, callback=msgs.append
    )
    assert len(msgs) == 6
    assert out.sequence_lengths[0, 0] == 4
    end_id = cfg.end_id
    row0 = [m["last_tokens"][0][0] for m in msgs]
    assert row0[0] == ref.output_ids[0, 0, 3]
    assert all(t == end_id for t in row0[1:])
    idx0 = [m["idxs"][0][0] for m in msgs]
    assert idx0 == [0] + [0] * 5  # stale idx repeats
    # the still-running row streams normally
    row1 = [m["last_tokens"][1][0] for m in msgs]
    assert row1 == list(out.output_ids[1, 0, 4:10])


def test_stream_stepwise_fallback_matches_fused(monkeypatch):
    """Backends without host-callback support (axon PJRT raises UNIMPLEMENTED
    on unordered io_callback and deadlocks on ordered-in-loop) must fall back
    to the stepwise loop with identical message stream and outputs."""
    from fastertransformer4codefuse_tpu.engine import engine as engine_mod

    cfg, eng = make_engine(seed=3)
    ref_msgs = []
    ref = eng.generate(PROMPTS, output_len=6, top_k=1, callback=ref_msgs.append)

    monkeypatch.setattr(engine_mod, "_HOST_CB_SUPPORTED", False)
    msgs = []
    out = eng.generate(PROMPTS, output_len=6, top_k=1, callback=msgs.append)
    np.testing.assert_array_equal(out.output_ids, ref.output_ids)
    assert msgs == ref_msgs


def test_host_callbacks_probe_caches(monkeypatch):
    from fastertransformer4codefuse_tpu.engine import engine as engine_mod

    monkeypatch.setattr(engine_mod, "_HOST_CB_SUPPORTED", None)
    first = engine_mod.host_callbacks_supported()
    assert first is True  # CPU backend runs io_callback
    assert engine_mod.host_callbacks_supported() is first
