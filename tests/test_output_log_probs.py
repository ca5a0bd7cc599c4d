"""Per-step output_log_probs — the reference's optional output tensor
(GptNeoX.cc output tensor map `output_log_probs`, kernels/logprob_kernels.cu):
log-prob of each generated token at each step, alongside cum_log_probs.
"""
import numpy as np

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)


def _engine(**cfg_kw):
    cfg = GptNeoXConfig.tiny(vocab_size=64, **cfg_kw)
    params = init_params(cfg, dtype="fp32")
    return cfg, GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=4))


def test_output_log_probs_sampling_path():
    cfg, eng = _engine()
    prompts = [[3, 4, 5, 17], [9, 8]]
    out = eng.generate(prompts, output_len=6, top_k=1, output_log_probs=True)
    assert out.output_log_probs is not None
    assert out.output_log_probs.shape == (2, 1, 6)
    # sum of per-step log-probs == cum_log_probs (finished rows append 0.0)
    np.testing.assert_allclose(
        out.output_log_probs.sum(-1), out.cum_log_probs, rtol=1e-5, atol=1e-5
    )
    # every pre-finish step's log-prob must be a genuine log-probability
    for b in range(2):
        gen = int(out.sequence_lengths[b, 0]) - len(prompts[b])
        lp = out.output_log_probs[b, 0]
        assert (lp[:gen] <= 1e-6).all()
        assert (lp[gen:] == 0.0).all()
    # default off: no buffer carried, None returned
    out2 = eng.generate(prompts, output_len=6, top_k=1)
    assert out2.output_log_probs is None


def test_output_log_probs_matches_teacher_forcing():
    """Each step's value equals log_softmax(logits)[token] — pinned by
    rescoring the greedy sequence teacher-forced."""
    import jax
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.models import gptneox as model

    cfg, eng = _engine()
    prompt = [3, 4, 5, 17]
    out = eng.generate([prompt], output_len=5, top_k=1, output_log_probs=True)
    T = int(out.sequence_lengths[0, 0])
    seq = list(out.output_ids[0, 0, :T])
    cache = model.init_kv_cache(cfg, 1, T, jnp.float32)
    hidden, _ = model.prefill(
        cfg, eng.params, jnp.asarray([seq], jnp.int32),
        jnp.asarray([T], jnp.int32), cache,
    )
    lp = jax.nn.log_softmax(
        model.lm_logits(cfg, eng.params, hidden)[0], axis=-1
    )
    for t in range(len(prompt), T):
        want = float(lp[t - 1, seq[t]])
        got = float(out.output_log_probs[0, 0, t - len(prompt)])
        assert abs(got - want) < 1e-4, (t, got, want)


def test_output_log_probs_streaming_matches_batch():
    cfg, eng = _engine()
    prompts = [[3, 4, 5, 17]]
    batch = eng.generate(prompts, output_len=5, top_k=1, output_log_probs=True)
    toks = []
    stream = eng.generate(
        prompts, output_len=5, top_k=1, output_log_probs=True,
        callback=lambda d: toks.append(d),
    )
    np.testing.assert_allclose(
        batch.output_log_probs, stream.output_log_probs, rtol=1e-6
    )


def test_output_log_probs_beam():
    """Beam path: the buffer follows each hypothesis' reorder path, so the
    per-step values sum to that hypothesis' cum_log_prob (the parity the
    reference guarantees between output_log_probs and cum_log_probs)."""
    cfg, eng = _engine(head_num=4, size_per_head=8)
    prompt = [3, 4, 5, 6]
    out = eng.generate(
        [prompt], output_len=6, beam_width=3, output_log_probs=True
    )
    assert out.output_log_probs.shape == (1, 3, 6)
    np.testing.assert_allclose(
        out.output_log_probs.sum(-1), out.cum_log_probs, rtol=1e-5, atol=1e-5
    )
    # each step value is a single-token log-prob (<= 0) until finish
    for j in range(3):
        gen = int(out.sequence_lengths[0, j]) - len(prompt)
        lp = out.output_log_probs[0, j]
        assert (lp[:gen] <= 1e-6).all()
