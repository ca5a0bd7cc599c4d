"""Beam search: structure, score ordering, stop criteria
(the analog of the reference's beam layer tests and the input_demo.jsonl
beam_width=3 smoke, SURVEY §4)."""
import numpy as np
import pytest

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)


def make_engine(seed=0):
    cfg = GptNeoXConfig.tiny(head_num=4, size_per_head=8, vocab_size=64)
    import jax

    params = init_params(cfg, rng=jax.random.PRNGKey(seed), dtype="fp32")
    return cfg, GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=4))


def test_beam_shapes_and_order():
    cfg, eng = make_engine()
    prompts = [[3, 4, 5], [9, 8, 7, 6]]
    out = eng.generate(prompts, output_len=5, beam_width=3)
    assert out.output_ids.shape[:2] == (2, 3)
    assert out.output_ids.shape[2] >= 4 + 5
    assert out.sequence_lengths.shape == (2, 3)
    assert out.cum_log_probs.shape == (2, 3)
    # beams sorted best-first by (unpenalized, len_penalty=0) cumulative score
    for b in range(2):
        s = out.cum_log_probs[b]
        assert (np.diff(s) <= 1e-5).all(), s
    # prompt preserved in every beam
    for b, p in enumerate(prompts):
        for j in range(3):
            assert list(out.output_ids[b, j, : len(p)]) == p


def test_beam_beats_or_matches_greedy():
    """The best beam's cumulative log prob must be >= greedy's (same model)."""
    cfg, eng = make_engine(seed=1)
    prompts = [[5, 6, 7]]
    greedy = eng.generate(prompts, output_len=6, top_k=1)
    beam = eng.generate(prompts, output_len=6, beam_width=4)
    assert beam.cum_log_probs[0, 0] >= greedy.cum_log_probs[0, 0] - 1e-4


def test_beam_distinct_hypotheses():
    cfg, eng = make_engine(seed=2)
    out = eng.generate([[3, 4, 5, 6]], output_len=6, beam_width=3)
    rows = [tuple(r) for r in out.output_ids[0, :, 4:10]]
    assert len(set(rows)) > 1, "beams all collapsed to one hypothesis"


def test_beam_stop_words():
    cfg, eng = make_engine(seed=3)
    g = eng.generate([[3, 4, 5]], output_len=5, beam_width=2)
    first_tok = int(g.output_ids[0, 0, 3])
    sw = np.array([[[first_tok], [1]]], np.int32)
    out = eng.generate([[3, 4, 5]], output_len=5, beam_width=2, stop_words_list=sw)
    # the beam that picked first_tok stops right after it
    lens = out.sequence_lengths[0]
    toks = out.output_ids[0]
    for j in range(2):
        if toks[j, 3] == first_tok:
            assert lens[j] == 4


def test_beam_streaming_matches_batch():
    cfg, eng = make_engine(seed=4)
    prompts = [[3, 4, 5, 6]]
    batch = eng.generate(prompts, output_len=5, beam_width=2)
    events = []
    stream = eng.generate(
        prompts, output_len=5, beam_width=2,
        callback=lambda m: events.append(m),
    )
    assert len(events) >= 1
    assert all(len(e["last_tokens"][0]) == 2 for e in events)
    # final outputs identical between modes
    np.testing.assert_array_equal(batch.output_ids, stream.output_ids)
    np.testing.assert_array_equal(batch.sequence_lengths, stream.sequence_lengths)
