"""Prompt-lookup speculative decoding: output-exactness vs plain greedy and
acceptance mechanics."""
import numpy as np
import pytest

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.engine.speculative import (
    propose_ngram,
    speculative_generate,
)


def test_propose_ngram():
    toks = np.asarray([5, 6, 7, 9, 5, 6, 7, 8, 1, 5, 6, 7], np.int32)
    # trailing (5,6,7): most recent earlier occurrence at index 4 -> [8, 1, 5]
    np.testing.assert_array_equal(propose_ngram(toks, 3, 3), [8, 1, 5])
    # no match
    assert len(propose_ngram(np.asarray([1, 2, 3, 4], np.int32), 3, 4)) == 0
    # match must prefer the LATEST occurrence
    toks2 = np.asarray([5, 6, 1, 5, 6, 2, 5, 6], np.int32)
    np.testing.assert_array_equal(propose_ngram(toks2, 2, 2), [2, 5])


def mk_engine(seed=0):
    import jax

    cfg = GptNeoXConfig.tiny(head_num=4, size_per_head=8, vocab_size=64)
    params = init_params(cfg, rng=jax.random.PRNGKey(seed), dtype="fp32")
    eng = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))
    return cfg, eng


@pytest.mark.parametrize("k", [4, 8])
def test_speculative_output_exact_vs_greedy(k):
    """Every emitted token must equal plain greedy decoding's — speculation
    only changes the number of device round-trips."""
    cfg, eng = mk_engine()
    # a repetitive prompt so the n-gram lookup actually fires
    prompt = [7, 8, 9, 10, 7, 8, 9, 10, 7, 8, 9, 10, 7, 8]
    OUT = 16
    ref = eng.generate([prompt], output_len=OUT, top_k=1)
    n = int(ref.sequence_lengths[0, 0])
    want = [int(x) for x in ref.output_ids[0, 0, :n]]

    got, stats = speculative_generate(eng, prompt, OUT, k=k, ngram=3)
    assert got == want, (got, want)
    assert stats.emitted == len(got) - len(prompt)
    assert stats.iterations >= 1


def test_speculative_accepts_on_repetitive_continuation():
    """A model generating a repeating cycle must reach multi-token steps
    (tokens_per_step > 1) — the speedup mechanism itself."""
    cfg, eng = mk_engine(seed=3)
    # find a prompt whose greedy continuation enters a cycle: tiny random
    # models almost always settle into one
    prompt = [3, 4, 5]
    OUT = 24
    ref = eng.generate([prompt], output_len=OUT, top_k=1)
    n = int(ref.sequence_lengths[0, 0])
    want = [int(x) for x in ref.output_ids[0, 0, :n]]
    got, stats = speculative_generate(eng, prompt, OUT, k=8, ngram=3)
    assert got == want
    if len(want) == len(prompt) + OUT:  # no early EOS: cycle expected
        assert stats.accepted > 0
        assert stats.tokens_per_step > 1.0, vars(stats)


def test_speculative_eos_stops():
    cfg, eng = mk_engine(seed=1)
    prompt = [3, 4, 5, 6]
    ref = eng.generate([prompt], output_len=30, top_k=1)
    n = int(ref.sequence_lengths[0, 0])
    want = [int(x) for x in ref.output_ids[0, 0, :n]]
    got, _ = speculative_generate(eng, prompt, 30, k=6)
    assert got == want  # incl. EOS truncation behavior


def test_batched_matches_per_row_b1():
    """Batched speculation must emit, per row, exactly what the B=1 path
    emits for that prompt alone — ragged prompts, shared loop."""
    from fastertransformer4codefuse_tpu.engine.speculative import (
        speculative_generate_batched,
    )

    cfg, eng = mk_engine(seed=2)
    prompts = [
        [7, 8, 9, 10, 7, 8, 9, 10, 7, 8, 9, 10, 7, 8],
        [3, 4, 5],
        [11, 12, 11, 12, 11, 12, 11],
    ]
    OUT = 14
    outs, stats = speculative_generate_batched(eng, prompts, OUT, k=6, ngram=3)
    assert len(outs) == len(prompts) == len(stats)
    for p, got, st in zip(prompts, outs, stats):
        want, _ = speculative_generate(eng, p, OUT, k=6, ngram=3)
        assert got == want, (p, got, want)
        assert st.emitted == len(got) - len(p)


def test_batched_matches_plain_greedy_and_eos():
    """And therefore plain greedy engine output (incl. EOS truncation)."""
    from fastertransformer4codefuse_tpu.engine.speculative import (
        speculative_generate_batched,
    )

    cfg, eng = mk_engine(seed=1)
    prompts = [[3, 4, 5, 6], [9, 2, 9, 2, 9]]
    OUT = 20
    outs, _ = speculative_generate_batched(eng, prompts, OUT, k=6, ngram=3)
    ref = eng.generate(prompts, output_len=OUT, top_k=1)
    for b, p in enumerate(prompts):
        n = int(ref.sequence_lengths[b, 0])
        want = [int(x) for x in ref.output_ids[b, 0, :n]]
        assert outs[b] == want, (b, outs[b], want)
