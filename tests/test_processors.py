"""Logit-processor unit coverage: bad words, penalties, min length
(the analog of the reference's test_sampling_layer.cu invalid/edge cases)."""
import numpy as np

import jax.numpy as jnp

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.sampling import processors as proc


def test_ban_bad_words_prefix_match():
    BB, V, T = 2, 32, 10
    logits = jnp.zeros((BB, V))
    buf = jnp.zeros((BB, T), jnp.int32)
    # row 0 ends with [5, 6]; bad word [5, 6, 7] -> ban 7; word [9] -> always ban
    buf = buf.at[0, 0].set(5).at[0, 1].set(6)
    cur_end = jnp.asarray([2, 0])
    bad = np.full((2, 2, 4), -1, np.int32)
    bad[0, 0, :4] = [5, 6, 7, 9]
    bad[0, 1, :2] = [3, 4]  # offsets: word0 = ids[0:3], word1 = ids[3:4]
    out = np.asarray(proc.ban_bad_words(logits, buf, cur_end, jnp.asarray(bad), 1))
    assert out[0, 7] < -1e30  # prefix matched -> completion banned
    assert out[0, 9] < -1e30  # single-token bad word always banned
    assert out[0, 8] == 0
    assert (out[1] == 0).all()  # row 1 has no bad words (padded -1)


def test_presence_penalty_and_min_length():
    BB, V, T = 1, 16, 6
    logits = jnp.ones((BB, V))
    buf = jnp.asarray([[3, 5, 3, 0, 0, 0]], jnp.int32)
    valid = jnp.asarray([[True, True, True, False, False, False]])
    out = np.asarray(
        proc.apply_presence_penalty(logits, buf, valid, jnp.asarray([0.5]))
    )
    assert np.isclose(out[0, 3], 0.5) and np.isclose(out[0, 5], 0.5)
    assert np.isclose(out[0, 4], 1.0)

    ml = np.asarray(
        proc.apply_min_length(
            jnp.ones((BB, V)), jnp.asarray([1]), jnp.asarray([4]), end_id=2
        )
    )
    assert ml[0, 2] < -1e30  # end masked while gen_len < min_length
    ml2 = np.asarray(
        proc.apply_min_length(
            jnp.ones((BB, V)), jnp.asarray([4]), jnp.asarray([4]), end_id=2
        )
    )
    assert ml2[0, 2] == 1.0


def test_engine_bad_words_and_min_length_end_to_end():
    cfg = GptNeoXConfig.tiny(vocab_size=64)
    params = init_params(cfg, dtype="fp32")
    eng = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))
    base = eng.generate([[3, 4, 5]], output_len=4, top_k=1)
    first = int(base.output_ids[0, 0, 3])
    # ban the greedy first token -> generation must pick something else
    bad = np.array([[[first], [1]]], np.int32)
    out = eng.generate([[3, 4, 5]], output_len=4, top_k=1, bad_words_list=bad)
    assert int(out.output_ids[0, 0, 3]) != first
    # min_length prevents early end_id stop
    out2 = eng.generate([[3, 4, 5]], output_len=6, top_k=1, min_length=6)
    assert out2.sequence_lengths[0, 0] == 9  # all 6 generated


def test_heterogeneous_temperature_and_presence():
    cfg = GptNeoXConfig.tiny(vocab_size=64)
    params = init_params(cfg, dtype="fp32")
    eng = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))
    out = eng.generate(
        [[3, 4, 5], [6, 7, 8]],
        output_len=4,
        top_k=[1, 20],
        top_p=[0.0, 0.8],
        temperature=[1.0, 0.5],
        presence_penalty=[0.0, 0.4],
        random_seed=[1, 2],
    )
    assert (out.sequence_lengths >= 3).all()
