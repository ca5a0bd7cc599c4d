"""T5 encoder-decoder family parity vs HuggingFace — relative-position
buckets (bidirectional + causal), unscaled attention, cross-attention
decode with an incremental cache, tied-head rescale."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from fastertransformer4codefuse_tpu.models.t5 import (
    config_from_hf_t5,
    decode_step,
    encode,
    greedy_generate,
    init_decoder_state,
    params_from_hf_t5_state_dict,
)


def make_hf_t5(seed=0):
    torch.manual_seed(seed)
    cfg = transformers.T5Config(
        vocab_size=96,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
        decoder_start_token_id=0,
        eos_token_id=1,
        pad_token_id=0,
    )
    return transformers.T5ForConditionalGeneration(cfg).eval()


def test_t5_encoder_parity():
    hf = make_hf_t5()
    cfg = config_from_hf_t5(hf.config)
    params = params_from_hf_t5_state_dict(cfg, hf.state_dict())

    B, S = 2, 9
    rng = np.random.RandomState(0)
    ids = rng.randint(2, cfg.vocab_size, size=(B, S)).astype(np.int32)
    lens = np.asarray([9, 6], np.int32)
    am = (np.arange(S)[None, :] < lens[:, None]).astype(np.int64)
    with torch.no_grad():
        out = hf.encoder(
            torch.tensor(ids, dtype=torch.long), attention_mask=torch.tensor(am)
        ).last_hidden_state.numpy()
    got = np.asarray(encode(cfg, params, jnp.asarray(ids), jnp.asarray(lens)))
    for b in range(B):
        np.testing.assert_allclose(
            got[b, : lens[b]], out[b, : lens[b]], atol=5e-4, rtol=3e-3
        )


def test_t5_decoder_logits_parity():
    """Teacher-forced decoder logits at several steps vs HF's full forward
    (exercises the causal rel-pos bias + the incremental self-attn cache)."""
    hf = make_hf_t5(seed=1)
    cfg = config_from_hf_t5(hf.config)
    params = params_from_hf_t5_state_dict(cfg, hf.state_dict())

    B, S, T = 1, 7, 5
    rng = np.random.RandomState(1)
    ids = rng.randint(2, cfg.vocab_size, size=(B, S)).astype(np.int32)
    dec_in = np.concatenate(
        [[0], rng.randint(2, cfg.vocab_size, size=(T - 1,))]
    ).astype(np.int32)[None]
    lens = np.full((B,), S, np.int32)
    with torch.no_grad():
        hf_logits = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            decoder_input_ids=torch.tensor(dec_in, dtype=torch.long),
        ).logits.numpy()  # [B, T, V]

    enc = encode(cfg, params, jnp.asarray(ids), jnp.asarray(lens))
    state = init_decoder_state(cfg, params, enc, jnp.asarray(lens), T + 1)
    for t in range(T):
        logits, state = decode_step(
            cfg, params, state, jnp.asarray(dec_in[:, t]), jnp.int32(t)
        )
        np.testing.assert_allclose(
            np.asarray(logits), hf_logits[:, t], atol=1e-3, rtol=3e-3
        )


def test_t5_greedy_generate_parity():
    hf = make_hf_t5(seed=2)
    cfg = config_from_hf_t5(hf.config)
    params = params_from_hf_t5_state_dict(cfg, hf.state_dict())

    B, S, OUT = 2, 8, 8
    rng = np.random.RandomState(3)
    ids = rng.randint(2, cfg.vocab_size, size=(B, S)).astype(np.int32)
    lens = np.full((B,), S, np.int32)
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor(ids, dtype=torch.long), max_new_tokens=OUT,
            do_sample=False, num_beams=1,
        ).numpy()  # [B, 1 + OUT] incl. decoder_start
    got = greedy_generate(cfg, params, jnp.asarray(ids), jnp.asarray(lens), OUT)
    for b in range(B):
        want = hf_out[b, 1:]  # drop decoder_start
        for i in range(min(len(want), got.shape[1])):
            assert got[b, i] == want[i], (b, i, got[b], want)
            if want[i] == cfg.end_id:
                break


def test_t5_registry():
    from fastertransformer4codefuse_tpu.models import registry

    assert "t5" in registry.families()
