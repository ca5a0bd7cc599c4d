"""BART family parity vs HuggingFace — learned +2-offset positions, post-LN
blocks, scaled attention, cross-attention incremental decode. Reference:
/root/reference/src/fastertransformer/models/bart/."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from fastertransformer4codefuse_tpu.models.bart import (
    config_from_hf_bart,
    decode_step,
    encode,
    greedy_generate,
    init_decoder_state,
    params_from_hf_bart_state_dict,
)


def make_hf(seed=0):
    torch.manual_seed(seed)
    cfg = transformers.BartConfig(
        vocab_size=96, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
    )
    return transformers.BartForConditionalGeneration(cfg).eval()


def test_bart_encoder_parity():
    hf = make_hf(seed=0)
    cfg = config_from_hf_bart(hf.config)
    params = params_from_hf_bart_state_dict(cfg, hf.state_dict())
    rng = np.random.RandomState(1)
    ids = rng.randint(3, 96, size=(2, 9)).astype(np.int64)
    lens = np.array([9, 6], np.int32)
    am = (np.arange(9)[None, :] < lens[:, None]).astype(np.int64)
    with torch.no_grad():
        want = hf.model.encoder(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(am)
        ).last_hidden_state.numpy()
    got = np.asarray(encode(cfg, params, jnp.asarray(ids), jnp.asarray(lens)))
    for b, n in enumerate(lens):
        np.testing.assert_allclose(got[b, :n], want[b, :n], rtol=2e-4, atol=2e-5)


def test_bart_decoder_logits_parity():
    """Teacher-forced per-step logits through the incremental cache."""
    hf = make_hf(seed=2)
    cfg = config_from_hf_bart(hf.config)
    params = params_from_hf_bart_state_dict(cfg, hf.state_dict())
    rng = np.random.RandomState(3)
    ids = rng.randint(3, 96, size=(1, 7)).astype(np.int64)
    lens = np.array([7], np.int32)
    dec_in = [cfg.start_id, 5, 9, 11]
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids),
            decoder_input_ids=torch.tensor([dec_in]),
        ).logits.numpy()[0]
    enc = encode(cfg, params, jnp.asarray(ids), jnp.asarray(lens))
    state = init_decoder_state(cfg, params, enc, jnp.asarray(lens), len(dec_in) + 1)
    for t, tok in enumerate(dec_in):
        logits, state = decode_step(
            cfg, params, state, jnp.asarray([tok], jnp.int32), jnp.int32(t)
        )
        np.testing.assert_allclose(
            np.asarray(logits)[0], want[t], rtol=2e-4, atol=2e-4
        )


def test_bart_greedy_generate_parity():
    hf = make_hf(seed=4)
    cfg = config_from_hf_bart(hf.config)
    params = params_from_hf_bart_state_dict(cfg, hf.state_dict())
    rng = np.random.RandomState(5)
    ids = rng.randint(3, 96, size=(2, 8)).astype(np.int64)
    lens = np.full((2,), 8, np.int32)
    OUT = 8
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(ids), max_new_tokens=OUT, do_sample=False,
            num_beams=1,
        ).numpy()  # [B, 1 + OUT] incl. decoder_start
    got = greedy_generate(cfg, params, jnp.asarray(ids), jnp.asarray(lens), OUT)
    for b in range(2):
        ref = want[b, 1:]
        for i in range(min(len(ref), got.shape[1])):
            assert got[b, i] == ref[i], (b, i, got[b], ref)
            if ref[i] == cfg.end_id:
                break


def test_bart_registry():
    from fastertransformer4codefuse_tpu.models import registry

    fam = registry.get("bart")
    hf = make_hf(seed=0)
    cfg = fam.config_from_hf(hf.config)
    params = fam.params_from_hf(cfg, hf.state_dict())
    rng = np.random.RandomState(0)
    ids = rng.randint(3, 96, size=(1, 6)).astype(np.int32)
    h = fam.encode(cfg, params, jnp.asarray(ids), jnp.asarray([6]))
    assert h.shape == (1, 6, 32)


def make_hf_marian(seed=0):
    torch.manual_seed(seed)
    cfg = transformers.MarianConfig(
        vocab_size=96, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        decoder_start_token_id=1, pad_token_id=1, eos_token_id=0,
    )
    return transformers.MarianMTModel(cfg).eval()


def test_marian_greedy_generate_parity():
    """Marian — the classic decoder/decoding engine analog: sinusoidal
    positions (loaded from the checkpoint), no embedding LN, offset 0."""
    from fastertransformer4codefuse_tpu.models.bart import (
        config_from_hf_marian,
        params_from_hf_marian_state_dict,
    )

    hf = make_hf_marian(seed=6)
    cfg = config_from_hf_marian(hf.config)
    params = params_from_hf_marian_state_dict(cfg, hf.state_dict())
    assert "enc_eln_w" not in params  # marian: no embedding LayerNorm
    rng = np.random.RandomState(7)
    ids = rng.randint(2, 96, size=(2, 7)).astype(np.int64)
    lens = np.full((2,), 7, np.int32)
    OUT = 7
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(ids), max_new_tokens=OUT, do_sample=False,
            num_beams=1,
        ).numpy()
    got = greedy_generate(cfg, params, jnp.asarray(ids), jnp.asarray(lens), OUT)
    for b in range(2):
        ref = want[b, 1:]
        for i in range(min(len(ref), got.shape[1])):
            assert got[b, i] == ref[i], (b, i, got[b], ref)
            if ref[i] == cfg.end_id:
                break


def test_marian_registry():
    from fastertransformer4codefuse_tpu.models import registry

    fam = registry.get("marian")
    hf = make_hf_marian(seed=0)
    cfg = fam.config_from_hf(hf.config)
    params = fam.params_from_hf(cfg, hf.state_dict())
    rng = np.random.RandomState(0)
    ids = rng.randint(2, 96, size=(1, 6)).astype(np.int32)
    h = fam.encode(cfg, params, jnp.asarray(ids), jnp.asarray([6]))
    assert h.shape == (1, 6, 32)
