"""BERT encoder family parity vs HuggingFace — post-LN residuals,
bidirectional padding-masked attention, segment embeddings, pooler. The
reference serves BERT through its own C++ engine (models/bert/Bert.cc);
this is the encoder-side analog next to the seven decoder families."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from fastertransformer4codefuse_tpu.models.bert import (
    config_from_hf_bert,
    encode,
    params_from_hf_bert_state_dict,
)


def make_hf_bert(seed=0):
    torch.manual_seed(seed)
    cfg = transformers.BertConfig(
        vocab_size=96,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        type_vocab_size=2,
        attn_implementation="eager",
    )
    return transformers.BertModel(cfg).eval()


def test_bert_hidden_and_pooler_parity():
    hf = make_hf_bert()
    cfg = config_from_hf_bert(hf.config)
    params = params_from_hf_bert_state_dict(cfg, hf.state_dict())
    assert "pooler_w" in params

    B, S = 2, 10
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, size=(B, S)).astype(np.int32)
    tt = (rng.rand(B, S) > 0.5).astype(np.int32)
    with torch.no_grad():
        out = hf(
            torch.tensor(ids, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
        )
    hidden, pooled = encode(
        cfg, params, jnp.asarray(ids), jnp.full((B,), S, jnp.int32),
        jnp.asarray(tt),
    )
    np.testing.assert_allclose(
        np.asarray(hidden), out.last_hidden_state.numpy(), atol=5e-4, rtol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=5e-4, rtol=3e-3
    )


def test_bert_padding_mask_parity():
    """Ragged batch: padded keys must be excluded exactly like HF's
    attention_mask (outputs compared only on real tokens)."""
    hf = make_hf_bert(seed=1)
    cfg = config_from_hf_bert(hf.config)
    params = params_from_hf_bert_state_dict(cfg, hf.state_dict())

    B, S = 2, 12
    lens = np.asarray([12, 7], np.int32)
    rng = np.random.RandomState(2)
    ids = rng.randint(0, cfg.vocab_size, size=(B, S)).astype(np.int32)
    am = (np.arange(S)[None, :] < lens[:, None]).astype(np.int64)
    with torch.no_grad():
        out = hf(
            torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(am),
        )
    hidden, _ = encode(cfg, params, jnp.asarray(ids), jnp.asarray(lens))
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(hidden)[b, : lens[b]],
            out.last_hidden_state.numpy()[b, : lens[b]],
            atol=5e-4, rtol=3e-3,
        )


def test_bert_registry():
    from fastertransformer4codefuse_tpu.models import registry

    assert "bert" in registry.families()
    fam = registry.get("bert")
    hf = make_hf_bert()
    cfg = fam.config_from_hf(hf.config)
    assert cfg.layer_num == 2
