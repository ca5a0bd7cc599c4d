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


def test_bert_int8_matches_dequantized_fp():
    """int8 BERT (the reference's bert_int8 engine analog): outputs exactly
    equal an fp engine on the dequantized weights."""
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.models.bert import (
        quantize_bert_params,
    )
    from fastertransformer4codefuse_tpu.models.params import QuantizedTensor

    hf = make_hf_bert(seed=3)
    cfg = config_from_hf_bert(hf.config)
    params = params_from_hf_bert_state_dict(cfg, hf.state_dict())
    qp = quantize_bert_params(params)
    fp_like = dict(qp)
    fp_like["layers"] = {
        k: (v.q.astype(jnp.float32) * jnp.expand_dims(v.scale, v.k_axis)
            if isinstance(v, QuantizedTensor) else v)
        for k, v in qp["layers"].items()
    }
    rng = np.random.RandomState(5)
    ids = rng.randint(0, cfg.vocab_size, size=(2, 10)).astype(np.int32)
    lens = jnp.asarray([10, 7], jnp.int32)
    a_h, a_p = encode(cfg, qp, jnp.asarray(ids), lens)
    b_h, b_p = encode(cfg, fp_like, jnp.asarray(ids), lens)
    # (x @ q) * scale vs x @ (q * scale): same math, different float
    # association — bound the drift tightly instead of bit-equality
    np.testing.assert_allclose(
        np.asarray(a_h), np.asarray(b_h), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(a_p), np.asarray(b_p), rtol=2e-5, atol=2e-6
    )


def test_bert_tp4_matches_unsharded():
    """TP4 CPU-mesh parity through the BertEngine seam; the fused-QKV and
    ffn weights actually shard."""
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.models import registry
    from fastertransformer4codefuse_tpu.models.bert import (
        quantize_bert_params,
    )
    from fastertransformer4codefuse_tpu.parallel.sharding import build_mesh

    hf = make_hf_bert(seed=4)
    cfg = config_from_hf_bert(hf.config)
    params = params_from_hf_bert_state_dict(cfg, hf.state_dict())
    rng = np.random.RandomState(6)
    ids = rng.randint(0, cfg.vocab_size, size=(2, 9)).astype(np.int32)
    lens = np.asarray([9, 6], np.int32)
    ref_h, ref_p = encode(cfg, params, jnp.asarray(ids), jnp.asarray(lens))

    fam = registry.get("bert")
    eng = fam.make_engine(cfg, params, mesh=build_mesh(tp=4))
    assert eng.params["layers"]["qkv_w"].sharding.spec[2] == "tp"
    got_h, got_p = eng.encode(ids, lens)
    np.testing.assert_allclose(
        np.asarray(got_h), np.asarray(ref_h), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_p), np.asarray(ref_p), rtol=2e-5, atol=2e-6
    )

    # int8 under TP: scales shard with their weights; parity vs unsharded int8
    qp = quantize_bert_params(params)
    ref_qh, _ = encode(cfg, qp, jnp.asarray(ids), jnp.asarray(lens))
    eng_q = fam.make_engine(cfg, qp, mesh=build_mesh(tp=2))
    assert eng_q.params["layers"]["qkv_w"].q.sharding.spec[2] == "tp"
    got_qh, _ = eng_q.encode(ids, lens)
    np.testing.assert_allclose(
        np.asarray(got_qh), np.asarray(ref_qh), rtol=2e-5, atol=2e-6
    )
