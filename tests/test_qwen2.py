"""Qwen2 family parity vs HuggingFace — the LLaMA recipe plus biased q/k/v
Linears (qkv_bias=True while use_bias=False: o_proj and the MLP stay
bias-free). Exercises the registry seam with the fourth decoder-only family;
the reference repo's 20+ families all predate Qwen (SURVEY §2.5)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fastertransformer4codefuse_tpu import GptNeoXEngine, RuntimeConfig
from fastertransformer4codefuse_tpu.ckpt.convert_qwen2 import (
    config_from_hf_qwen2,
    params_from_hf_qwen2_state_dict,
)
from fastertransformer4codefuse_tpu.models import gptneox as model


def make_hf_qwen2(seed=0, kv_heads=2):
    torch.manual_seed(seed)
    cfg = transformers.Qwen2Config(
        vocab_size=96,
        hidden_size=64,
        intermediate_size=176,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=kv_heads,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=1000000.0,
        bos_token_id=0,
        eos_token_id=95,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    return transformers.Qwen2ForCausalLM(cfg).eval()


@pytest.mark.parametrize("kv_heads", [4, 2])  # MHA and grouped-query
def test_qwen2_logits_parity(kv_heads):
    hf = make_hf_qwen2(kv_heads=kv_heads)
    cfg = config_from_hf_qwen2(hf.config)
    assert cfg.norm == "rmsnorm" and cfg.gated_ffn
    assert not cfg.use_bias and cfg.qkv_bias  # the Qwen2 signature
    assert cfg.kv_heads == kv_heads and cfg.qkv_layout == "concat"
    params = params_from_hf_qwen2_state_dict(cfg, hf.state_dict(), dtype="fp32")
    assert "qkv_b" in params["layers"] and "up_b" not in params["layers"]

    import jax.numpy as jnp

    B, S = 2, 10
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, size=(B, S)).astype(np.int32)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    cache = model.init_kv_cache(cfg, B, S, jnp.float32)
    hidden, _ = model.prefill(
        cfg, params, jnp.asarray(ids), jnp.full((B,), S, jnp.int32), cache
    )
    ours = np.asarray(model.lm_logits(cfg, params, hidden))
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-3)


def test_qwen2_greedy_parity():
    """Greedy decode (prefill + incremental GQA KV-cache steps) token-exact
    vs HF's own forward — covers the biased-QKV path through the engine."""
    hf = make_hf_qwen2(seed=1, kv_heads=2)
    cfg = config_from_hf_qwen2(hf.config)
    params = params_from_hf_qwen2_state_dict(cfg, hf.state_dict(), dtype="fp32")
    eng = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=4))

    S, OUT = 8, 6
    rng = np.random.RandomState(2)
    ids = rng.randint(0, cfg.vocab_size - 1, size=(1, S)).astype(np.int32)
    hf_ids = torch.tensor(ids, dtype=torch.long)
    with torch.no_grad():
        for _ in range(OUT):
            nxt = hf(hf_ids).logits[:, -1].argmax(-1, keepdim=True)
            hf_ids = torch.cat([hf_ids, nxt], dim=1)

    out = eng.generate([list(ids[0])], output_len=OUT, top_k=1)
    for a, b in zip(out.output_ids[0, 0, S : S + OUT], hf_ids.numpy()[0, S:]):
        assert a == b
        if a == cfg.end_id:
            break


def test_qwen2_int8_runs():
    """Weight-only quantization with the qkv bias applied in the kernel
    epilogue (bias tensors stay fp — only the weight slots quantize)."""
    from fastertransformer4codefuse_tpu.ckpt.quantize import quantize_params
    from fastertransformer4codefuse_tpu.models.params import QuantizedTensor

    hf = make_hf_qwen2(seed=3, kv_heads=2)
    cfg = config_from_hf_qwen2(hf.config)
    params = params_from_hf_qwen2_state_dict(cfg, hf.state_dict(), dtype="fp32")
    qp = quantize_params(params)
    assert isinstance(qp["layers"]["qkv_w"], QuantizedTensor)
    assert not isinstance(qp["layers"]["qkv_b"], QuantizedTensor)
    eng = GptNeoXEngine(
        cfg, qp, RuntimeConfig(dtype="fp32", int8_mode=1, seq_bucket=4)
    )
    out = eng.generate([[3, 4, 5]], output_len=4, top_k=1)
    assert out.output_ids.shape[-1] >= 7


def test_qwen2_config_ini_roundtrip(tmp_path):
    hf = make_hf_qwen2(kv_heads=2)
    cfg = config_from_hf_qwen2(hf.config)
    cfg.to_ini(str(tmp_path))
    from fastertransformer4codefuse_tpu import GptNeoXConfig

    back = GptNeoXConfig.from_ini(str(tmp_path))
    assert back == cfg
    assert back.qkv_bias and not back.use_bias


def test_qwen2_registry():
    from fastertransformer4codefuse_tpu.models import registry

    assert "qwen2" in registry.families()
    fam = registry.get("qwen2")
    hf = make_hf_qwen2()
    cfg = fam.config_from_hf(hf.config)
    assert cfg.qkv_bias and cfg.norm == "rmsnorm"
