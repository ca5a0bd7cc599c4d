"""LLaMA family parity vs HuggingFace — exercises norm="rmsnorm", SwiGLU
gated FFN, bias-free projections, concat QKV layout, and grouped-query
attention through the registry seam. The reference repo has no LLaMA family
(SURVEY §2.5 stops at FT-v5-era models); this is the framework's
beyond-reference extension point in action."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fastertransformer4codefuse_tpu import GptNeoXEngine, RuntimeConfig
from fastertransformer4codefuse_tpu.ckpt.convert_llama import (
    config_from_hf_llama,
    params_from_hf_llama_state_dict,
)
from fastertransformer4codefuse_tpu.models import gptneox as model


def make_hf_llama(seed=0, kv_heads=4):
    torch.manual_seed(seed)
    cfg = transformers.LlamaConfig(
        vocab_size=96,
        hidden_size=64,
        intermediate_size=176,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=kv_heads,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        bos_token_id=0,
        eos_token_id=95,
        attn_implementation="eager",
    )
    return transformers.LlamaForCausalLM(cfg).eval()


@pytest.mark.parametrize("kv_heads", [4, 2])  # MHA and grouped-query
def test_llama_logits_parity(kv_heads):
    hf = make_hf_llama(kv_heads=kv_heads)
    cfg = config_from_hf_llama(hf.config)
    assert cfg.norm == "rmsnorm" and cfg.gated_ffn and not cfg.use_bias
    assert cfg.kv_heads == kv_heads and cfg.qkv_layout == "concat"
    params = params_from_hf_llama_state_dict(cfg, hf.state_dict(), dtype="fp32")

    import jax.numpy as jnp

    B, S = 2, 10
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, size=(B, S)).astype(np.int32)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    cache = model.init_kv_cache(cfg, B, S, jnp.float32)
    assert cache["k"].shape[2] == kv_heads
    hidden, _ = model.prefill(
        cfg, params, jnp.asarray(ids), jnp.full((B,), S, jnp.int32), cache
    )
    ours = np.asarray(model.lm_logits(cfg, params, hidden))
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-3)


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_llama_greedy_parity(kv_heads):
    """Greedy decode (prefill + incremental steps over the GQA KV cache)
    token-exact vs HF's own forward."""
    hf = make_hf_llama(seed=1, kv_heads=kv_heads)
    cfg = config_from_hf_llama(hf.config)
    params = params_from_hf_llama_state_dict(cfg, hf.state_dict(), dtype="fp32")
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


def test_llama_int8_runs():
    """Weight-only quantization covers the gated-FFN slots (gate_w included)."""
    from fastertransformer4codefuse_tpu.ckpt.quantize import quantize_params

    hf = make_hf_llama(seed=3, kv_heads=2)
    cfg = config_from_hf_llama(hf.config)
    params = params_from_hf_llama_state_dict(cfg, hf.state_dict(), dtype="fp32")
    qp = quantize_params(params)
    from fastertransformer4codefuse_tpu.models.params import QuantizedTensor

    assert isinstance(qp["layers"]["gate_w"], QuantizedTensor)
    eng = GptNeoXEngine(
        cfg, qp, RuntimeConfig(dtype="fp32", int8_mode=1, seq_bucket=4)
    )
    out = eng.generate([[3, 4, 5]], output_len=4, top_k=1)
    assert out.output_ids.shape[-1] >= 7


def test_llama_config_ini_roundtrip(tmp_path):
    hf = make_hf_llama(kv_heads=2)
    cfg = config_from_hf_llama(hf.config)
    cfg.to_ini(str(tmp_path))
    from fastertransformer4codefuse_tpu import GptNeoXConfig

    back = GptNeoXConfig.from_ini(str(tmp_path))
    assert back == cfg


def test_llama_registry():
    from fastertransformer4codefuse_tpu.models import registry

    assert "llama" in registry.families()
    fam = registry.get("llama")
    hf = make_hf_llama()
    cfg = fam.config_from_hf(hf.config)
    assert cfg.norm == "rmsnorm"
