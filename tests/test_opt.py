"""OPT family parity vs HuggingFace — the multi_gpu_gpt lineage's second
checkpoint format: learned positions with the +2 offset absorbed at
conversion, serial pre-LN residuals, biased separate q/k/v, ReLU FFN."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fastertransformer4codefuse_tpu import GptNeoXEngine, RuntimeConfig
from fastertransformer4codefuse_tpu.ckpt.convert_opt import (
    config_from_hf_opt,
    params_from_hf_opt_state_dict,
)
from fastertransformer4codefuse_tpu.models import gptneox as model


def make_hf_opt(seed=0):
    torch.manual_seed(seed)
    cfg = transformers.OPTConfig(
        vocab_size=96,
        hidden_size=64,
        num_hidden_layers=2,
        ffn_dim=128,
        num_attention_heads=4,
        max_position_embeddings=64,
        do_layer_norm_before=True,
        word_embed_proj_dim=64,
        bos_token_id=0,
        eos_token_id=95,
        pad_token_id=1,
        attn_implementation="eager",
    )
    return transformers.OPTForCausalLM(cfg).eval()


def test_opt_logits_parity():
    hf = make_hf_opt()
    cfg = config_from_hf_opt(hf.config)
    assert cfg.position_embedding == "learned" and cfg.activation == "relu"
    params = params_from_hf_opt_state_dict(cfg, hf.state_dict(), dtype="fp32")
    assert params["pos_embed"].shape == (64, 64)  # offset rows dropped

    import jax.numpy as jnp

    B, S = 2, 10
    rng = np.random.RandomState(0)
    ids = rng.randint(2, cfg.vocab_size, size=(B, S)).astype(np.int32)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    cache = model.init_kv_cache(cfg, B, S, jnp.float32)
    hidden, _ = model.prefill(
        cfg, params, jnp.asarray(ids), jnp.full((B,), S, jnp.int32), cache
    )
    ours = np.asarray(model.lm_logits(cfg, params, hidden))
    np.testing.assert_allclose(ours, hf_logits, atol=5e-4, rtol=3e-3)


def test_opt_greedy_parity():
    hf = make_hf_opt(seed=1)
    cfg = config_from_hf_opt(hf.config)
    params = params_from_hf_opt_state_dict(cfg, hf.state_dict(), dtype="fp32")
    eng = GptNeoXEngine(
        cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=4, max_seq_len=64)
    )

    S, OUT = 8, 6
    rng = np.random.RandomState(2)
    ids = rng.randint(2, cfg.vocab_size - 1, size=(1, S)).astype(np.int32)
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


def test_opt_registry_and_ini(tmp_path):
    from fastertransformer4codefuse_tpu.models import registry

    assert "opt" in registry.families()
    hf = make_hf_opt()
    cfg = config_from_hf_opt(hf.config)
    cfg.to_ini(str(tmp_path))
    from fastertransformer4codefuse_tpu import GptNeoXConfig

    assert GptNeoXConfig.from_ini(str(tmp_path)) == cfg
