"""GPT-J family parity vs HuggingFace (the reference's second decoder-only
family, models/gptj/) — exercises rotary_style="gptj", shared layernorm,
bias-free QKV, and the LM-head bias through the registry seam."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fastertransformer4codefuse_tpu import GptNeoXEngine, RuntimeConfig
from fastertransformer4codefuse_tpu.ckpt.convert_gptj import (
    config_from_hf_gptj,
    params_from_hf_gptj_state_dict,
)
from fastertransformer4codefuse_tpu.models import gptneox as model


def make_hf_gptj(seed=0):
    torch.manual_seed(seed)
    cfg = transformers.GPTJConfig(
        vocab_size=96,
        n_positions=128,
        n_embd=64,
        n_layer=2,
        n_head=4,
        rotary_dim=8,
        activation_function="gelu_new",
        bos_token_id=0,
        eos_token_id=95,
    )
    return transformers.GPTJForCausalLM(cfg).eval()


def test_gptj_logits_parity():
    hf = make_hf_gptj()
    cfg = config_from_hf_gptj(hf.config)
    assert cfg.rotary_style == "gptj" and cfg.use_gptj_residual
    params = params_from_hf_gptj_state_dict(cfg, hf.state_dict(), dtype="fp32")

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


def test_gptj_greedy_parity():
    hf = make_hf_gptj(seed=1)
    cfg = config_from_hf_gptj(hf.config)
    params = params_from_hf_gptj_state_dict(cfg, hf.state_dict(), dtype="fp32")
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


def test_gptj_registry():
    from fastertransformer4codefuse_tpu.models import registry

    assert "gptj" in registry.families()
    fam = registry.get("gptj")
    hf = make_hf_gptj()
    cfg = fam.config_from_hf(hf.config)
    assert cfg.rotary_style == "gptj"
