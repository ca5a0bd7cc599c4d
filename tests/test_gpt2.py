"""GPT-2 family ("gpt" — the reference's multi_gpu_gpt analog) parity vs
HuggingFace: learned absolute position embeddings, serial residual, biased
LayerNorms/projections, fused c_attn concat QKV, tanh-gelu, tied LM head."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fastertransformer4codefuse_tpu import GptNeoXEngine, RuntimeConfig
from fastertransformer4codefuse_tpu.ckpt.convert_gpt2 import (
    config_from_hf_gpt2,
    params_from_hf_gpt2_state_dict,
)
from fastertransformer4codefuse_tpu.models import gptneox as model


def make_hf_gpt2(seed=0):
    torch.manual_seed(seed)
    cfg = transformers.GPT2Config(
        vocab_size=96,
        n_positions=64,
        n_embd=64,
        n_layer=2,
        n_head=4,
        bos_token_id=0,
        eos_token_id=95,
        attn_implementation="eager",
    )
    return transformers.GPT2LMHeadModel(cfg).eval()


def test_gpt2_logits_parity():
    hf = make_hf_gpt2()
    cfg = config_from_hf_gpt2(hf.config)
    assert cfg.position_embedding == "learned"
    assert cfg.rotary_embedding_dim == 0
    assert not cfg.use_gptj_residual and cfg.activation == "gelu-tanh"
    params = params_from_hf_gpt2_state_dict(cfg, hf.state_dict(), dtype="fp32")
    assert params["pos_embed"].shape == (64, 64)

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
    np.testing.assert_allclose(ours, hf_logits, atol=5e-4, rtol=3e-3)


def test_gpt2_greedy_parity():
    """Greedy decode token-exact vs HF — the decode path's per-row position
    gather from the learned table must line up with prefill's."""
    hf = make_hf_gpt2(seed=1)
    cfg = config_from_hf_gpt2(hf.config)
    params = params_from_hf_gpt2_state_dict(cfg, hf.state_dict(), dtype="fp32")
    eng = GptNeoXEngine(
        cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=4, max_seq_len=64)
    )

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


def test_gpt2_batcher_chunked_prefill():
    """The continuous batcher's chunked prefill must gather per-row positions
    from the learned table (posc, not arange) — outputs match one-shot."""
    from fastertransformer4codefuse_tpu.engine.batcher import ContinuousBatcher

    hf = make_hf_gpt2(seed=3)
    cfg = config_from_hf_gpt2(hf.config)
    params = params_from_hf_gpt2_state_dict(cfg, hf.state_dict(), dtype="fp32")
    eng = GptNeoXEngine(
        cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=4, max_seq_len=64)
    )
    prompts = [[3, 4, 5, 6, 7, 8, 9, 10, 11], [20, 21, 22]]
    refs = []
    for p in prompts:
        o = eng.generate([p], output_len=4, top_k=1)
        n = int(o.sequence_lengths[0, 0])
        refs.append([int(x) for x in o.output_ids[0, 0, :n]])
    cb = ContinuousBatcher(eng, max_slots=2, max_seq_len=32, prompt_bucket=4)
    uids = [cb.submit(p, 4, top_k=1) for p in prompts]
    done = cb.run(max_ticks=100)
    for uid, ref in zip(uids, refs):
        assert done[uid].output_ids == ref


def test_gpt2_config_ini_roundtrip(tmp_path):
    hf = make_hf_gpt2()
    cfg = config_from_hf_gpt2(hf.config)
    cfg.to_ini(str(tmp_path))
    from fastertransformer4codefuse_tpu import GptNeoXConfig

    back = GptNeoXConfig.from_ini(str(tmp_path))
    assert back == cfg
    assert back.position_embedding == "learned"


def test_gpt2_registry():
    from fastertransformer4codefuse_tpu.models import registry

    assert "gpt" in registry.families()
    fam = registry.get("gpt")
    hf = make_hf_gpt2()
    cfg = fam.config_from_hf(hf.config)
    assert cfg.position_embedding == "learned"
