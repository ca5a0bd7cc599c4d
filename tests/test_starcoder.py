"""StarCoder/GPTBigCode family parity vs HuggingFace — multi-query attention
(one shared KV head) + learned absolute positions through the registry seam;
nn.Linear layout (transposed on conversion, unlike GPT-2's Conv1D)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fastertransformer4codefuse_tpu import GptNeoXEngine, RuntimeConfig
from fastertransformer4codefuse_tpu.ckpt.convert_starcoder import (
    config_from_hf_starcoder,
    params_from_hf_starcoder_state_dict,
)
from fastertransformer4codefuse_tpu.models import gptneox as model


def make_hf_starcoder(seed=0, multi_query=True):
    torch.manual_seed(seed)
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=96,
        n_positions=64,
        n_embd=64,
        n_layer=2,
        n_head=4,
        multi_query=multi_query,
        bos_token_id=0,
        eos_token_id=95,
        attn_implementation="eager",
    )
    return transformers.GPTBigCodeForCausalLM(cfg).eval()


def test_starcoder_logits_parity():
    hf = make_hf_starcoder()
    cfg = config_from_hf_starcoder(hf.config)
    assert cfg.kv_heads == 1 and cfg.position_embedding == "learned"
    params = params_from_hf_starcoder_state_dict(cfg, hf.state_dict(), dtype="fp32")
    assert params["layers"]["qkv_w"].shape[-1] == (4 + 2) * 16  # q|k|v MQA

    import jax.numpy as jnp

    B, S = 2, 10
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, size=(B, S)).astype(np.int32)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    cache = model.init_kv_cache(cfg, B, S, jnp.float32)
    assert cache["k"].shape[2] == 1  # single shared KV head
    hidden, _ = model.prefill(
        cfg, params, jnp.asarray(ids), jnp.full((B,), S, jnp.int32), cache
    )
    ours = np.asarray(model.lm_logits(cfg, params, hidden))
    np.testing.assert_allclose(ours, hf_logits, atol=5e-4, rtol=3e-3)


def test_starcoder_greedy_parity():
    """Greedy decode token-exact vs HF over the MQA KV cache."""
    hf = make_hf_starcoder(seed=1)
    cfg = config_from_hf_starcoder(hf.config)
    params = params_from_hf_starcoder_state_dict(cfg, hf.state_dict(), dtype="fp32")
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


def test_starcoder_int8_kv_paged_pool():
    """MQA + learned positions through the PAGED batcher with int8 KV — the
    serving config a StarCoder deployment would actually run."""
    from fastertransformer4codefuse_tpu.engine.batcher import ContinuousBatcher

    hf = make_hf_starcoder(seed=3)
    cfg = config_from_hf_starcoder(hf.config)
    params = params_from_hf_starcoder_state_dict(cfg, hf.state_dict(), dtype="fp32")
    eng = GptNeoXEngine(
        cfg, params,
        RuntimeConfig(dtype="fp32", seq_bucket=4, max_seq_len=64,
                      kv_cache_dtype="int8"),
    )
    prompts = [[3, 4, 5, 6, 7], [20, 21, 22]]
    refs = []
    for p in prompts:
        o = eng.generate([p], output_len=4, top_k=1)
        n = int(o.sequence_lengths[0, 0])
        refs.append([int(x) for x in o.output_ids[0, 0, :n]])
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=4,
        paged=dict(num_pages=10, page_size=8),
    )
    uids = [cb.submit(p, 4, top_k=1) for p in prompts]
    done = cb.run(max_ticks=100)
    for uid, ref in zip(uids, refs):
        assert done[uid].output_ids == ref


def test_starcoder_config_ini_roundtrip(tmp_path):
    hf = make_hf_starcoder()
    cfg = config_from_hf_starcoder(hf.config)
    cfg.to_ini(str(tmp_path))
    from fastertransformer4codefuse_tpu import GptNeoXConfig

    back = GptNeoXConfig.from_ini(str(tmp_path))
    assert back == cfg
    assert back.kv_head_num == 1


def test_starcoder_registry():
    from fastertransformer4codefuse_tpu.models import registry

    assert "starcoder" in registry.families()
