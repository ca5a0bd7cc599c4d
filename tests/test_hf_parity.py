"""Numeric parity vs HuggingFace GPTNeoXForCausalLM (torch CPU).

The analog of the reference's model-level regression tests (SURVEY §4 —
FT output vs HF reference models) and its converter's QKV-layout contract
(huggingface_convert.py:64-74).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
)
from fastertransformer4codefuse_tpu.ckpt.convert import (
    config_from_hf,
    params_from_hf_state_dict,
)
from fastertransformer4codefuse_tpu.models import gptneox as model


def make_hf(parallel_residual=True, seed=0):
    torch.manual_seed(seed)
    hf_cfg = transformers.GPTNeoXConfig(
        vocab_size=96,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=256,
        rotary_pct=0.25,
        max_position_embeddings=128,
        use_parallel_residual=parallel_residual,
        bos_token_id=0,
        eos_token_id=95,
        hidden_act="gelu",
    )
    hf = transformers.GPTNeoXForCausalLM(hf_cfg).eval()
    return hf


@pytest.mark.parametrize("parallel_residual", [True, False])
def test_logits_parity(parallel_residual):
    hf = make_hf(parallel_residual)
    cfg = config_from_hf(hf.config)
    assert cfg.use_gptj_residual == parallel_residual
    params = params_from_hf_state_dict(cfg, hf.state_dict(), dtype="fp32")

    B, S = 2, 12
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, size=(B, S)).astype(np.int32)

    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    import jax.numpy as jnp

    cache = model.init_kv_cache(cfg, B, S, jnp.float32)
    hidden, _ = model.prefill(
        cfg, params, jnp.asarray(ids), jnp.full((B,), S, jnp.int32), cache
    )
    ours = np.asarray(model.lm_logits(cfg, params, hidden))

    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=2e-3)


def hf_greedy(hf, ids, steps):
    """Manual greedy loop with the HF model (avoids generate() config traps)."""
    ids = torch.tensor(ids, dtype=torch.long)
    with torch.no_grad():
        for _ in range(steps):
            logits = hf(ids).logits[:, -1]
            nxt = logits.argmax(-1, keepdim=True)
            ids = torch.cat([ids, nxt], dim=1)
    return ids.numpy()


def _compare_until_end(ours_row, hf_row, end_id):
    for a, b in zip(ours_row, hf_row):
        assert a == b, f"{ours_row} != {hf_row}"
        if a == end_id:
            break


@pytest.mark.parametrize("parallel_residual", [True, False])
def test_greedy_decode_parity(parallel_residual):
    hf = make_hf(parallel_residual)
    cfg = config_from_hf(hf.config)
    params = params_from_hf_state_dict(cfg, hf.state_dict(), dtype="fp32")
    eng = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=4))

    B, S, OUT = 2, 10, 8
    rng = np.random.RandomState(1)
    ids = rng.randint(0, cfg.vocab_size - 1, size=(B, S)).astype(np.int32)

    hf_ids = hf_greedy(hf, ids, OUT)
    out = eng.generate([list(r) for r in ids], output_len=OUT, top_k=1)

    for b in range(B):
        _compare_until_end(
            out.output_ids[b, 0, S : S + OUT], hf_ids[b, S:], cfg.end_id
        )


def test_greedy_decode_parity_ragged():
    """Ragged batch: packed-position engine rows must match per-sequence
    unbatched HF decoding exactly (contiguous RoPE positions per row)."""
    hf = make_hf(True)
    cfg = config_from_hf(hf.config)
    params = params_from_hf_state_dict(cfg, hf.state_dict(), dtype="fp32")
    eng = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=4))

    OUT = 6
    rng = np.random.RandomState(2)
    prompts = [
        list(rng.randint(0, cfg.vocab_size - 1, size=(n,)).astype(int))
        for n in (3, 9, 6)
    ]
    out = eng.generate(prompts, output_len=OUT, top_k=1)

    for b, p in enumerate(prompts):
        hf_ids = hf_greedy(hf, np.asarray([p], np.int32), OUT)
        _compare_until_end(
            out.output_ids[b, 0, len(p) : len(p) + OUT], hf_ids[0, len(p):], cfg.end_id
        )
        assert out.sequence_lengths[b, 0] <= len(p) + OUT
