"""Mixtral (sparse MoE) family parity vs HuggingFace, plus expert-parallel
sharding correctness: top-2 routed experts through ops/moe.py's sort-based
capacity dispatch, E axis sharded over the mesh (EP)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.ckpt.convert_mixtral import (
    config_from_hf_mixtral,
    params_from_hf_mixtral_state_dict,
)
from fastertransformer4codefuse_tpu.models import gptneox as model


def make_hf_mixtral(seed=0):
    torch.manual_seed(seed)
    cfg = transformers.MixtralConfig(
        vocab_size=96,
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        bos_token_id=0,
        eos_token_id=95,
        attn_implementation="eager",
    )
    return transformers.MixtralForCausalLM(cfg).eval()


def test_mixtral_logits_parity():
    hf = make_hf_mixtral()
    cfg = config_from_hf_mixtral(hf.config)
    assert cfg.moe_experts == 4 and cfg.moe_top_k == 2
    params = params_from_hf_mixtral_state_dict(cfg, hf.state_dict(), dtype="fp32")
    assert params["layers"]["eup_w"].shape == (2, 4, 64, 112)

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
    np.testing.assert_allclose(ours, hf_logits, atol=1e-3, rtol=3e-3)


def test_mixtral_greedy_parity():
    """Greedy decode token-exact vs HF — the decode path's tiny-T dispatch
    (capacity buckets of 1-2 slots) must route identically."""
    hf = make_hf_mixtral(seed=1)
    cfg = config_from_hf_mixtral(hf.config)
    params = params_from_hf_mixtral_state_dict(cfg, hf.state_dict(), dtype="fp32")
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


def test_mixtral_expert_parallel_matches_single_device():
    """EP over the tp axis (2 experts per device at tp=2): token-exact vs
    the unsharded engine — the GSPMD dispatch/combine collectives preserve
    the math."""
    from fastertransformer4codefuse_tpu.parallel.sharding import build_mesh

    cfg = GptNeoXConfig.tiny(
        head_num=8, size_per_head=8, vocab_size=128, inter_size=64,
        norm="rmsnorm", gated_ffn=True, use_bias=False,
        qkv_layout="concat", kv_head_num=4, use_gptj_residual=False,
        activation="silu", moe_experts=4, moe_top_k=2,
    )
    params = init_params(cfg, dtype="fp32")
    assert "router_w" in params["layers"]

    def run(mesh=None, tp=1):
        eng = GptNeoXEngine(
            cfg, params,
            RuntimeConfig(dtype="fp32", seq_bucket=4, tensor_para_size=tp),
            mesh=mesh,
        )
        return eng.generate(
            [[3, 4, 5, 17], [9, 8, 7, 6, 5, 4]], output_len=6,
            top_k=[1, 3], top_p=[0.0, 0.9], random_seed=[5, 6],
        )

    ref = run()
    out = run(mesh=build_mesh(tp=2), tp=2)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)


def test_mixtral_capacity_drop_renormalizes():
    """With capacity_factor << 1 the dispatcher must drop gracefully
    (renormalized survivors, finite outputs)."""
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.ops.moe import moe_ffn

    rng = np.random.RandomState(3)
    T, H, I, E = 16, 8, 12, 4
    x = jnp.asarray(rng.randn(T, H), jnp.float32)
    router = jnp.asarray(rng.randn(H, E), jnp.float32)
    gate = jnp.asarray(rng.randn(E, H, I) * 0.1, jnp.float32)
    up = jnp.asarray(rng.randn(E, H, I) * 0.1, jnp.float32)
    down = jnp.asarray(rng.randn(E, I, H) * 0.1, jnp.float32)
    full = moe_ffn(x, router, gate, up, down, 2, 8.0)  # no drops
    tight = moe_ffn(x, router, gate, up, down, 2, 0.25)  # heavy drops
    assert np.isfinite(np.asarray(tight)).all()
    assert not np.allclose(np.asarray(full), np.asarray(tight))


def test_mixtral_config_ini_roundtrip(tmp_path):
    hf = make_hf_mixtral()
    cfg = config_from_hf_mixtral(hf.config)
    cfg.to_ini(str(tmp_path))
    from fastertransformer4codefuse_tpu import GptNeoXConfig

    back = GptNeoXConfig.from_ini(str(tmp_path))
    assert back == cfg
    assert back.moe_experts == 4 and back.moe_top_k == 2


def test_mixtral_registry():
    from fastertransformer4codefuse_tpu.models import registry

    assert "mixtral" in registry.families()


def test_moe_padding_does_not_steal_capacity():
    """Review-fix regression: with a tight capacity factor, padding tokens
    (valid=False) must not consume expert slots that belong to real tokens —
    real tokens' outputs must be unchanged by how much padding rides along."""
    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.ops.moe import moe_ffn

    rng = np.random.RandomState(5)
    T_real, T_pad, H, I, E = 8, 24, 8, 12, 4
    xr = rng.randn(T_real, H).astype(np.float32)
    router = jnp.asarray(rng.randn(H, E), jnp.float32)
    gate = jnp.asarray(rng.randn(E, H, I) * 0.1, jnp.float32)
    up = jnp.asarray(rng.randn(E, H, I) * 0.1, jnp.float32)
    down = jnp.asarray(rng.randn(E, I, H) * 0.1, jnp.float32)

    # baseline: real tokens alone with ample capacity (no drops possible)
    base = moe_ffn(jnp.asarray(xr), router, gate, up, down, 2, 8.0)

    # same real tokens + a flood of identical padding rows AHEAD of them in
    # flat order. Combined capacity C = ceil(32*2/4 * 0.5) = 8 slots/expert:
    # enough for every real assignment (max 16 across 4 experts), but the 24
    # identical padding rows would fill their two chosen experts' 8 slots
    # first — without the valid mask the real tokens behind them get dropped
    pad = np.tile(xr[:1], (T_pad, 1))
    x_all = jnp.asarray(np.concatenate([pad, xr]), jnp.float32)
    valid = jnp.asarray([False] * T_pad + [True] * T_real)
    out = moe_ffn(x_all, router, gate, up, down, 2, 0.5, valid=valid)
    np.testing.assert_allclose(
        np.asarray(out[T_pad:]), np.asarray(base), atol=1e-5, rtol=1e-5
    )
    # padding rows produce zeros (null expert)
    assert np.abs(np.asarray(out[:T_pad])).max() == 0.0
