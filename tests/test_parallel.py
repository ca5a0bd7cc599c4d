"""Tensor-parallel (GSPMD) correctness and collective-structure tests.

The reference's TP semantics (SURVEY §2.4): column-split QKV/up, row-split
proj/down, ONE all-reduce per layer under the parallel residual
(GptNeoXDecoder.cc:342-360), vocab-split LM head. Here the same math comes from
PartitionSpecs; these tests pin (a) numeric equality with the unsharded engine
and (b) the single-psum-per-layer property in the compiled HLO.
"""
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.ckpt.quantize import quantize_params
from fastertransformer4codefuse_tpu.models import gptneox as model
from fastertransformer4codefuse_tpu.parallel.sharding import build_mesh, shard_params


def tiny_cfg():
    # head_num=8 so tp in {2,4,8} divides heads; inter/vocab divisible too
    return GptNeoXConfig.tiny(head_num=8, size_per_head=8, vocab_size=128, inter_size=256)


PROMPTS = [[3, 4, 5, 17], [9, 8, 7, 6, 5, 4]]


def run_engine(cfg, params, mesh=None, tp=1, int8=0, ubatch=1):
    eng = GptNeoXEngine(
        cfg,
        params,
        RuntimeConfig(
            dtype="fp32", seq_bucket=4, tensor_para_size=tp, int8_mode=int8,
            pp_microbatches=ubatch,
        ),
        mesh=mesh,
    )
    return eng.generate(
        PROMPTS, output_len=6, top_k=[1, 3], top_p=[0.0, 0.9],
        temperature=[1.0, 0.8], repetition_penalty=1.05, random_seed=[5, 6],
        return_cum_log_probs=True,
    )


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_matches_single_device(tp):
    cfg = tiny_cfg()
    params = init_params(cfg, dtype="fp32")
    ref = run_engine(cfg, params)
    mesh = build_mesh(tp=tp)
    out = run_engine(cfg, params, mesh=mesh, tp=tp)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)
    np.testing.assert_array_equal(ref.sequence_lengths, out.sequence_lengths)
    np.testing.assert_allclose(ref.cum_log_probs, out.cum_log_probs, atol=1e-4)


def test_tp_int8_matches_single_device():
    cfg = tiny_cfg()
    params = quantize_params(init_params(cfg, dtype="fp32"))
    ref = run_engine(cfg, params, int8=1)
    mesh = build_mesh(tp=4)
    out = run_engine(cfg, params, mesh=mesh, tp=4, int8=1)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)


@pytest.mark.parametrize("group_size", [0, 16])
def test_tp_int4_matches_single_device(group_size):
    """int4 (nibble-packed) + per-channel AND group-wise scales under TP:
    regression for bits/group_size being dropped by shard_params."""
    cfg = tiny_cfg()
    params = quantize_params(
        init_params(cfg, dtype="fp32"), weight_bits=4, group_size=group_size
    )
    ref = run_engine(cfg, params, int8=1)
    mesh = build_mesh(tp=2)
    out = run_engine(cfg, params, mesh=mesh, tp=2, int8=1)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)


def test_tp_learned_positions_matches_single_device():
    """gpt/starcoder-style learned absolute positions under TP: pos_embed
    is replicated, everything else shards as usual."""
    cfg = GptNeoXConfig.tiny(
        head_num=8, size_per_head=8, vocab_size=128, inter_size=256,
        rotary_embedding_dim=0, position_embedding="learned",
        use_gptj_residual=False, qkv_layout="concat",
    )
    params = init_params(cfg, dtype="fp32")
    assert "pos_embed" in params
    ref = run_engine(cfg, params)
    out = run_engine(cfg, params, mesh=build_mesh(tp=2), tp=2)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)


def test_tp_qwen2_style_matches_single_device():
    """Qwen2 signature under TP: GQA concat QKV (replicated, per the
    uneven-segment rule) with qkv_bias but bias-free proj/MLP."""
    cfg = GptNeoXConfig.tiny(
        head_num=8, size_per_head=8, vocab_size=128, inter_size=256,
        kv_head_num=4, qkv_layout="concat", use_bias=False, qkv_bias=True,
        norm="rmsnorm", gated_ffn=True, use_gptj_residual=False,
        activation="silu",
    )
    params = init_params(cfg, dtype="fp32")
    assert "qkv_b" in params["layers"] and "up_b" not in params["layers"]
    ref = run_engine(cfg, params)
    out = run_engine(cfg, params, mesh=build_mesh(tp=2), tp=2)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)


def test_dp_axis_runs():
    cfg = tiny_cfg()
    params = init_params(cfg, dtype="fp32")
    mesh = build_mesh(tp=2, dp=2)
    out = run_engine(cfg, params, mesh=mesh, tp=2)
    ref = run_engine(cfg, params)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)


def test_one_allreduce_per_layer_decode():
    """The scan body must contain exactly ONE all-reduce (the fused
    attn+ffn partial-sum reduction of the parallel residual)."""
    cfg = tiny_cfg()
    mesh = build_mesh(tp=4)
    params = shard_params(cfg, init_params(cfg, dtype="fp32"), mesh)

    B, T = 2, 16
    cache = model.init_kv_cache(cfg, B, T, jnp.float32)

    def step(params, tokens, positions, cache):
        hidden, cache = model.decode_step(cfg, params, tokens, positions, cache)
        return model.lm_logits(cfg, params, hidden), cache

    tokens = jnp.zeros((B,), jnp.int32)
    positions = jnp.full((B,), 3, jnp.int32)
    compiled = jax.jit(step).lower(params, tokens, positions, cache).compile()
    hlo = compiled.as_text()

    # all-reduces inside the layer-scan while body: find the while body and
    # count all-reduce ops in it
    n_all_reduce = len(re.findall(r"all-reduce(?:-start)?\(", hlo)) + len(
        re.findall(r"all-reduce(?:-start)?\.\d+ = ", hlo)
    )
    # total all-reduce ops in the module: 1 in the scan body (+ possibly 1 for
    # the vocab-sharded logits path). Anything more means GSPMD split the
    # parallel residual into separate attention/ffn reductions.
    assert 0 < n_all_reduce <= 2, f"unexpected all-reduce count {n_all_reduce}\n"


def pp_cfg():
    # 4 layers so pp in {2, 4} divides the stack
    return GptNeoXConfig.tiny(
        head_num=8, size_per_head=8, vocab_size=128, inter_size=256, layer_num=4
    )


@pytest.mark.parametrize("tp,pp", [(1, 4), (2, 2)])
def test_pp_matches_single_device(tp, pp):
    """Pipeline stages (layers split over the "pp" axis, shard_map +
    ppermute edge handoff) must be numerically identical to the unsharded
    engine — incl. composed with TP (GSPMD-auto inside each stage)."""
    cfg = pp_cfg()
    params = init_params(cfg, dtype="fp32")
    ref = run_engine(cfg, params)
    mesh = build_mesh(tp=tp, pp=pp)
    out = run_engine(cfg, params, mesh=mesh, tp=tp)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)
    np.testing.assert_array_equal(ref.sequence_lengths, out.sequence_lengths)
    np.testing.assert_allclose(ref.cum_log_probs, out.cum_log_probs, atol=1e-4)


def test_pp_int8_matches_single_device():
    cfg = pp_cfg()
    params = quantize_params(init_params(cfg, dtype="fp32"))
    ref = run_engine(cfg, params, int8=1)
    mesh = build_mesh(tp=2, pp=2)
    out = run_engine(cfg, params, mesh=mesh, tp=2, int8=1)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)


@pytest.mark.parametrize("pp,ubatch", [(2, 2), (2, 4), (4, 2)])
def test_pp_microbatched_matches_single_device(pp, ubatch):
    """Microbatch pipelining (reference: GptNeoX.cc:780-788): stage s runs
    microbatch m at tick s+m, so stages compute concurrently. Prefill
    pipelines SEQUENCE chunks (C = width/M per tick), decode pipelines batch
    row groups (falls back to serial when B % M != 0 — here B=2, so ubatch=4
    exercises the prefill-only-microbatched composition). Numerics must be
    identical to the unsharded engine either way."""
    cfg = pp_cfg()
    params = init_params(cfg, dtype="fp32")
    ref = run_engine(cfg, params)
    mesh = build_mesh(tp=1, pp=pp)
    out = run_engine(cfg, params, mesh=mesh, tp=1, ubatch=ubatch)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)
    np.testing.assert_array_equal(ref.sequence_lengths, out.sequence_lengths)
    np.testing.assert_allclose(ref.cum_log_probs, out.cum_log_probs, atol=1e-4)


def test_pp_microbatched_int8_matches_single_device():
    cfg = pp_cfg()
    params = quantize_params(init_params(cfg, dtype="fp32"))
    ref = run_engine(cfg, params, int8=1)
    mesh = build_mesh(tp=2, pp=2)
    out = run_engine(cfg, params, mesh=mesh, tp=2, int8=1, ubatch=2)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)


def test_pp_beam_matches_single_device():
    """Beam search (fixed-cache indirection) through the pipeline path."""
    cfg = pp_cfg()
    params = init_params(cfg, dtype="fp32")

    def beam_run(mesh, tp):
        eng = GptNeoXEngine(
            cfg, params,
            RuntimeConfig(dtype="fp32", seq_bucket=4, tensor_para_size=tp),
            mesh=mesh,
        )
        return eng.generate(PROMPTS, output_len=5, beam_width=2)

    ref = beam_run(None, 1)
    out = beam_run(build_mesh(tp=1, pp=2), 1)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)
    np.testing.assert_allclose(ref.cum_log_probs, out.cum_log_probs, atol=1e-4)


def test_pp_collective_permute_at_stage_edges():
    """The compiled decode step must move activations between stages with
    collective-permute (ppermute) — not all-gathers of layer weights."""
    from fastertransformer4codefuse_tpu.parallel import pipeline

    cfg = pp_cfg()
    pp = 4
    mesh = build_mesh(tp=1, pp=pp)
    params = shard_params(cfg, init_params(cfg, dtype="fp32"), mesh)

    B, T = 2, 16
    cache = model.init_kv_cache(cfg, B, T, jnp.float32)
    from fastertransformer4codefuse_tpu.parallel.sharding import cache_sharding
    cache = jax.device_put(cache, cache_sharding(mesh))

    def step(params, tokens, positions, cache):
        return pipeline.decode_step(cfg, mesh, params, tokens, positions, cache)

    tokens = jnp.zeros((B,), jnp.int32)
    positions = jnp.full((B,), 3, jnp.int32)
    hlo = jax.jit(step).lower(params, tokens, positions, cache).compile().as_text()
    assert "collective-permute" in hlo, "no ppermute at stage edges"
    # stage weights must never be all-gathered: any all-gather over the
    # full layer-stacked weight shape would show a gather of the [L, H, ...]
    # qkv slab; assert none of the big weight shapes appear in all-gathers
    import re as _re
    for m in _re.findall(r"all-gather[^\n]*", hlo):
        assert "f32[4,64,192]" not in m, f"layer weights all-gathered: {m}"


def test_tp_nondivisible_vocab_pads_and_matches():
    """CodeFuse's vocab (100831) does not divide tp=8: shard_params must pad
    the vocab-split head to a tp multiple (the reference's vocab_size_padded_
    x8xTP scheme, GptNeoX.cc:260-264) and lm_logits must slice the pad ids
    off before any processor — outputs equal the unsharded engine exactly."""
    cfg = GptNeoXConfig.tiny(
        head_num=8, size_per_head=8, vocab_size=61, inter_size=256
    )
    params = init_params(cfg, dtype="fp32")
    ref = run_engine(cfg, params)
    mesh = build_mesh(tp=8)
    eng = GptNeoXEngine(
        cfg, params,
        RuntimeConfig(dtype="fp32", seq_bucket=4, tensor_para_size=8),
        mesh=mesh,
    )
    assert eng.params["lm_head"].shape[0] == 64  # padded 61 -> 64
    out = eng.generate(
        PROMPTS, output_len=6, top_k=[1, 3], top_p=[0.0, 0.9],
        temperature=[1.0, 0.8], repetition_penalty=1.05, random_seed=[5, 6],
        return_cum_log_probs=True,
    )
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)


def test_tp_nondivisible_vocab_int8_rowwise_head():
    """Same padding path for the int8 per-row-quantized head
    (quantize_embeddings): q rows and per-row scales pad together."""
    cfg = GptNeoXConfig.tiny(
        head_num=8, size_per_head=8, vocab_size=61, inter_size=256
    )
    params = init_params(cfg, dtype="fp32", int8_mode=1, quantize_embeddings=True)
    eng0 = GptNeoXEngine(
        cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=4, int8_mode=1)
    )
    ref = eng0.generate(PROMPTS, output_len=5, top_k=1)
    mesh = build_mesh(tp=8)
    eng = GptNeoXEngine(
        cfg, params,
        RuntimeConfig(dtype="fp32", seq_bucket=4, int8_mode=1, tensor_para_size=8),
        mesh=mesh,
    )
    assert eng.params["lm_head"].q.shape[0] == 64
    assert eng.params["lm_head"].scale.shape[0] == 64
    out = eng.generate(PROMPTS, output_len=5, top_k=1)
    np.testing.assert_array_equal(ref.output_ids, out.output_ids)
