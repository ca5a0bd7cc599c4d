"""HuggingFace OPT -> engine parameter conversion.

OPT is the second multi_gpu_gpt-class lineage the reference serves
(src/fastertransformer/models/multi_gpu_gpt handles both GPT-2 and OPT
checkpoints): learned absolute positions, serial pre-LN residuals, biased
separate q/k/v Linears, ReLU FFN. Two OPT quirks, both absorbed at
conversion so the shared block stays untouched:

  - the position table carries a +2 offset (HF OPTLearnedPositionalEmbedding
    adds 2 to every position id) — the converter DROPS the first two rows so
    the engine's plain position lookup lands on the right embeddings;
  - q/k/v are separate [out, in] Linears with biases -> fused
    [H, q|k|v] + concat bias (qkv_layout="concat").

Covers do_layer_norm_before=True configs (125M..66B except 350M, whose
word-embedding projection dims differ — asserted).
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp

from ..core.config import GptNeoXConfig
from ..core.dtypes import jnp_dtype
from ..models.params import Params
from .convert import _np, fused_qkv_bias_concat, fused_qkv_concat, stack_layers


def config_from_hf_opt(hf_config, model_name: str = "opt") -> GptNeoXConfig:
    g = lambda k, d=None: getattr(hf_config, k, d)
    H = g("hidden_size")
    assert g("word_embed_proj_dim", H) == H, (
        "OPT-350M's word-embedding projection is not supported"
    )
    assert g("do_layer_norm_before", True), (
        "post-LN OPT variants are not supported"
    )
    nH = g("num_attention_heads")
    return GptNeoXConfig(
        head_num=nH,
        size_per_head=H // nH,
        inter_size=g("ffn_dim"),
        layer_num=g("num_hidden_layers"),
        rotary_embedding_dim=0,
        vocab_size=g("vocab_size"),
        # `or 2` would silently remap legitimate token id 0
        start_id=g("bos_token_id") if g("bos_token_id") is not None else 2,
        end_id=g("eos_token_id") if g("eos_token_id") is not None else 2,
        use_gptj_residual=False,
        layernorm_eps=1e-5,
        activation={"relu": "relu", "gelu": "gelu"}.get(
            g("activation_function", "relu"), "relu"),
        position_embedding="learned",
        qkv_layout="concat",
        model_name=model_name,
    )


def params_from_hf_opt_state_dict(
    config: GptNeoXConfig, state_dict: Mapping[str, Any], dtype="fp32"
) -> Params:
    dtype = jnp_dtype(dtype)
    L = config.layer_num
    sd = dict(state_dict)
    pre = "model.decoder." if "model.decoder.embed_tokens.weight" in sd else "decoder."

    def get(name):
        return _np(sd[pre + name])

    def fused_qkv(i):
        return fused_qkv_concat(get, i, "layers.{}.self_attn.")

    def fused_qkv_b(i):
        return fused_qkv_bias_concat(get, i, "layers.{}.self_attn.")

    def stack(fn):
        return stack_layers(fn, L, dtype)

    layers = {
        "ln1_w": stack(lambda i: get(f"layers.{i}.self_attn_layer_norm.weight")),
        "ln1_b": stack(lambda i: get(f"layers.{i}.self_attn_layer_norm.bias")),
        "ln2_w": stack(lambda i: get(f"layers.{i}.final_layer_norm.weight")),
        "ln2_b": stack(lambda i: get(f"layers.{i}.final_layer_norm.bias")),
        "qkv_w": stack(fused_qkv),
        "qkv_b": stack(fused_qkv_b),
        "proj_w": stack(lambda i: get(f"layers.{i}.self_attn.out_proj.weight").T),
        "proj_b": stack(lambda i: get(f"layers.{i}.self_attn.out_proj.bias")),
        "up_w": stack(lambda i: get(f"layers.{i}.fc1.weight").T),
        "up_b": stack(lambda i: get(f"layers.{i}.fc1.bias")),
        "down_w": stack(lambda i: get(f"layers.{i}.fc2.weight").T),
        "down_b": stack(lambda i: get(f"layers.{i}.fc2.bias")),
    }
    embed = get("embed_tokens.weight")
    lm_head = _np(sd["lm_head.weight"]) if "lm_head.weight" in sd else embed
    return {
        "embed": jnp.asarray(embed, dtype),
        # drop the two offset rows (HF adds 2 to every position id)
        "pos_embed": jnp.asarray(get("embed_positions.weight")[2:], dtype),
        "layers": layers,
        "final_ln_w": jnp.asarray(get("final_layer_norm.weight"), dtype),
        "final_ln_b": jnp.asarray(get("final_layer_norm.bias"), dtype),
        "lm_head": jnp.asarray(lm_head, dtype),
    }
