"""HuggingFace Qwen2 -> engine parameter conversion.

Qwen2 (and Qwen2.5/Qwen2.5-Coder — same architecture class) is the LLaMA
recipe with ONE structural difference: the q/k/v Linears carry biases while
o_proj and the MLP do not (``qkv_bias=True`` with ``use_bias=False``).
Everything else rides the shared block exactly like LLaMA: RMSNorm, SwiGLU,
GQA via qkv_layout="concat", full-head-dim neox-style rotary with a large
rope_theta (1e6 for Qwen2-7B).

Like the LLaMA/GPT-J families, this exercises the registry seam the
reference keeps for new decoder-only families (SURVEY §2.5 — its 20+
families all predate Qwen); cites the same extension pattern as
convert_llama.py.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp

from ..core.config import GptNeoXConfig
from ..core.dtypes import jnp_dtype
from ..models.params import Params
from .convert import _np, fused_qkv_bias_concat, fused_qkv_concat, stack_layers


def config_from_hf_qwen2(hf_config, model_name: str = "qwen2") -> GptNeoXConfig:
    g = lambda k, d=None: getattr(hf_config, k, d)
    H = g("hidden_size")
    nH = g("num_attention_heads")
    nKV = g("num_key_value_heads", nH) or nH
    dh = g("head_dim", None) or H // nH
    return GptNeoXConfig(
        head_num=nH,
        size_per_head=dh,
        inter_size=g("intermediate_size"),
        layer_num=g("num_hidden_layers"),
        rotary_embedding_dim=dh,
        vocab_size=g("vocab_size"),
        start_id=g("bos_token_id") or 1,
        end_id=g("eos_token_id") or 2,
        use_gptj_residual=False,
        layernorm_eps=float(g("rms_norm_eps")),
        rotary_base=float(g("rope_theta", 1000000.0)),
        activation={"silu": "silu", "gelu": "gelu"}.get(g("hidden_act"), "silu"),
        rotary_style="neox",
        norm="rmsnorm",
        gated_ffn=True,
        kv_head_num=nKV,
        use_bias=False,
        qkv_bias=bool(g("attention_bias", True)),  # Qwen2 default: q/k/v biased
        qkv_layout="concat",
        model_name=model_name,
    )


def params_from_hf_qwen2_state_dict(
    config: GptNeoXConfig, state_dict: Mapping[str, Any], dtype="fp32"
) -> Params:
    dtype = jnp_dtype(dtype)
    L = config.layer_num
    sd = dict(state_dict)

    def get(name):
        return _np(sd[name])

    def fused_qkv(i):
        return fused_qkv_concat(get, i)

    def fused_qkv_bias(i):
        return fused_qkv_bias_concat(get, i)

    def stack(fn):
        return stack_layers(fn, L, dtype)

    layers = {
        "ln1_w": stack(lambda i: get(f"model.layers.{i}.input_layernorm.weight")),
        "ln2_w": stack(
            lambda i: get(f"model.layers.{i}.post_attention_layernorm.weight")
        ),
        "qkv_w": stack(fused_qkv),
        "proj_w": stack(
            lambda i: get(f"model.layers.{i}.self_attn.o_proj.weight").T
        ),
        "gate_w": stack(lambda i: get(f"model.layers.{i}.mlp.gate_proj.weight").T),
        "up_w": stack(lambda i: get(f"model.layers.{i}.mlp.up_proj.weight").T),
        "down_w": stack(lambda i: get(f"model.layers.{i}.mlp.down_proj.weight").T),
    }
    if config.qkv_bias:
        layers["qkv_b"] = stack(fused_qkv_bias)
    embed = get("model.embed_tokens.weight")
    lm_head = (
        get("lm_head.weight") if "lm_head.weight" in sd else embed  # tied
    )
    return {
        "embed": jnp.asarray(embed, dtype),
        "layers": layers,
        "final_ln_w": jnp.asarray(get("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(lm_head, dtype),  # [V, H]
    }
