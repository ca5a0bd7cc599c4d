"""HuggingFace Mixtral -> engine parameter conversion (the MoE family).

Mixtral = the LLaMA recipe (RMSNorm, GQA, rope, bias-free) with the dense
SwiGLU FFN replaced by a top-2-of-E sparse MoE block. The shared block
covers it with moe_experts/moe_top_k + the expert-stacked weights the
ops/moe.py dispatcher consumes ([E, H, I] per layer, E sharded under expert
parallelism). HF expert naming: w1 = gate, w2 = down, w3 = up; the router
("gate" Linear) normalizes top-k weights (norm_topk_prob) exactly like
ops/moe.moe_ffn. The reference's MoE machinery (moe_kernels.cu) was never
wired into its CodeFuse path — this family is parity-plus (SURVEY §2.2).
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp

from ..core.config import GptNeoXConfig
from ..core.dtypes import jnp_dtype
from ..models.params import Params
from .convert import _np, fused_qkv_concat, stack_layers


def config_from_hf_mixtral(hf_config, model_name: str = "mixtral") -> GptNeoXConfig:
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
        qkv_layout="concat",
        moe_experts=g("num_local_experts"),
        moe_top_k=g("num_experts_per_tok", 2),
        model_name=model_name,
    )


def params_from_hf_mixtral_state_dict(
    config: GptNeoXConfig, state_dict: Mapping[str, Any], dtype="fp32"
) -> Params:
    dtype = jnp_dtype(dtype)
    L, E = config.layer_num, config.moe_experts
    sd = dict(state_dict)

    def get(name):
        return _np(sd[name])

    def fused_qkv(i):
        return fused_qkv_concat(get, i)

    def experts(i, which):  # w1 = gate, w2 = down, w3 = up
        p = f"model.layers.{i}.block_sparse_moe.experts."
        return np.stack(
            [get(f"{p}{j}.{which}.weight").T for j in range(E)]
        )  # [E, in, out]

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
        "router_w": stack(
            lambda i: get(f"model.layers.{i}.block_sparse_moe.gate.weight").T
        ),
        "egate_w": stack(lambda i: experts(i, "w1")),
        "eup_w": stack(lambda i: experts(i, "w3")),
        "edown_w": stack(lambda i: experts(i, "w2")),
    }
    embed = get("model.embed_tokens.weight")
    lm_head = get("lm_head.weight") if "lm_head.weight" in sd else embed
    return {
        "embed": jnp.asarray(embed, dtype),
        "layers": layers,
        "final_ln_w": jnp.asarray(get("model.norm.weight"), dtype),
        "lm_head": jnp.asarray(lm_head, dtype),
    }
