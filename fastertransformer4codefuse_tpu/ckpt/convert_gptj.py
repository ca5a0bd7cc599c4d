"""HuggingFace GPT-J -> engine parameter conversion.

GPT-J is the reference's second decoder-only family
(/root/reference/src/fastertransformer/models/gptj/) and the origin of the
"gptj residual": x + attn(ln(x)) + mlp(ln(x)) with ONE shared layernorm.
The engine reuses the GPT-NeoX block with:
  - rotary_style="gptj" (interleaved rotate-every-two pairs),
  - ln2 := ln1 (sharing the layernorm parameters reproduces the single-LN
    block exactly — the second normalization is the same computation),
  - qkv bias = 0 (GPT-J projections are bias-free),
  - down_b = fc_out.bias (out_proj has no bias, so the parallel-residual
    bias sum is just the MLP's),
  - an LM-head bias (GPT-J's lm_head carries one).
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp

from ..core.config import GptNeoXConfig
from ..core.dtypes import jnp_dtype
from ..models.params import Params
from .convert import _np


def config_from_hf_gptj(hf_config, model_name: str = "gptj") -> GptNeoXConfig:
    g = lambda k: getattr(hf_config, k)
    n_embd = g("n_embd")
    n_head = g("n_head")
    inner = g("n_inner") or 4 * n_embd
    act = {"gelu_new": "gelu-tanh", "gelu": "gelu"}.get(
        g("activation_function"), "gelu-tanh"
    )
    return GptNeoXConfig(
        head_num=n_head,
        size_per_head=n_embd // n_head,
        inter_size=inner,
        layer_num=g("n_layer"),
        rotary_embedding_dim=g("rotary_dim") or (n_embd // n_head),
        vocab_size=g("vocab_size"),
        start_id=g("bos_token_id") or 0,
        end_id=g("eos_token_id") or 0,
        use_gptj_residual=True,
        layernorm_eps=float(g("layer_norm_epsilon")),
        activation=act,
        rotary_style="gptj",
        model_name=model_name,
    )


def params_from_hf_gptj_state_dict(
    config: GptNeoXConfig, state_dict: Mapping[str, Any], dtype="fp32"
) -> Params:
    dtype = jnp_dtype(dtype)
    L, H = config.layer_num, config.hidden_size
    nH, dh = config.head_num, config.size_per_head
    sd = dict(state_dict)

    def get(name):
        return _np(sd[name])

    def fused_qkv(i):
        # separate q/k/v Linears [H_out, H_in] -> engine fused [H, (head, qkv, dh)]
        wq = get(f"transformer.h.{i}.attn.q_proj.weight").T.reshape(H, nH, dh)
        wk = get(f"transformer.h.{i}.attn.k_proj.weight").T.reshape(H, nH, dh)
        wv = get(f"transformer.h.{i}.attn.v_proj.weight").T.reshape(H, nH, dh)
        return np.stack([wq, wk, wv], axis=2).reshape(H, 3 * nH * dh)

    def stack(fn):
        return jnp.asarray(np.stack([fn(i) for i in range(L)]), dtype)

    layers = {
        "ln1_w": stack(lambda i: get(f"transformer.h.{i}.ln_1.weight")),
        "ln1_b": stack(lambda i: get(f"transformer.h.{i}.ln_1.bias")),
        # shared LN: same parameters reproduce GPT-J's single pre-LN exactly
        "ln2_w": stack(lambda i: get(f"transformer.h.{i}.ln_1.weight")),
        "ln2_b": stack(lambda i: get(f"transformer.h.{i}.ln_1.bias")),
        "qkv_w": stack(fused_qkv),
        "qkv_b": jnp.zeros((L, 3 * nH * dh), dtype),
        "proj_w": stack(lambda i: get(f"transformer.h.{i}.attn.out_proj.weight").T),
        "up_w": stack(lambda i: get(f"transformer.h.{i}.mlp.fc_in.weight").T),
        "up_b": stack(lambda i: get(f"transformer.h.{i}.mlp.fc_in.bias")),
        "down_w": stack(lambda i: get(f"transformer.h.{i}.mlp.fc_out.weight").T),
        "down_b": stack(lambda i: get(f"transformer.h.{i}.mlp.fc_out.bias")),
    }
    return {
        "embed": jnp.asarray(get("transformer.wte.weight"), dtype),
        "layers": layers,
        "final_ln_w": jnp.asarray(get("transformer.ln_f.weight"), dtype),
        "final_ln_b": jnp.asarray(get("transformer.ln_f.bias"), dtype),
        "lm_head": jnp.asarray(get("lm_head.weight"), dtype),  # [V, H]
        "lm_head_b": jnp.asarray(get("lm_head.bias"), dtype),
    }
