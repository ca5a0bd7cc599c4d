"""HuggingFace GPT-2 -> engine parameter conversion (the "gpt" family).

The reference serves GPT-2/OPT-lineage checkpoints through its
multi_gpu_gpt family (src/fastertransformer/models/multi_gpu_gpt/
ParallelGpt.cc — learned absolute position table, serial residual, biased
LayerNorms and projections). The shared block covers it with:
  - position_embedding="learned" (+ params["pos_embed"] = wpe) and
    rotary_embedding_dim=0 (apply_rotary no-ops),
  - serial residual (use_gptj_residual=False), layernorm with biases,
  - qkv_layout="concat": HF's fused c_attn already emits [q all|k all|v all],
  - tanh-approx gelu (HF activation_function="gelu_new"),
  - LM head tied to wte.
HF stores the projections as Conv1D ([in, out]) — exactly the [H, N] layout
the engine wants, so no transposes at all.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp

from ..core.config import GptNeoXConfig
from ..core.dtypes import jnp_dtype
from ..models.params import Params
from .convert import _np


def config_from_hf_gpt2(hf_config, model_name: str = "gpt") -> GptNeoXConfig:
    g = lambda k, d=None: getattr(hf_config, k, d)
    H = g("hidden_size") or g("n_embd")
    nH = g("num_attention_heads") or g("n_head")
    act = g("activation_function", "gelu_new")
    return GptNeoXConfig(
        head_num=nH,
        size_per_head=H // nH,
        inter_size=g("n_inner") or 4 * H,
        layer_num=g("num_hidden_layers") or g("n_layer"),
        rotary_embedding_dim=0,
        vocab_size=g("vocab_size"),
        start_id=g("bos_token_id") or 50256,
        end_id=g("eos_token_id") or 50256,
        use_gptj_residual=False,
        layernorm_eps=float(g("layer_norm_epsilon", 1e-5)),
        activation={"gelu_new": "gelu-tanh", "gelu": "gelu",
                    "gelu_pytorch_tanh": "gelu-tanh", "relu": "relu"}.get(
                        act, "gelu-tanh"),
        position_embedding="learned",
        qkv_layout="concat",
        model_name=model_name,
    )


def params_from_hf_gpt2_state_dict(
    config: GptNeoXConfig, state_dict: Mapping[str, Any], dtype="fp32"
) -> Params:
    dtype = jnp_dtype(dtype)
    L = config.layer_num
    sd = dict(state_dict)
    pre = "transformer." if "transformer.wte.weight" in sd else ""

    def get(name):
        return _np(sd[pre + name])

    def stack(fn):
        return jnp.asarray(np.stack([fn(i) for i in range(L)]), dtype)

    layers = {
        "ln1_w": stack(lambda i: get(f"h.{i}.ln_1.weight")),
        "ln1_b": stack(lambda i: get(f"h.{i}.ln_1.bias")),
        "ln2_w": stack(lambda i: get(f"h.{i}.ln_2.weight")),
        "ln2_b": stack(lambda i: get(f"h.{i}.ln_2.bias")),
        # Conv1D weights are [in, out] — already the engine's layout
        "qkv_w": stack(lambda i: get(f"h.{i}.attn.c_attn.weight")),
        "qkv_b": stack(lambda i: get(f"h.{i}.attn.c_attn.bias")),
        "proj_w": stack(lambda i: get(f"h.{i}.attn.c_proj.weight")),
        "proj_b": stack(lambda i: get(f"h.{i}.attn.c_proj.bias")),
        "up_w": stack(lambda i: get(f"h.{i}.mlp.c_fc.weight")),
        "up_b": stack(lambda i: get(f"h.{i}.mlp.c_fc.bias")),
        "down_w": stack(lambda i: get(f"h.{i}.mlp.c_proj.weight")),
        "down_b": stack(lambda i: get(f"h.{i}.mlp.c_proj.bias")),
    }
    embed = get("wte.weight")
    return {
        "embed": jnp.asarray(embed, dtype),
        "pos_embed": jnp.asarray(get("wpe.weight"), dtype),
        "layers": layers,
        "final_ln_w": jnp.asarray(get("ln_f.weight"), dtype),
        "final_ln_b": jnp.asarray(get("ln_f.bias"), dtype),
        "lm_head": jnp.asarray(embed, dtype),  # tied
    }
