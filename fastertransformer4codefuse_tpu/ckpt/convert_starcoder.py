"""HuggingFace GPTBigCode (StarCoder) -> engine parameter conversion.

StarCoder is the GPT-2 recipe (learned absolute positions, serial residual,
biased LayerNorms/projections, tanh-gelu) with MULTI-QUERY attention: one
shared K/V head (kv_head_num=1) behind n_head query heads — the fused c_attn
emits [q (nH*dh) | k (dh) | v (dh)]. The shared block covers it with
position_embedding="learned" + qkv_layout="concat" + kv_head_num=1; the
flash decode kernel's GQA grouping (g = nH) reads the single KV head's bytes
once (ops/flash_decode.py). Another code-generation family the reference
era never reached (its multi_gpu_gpt stops at MHA; SURVEY §2.5).

Unlike GPT-2's Conv1D ([in, out]) layout, GPTBigCode uses nn.Linear
([out, in]) — every projection transposes on conversion.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp

from ..core.config import GptNeoXConfig
from ..core.dtypes import jnp_dtype
from ..models.params import Params
from .convert import _np


def config_from_hf_starcoder(
    hf_config, model_name: str = "starcoder"
) -> GptNeoXConfig:
    g = lambda k, d=None: getattr(hf_config, k, d)
    H = g("hidden_size") or g("n_embd")
    nH = g("num_attention_heads") or g("n_head")
    multi_query = bool(g("multi_query", True))
    act = g("activation_function", "gelu_pytorch_tanh")
    return GptNeoXConfig(
        head_num=nH,
        size_per_head=H // nH,
        inter_size=g("n_inner") or 4 * H,
        layer_num=g("num_hidden_layers") or g("n_layer"),
        rotary_embedding_dim=0,
        vocab_size=g("vocab_size"),
        start_id=g("bos_token_id") or 0,
        end_id=g("eos_token_id") or 0,
        use_gptj_residual=False,
        layernorm_eps=float(g("layer_norm_epsilon", 1e-5)),
        activation={"gelu_pytorch_tanh": "gelu-tanh", "gelu_new": "gelu-tanh",
                    "gelu": "gelu", "relu": "relu"}.get(act, "gelu-tanh"),
        position_embedding="learned",
        kv_head_num=1 if multi_query else None,
        qkv_layout="concat",
        model_name=model_name,
    )


def params_from_hf_starcoder_state_dict(
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
        # nn.Linear [out, in] -> [H, q|k|v] (c_attn already emits concat
        # [q (nH*dh) | k (nKV*dh) | v (nKV*dh)])
        "qkv_w": stack(lambda i: get(f"h.{i}.attn.c_attn.weight").T),
        "qkv_b": stack(lambda i: get(f"h.{i}.attn.c_attn.bias")),
        "proj_w": stack(lambda i: get(f"h.{i}.attn.c_proj.weight").T),
        "proj_b": stack(lambda i: get(f"h.{i}.attn.c_proj.bias")),
        "up_w": stack(lambda i: get(f"h.{i}.mlp.c_fc.weight").T),
        "up_b": stack(lambda i: get(f"h.{i}.mlp.c_fc.bias")),
        "down_w": stack(lambda i: get(f"h.{i}.mlp.c_proj.weight").T),
        "down_b": stack(lambda i: get(f"h.{i}.mlp.c_proj.bias")),
    }
    embed = get("wte.weight")
    # lm_head sits OUTSIDE the transformer.* prefix (tied to wte by default)
    lm_head = _np(sd["lm_head.weight"]) if "lm_head.weight" in sd else embed
    return {
        "embed": jnp.asarray(embed, dtype),
        "pos_embed": jnp.asarray(get("wpe.weight"), dtype),
        "layers": layers,
        "final_ln_w": jnp.asarray(get("ln_f.weight"), dtype),
        "final_ln_b": jnp.asarray(get("ln_f.bias"), dtype),
        "lm_head": jnp.asarray(lm_head, dtype),
    }
