"""HuggingFace GPT-NeoX -> engine parameter conversion.

Rebuilds the reference's offline converter
(/root/reference/examples/pytorch/codefuse/huggingface_convert.py) twice over:

  - ``params_from_hf_state_dict``: in-memory HF state dict -> engine pytree
    (the fast path; no intermediate files).
  - ``convert_hf_to_bin`` / ``load_bin_checkpoint``: write/read the reference's
    on-disk ``.bin`` + ``config.ini`` format byte-for-byte
    (file names: codefuse_example.py:347-372), so checkpoints converted for
    the reference engine can be loaded directly and vice versa.

The QKV layout gotcha (huggingface_convert.py:64-74): HF stores the fused QKV
out-dim as [heads, 3, head_dim]. The engine keeps that ordering (heads-major is
already TP-shardable by flat chunking), so the in-memory path needs only a
transpose; the FT reorder to [3, heads, head_dim] happens solely when writing
the reference's on-disk .bin format.
"""
from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np

import jax.numpy as jnp

from ..core.config import GptNeoXConfig
from ..core.dtypes import jnp_dtype
from ..models.params import Params


def _np(x) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32 numpy (without importing torch)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, np.float32)


def stack_layers(fn, num_layers: int, dtype):
    """jnp-stack per-layer numpy tensors: [L, ...] in the engine dtype
    (shared by the LLaMA-lineage converters)."""
    import jax.numpy as jnp

    return jnp.asarray(np.stack([fn(i) for i in range(num_layers)]), dtype)


def fused_qkv_concat(
    get, i: int, prefix: str = "model.layers.{}.self_attn."
) -> np.ndarray:
    """HF separate q/k/v Linears [out, H] -> the engine's fused
    [H, q_all | k_all | v_all] (qkv_layout="concat"; LLaMA / Qwen2 /
    Mixtral share the default naming, OPT passes its own prefix)."""
    p = prefix.format(i)
    return np.concatenate(
        [get(p + "q_proj.weight").T, get(p + "k_proj.weight").T,
         get(p + "v_proj.weight").T],
        axis=1,
    )


def fused_qkv_bias_concat(
    get, i: int, prefix: str = "model.layers.{}.self_attn."
) -> np.ndarray:
    """Concat bias counterpart of fused_qkv_concat (Qwen2, OPT)."""
    p = prefix.format(i)
    return np.concatenate(
        [get(p + "q_proj.bias"), get(p + "k_proj.bias"), get(p + "v_proj.bias")]
    )


def config_from_hf(hf_config, model_name: str = "gptneox") -> GptNeoXConfig:
    """Build a GptNeoXConfig from a transformers GPTNeoXConfig
    (field mapping per huggingface_convert.py:100-119)."""
    g = lambda k: getattr(hf_config, k)
    n_heads = g("num_attention_heads")
    head_size = g("hidden_size") // n_heads
    return GptNeoXConfig(
        head_num=n_heads,
        size_per_head=head_size,
        inter_size=g("intermediate_size"),
        layer_num=g("num_hidden_layers"),
        rotary_embedding_dim=int(head_size * g("rotary_pct")),
        vocab_size=g("vocab_size"),
        start_id=g("bos_token_id") or 0,
        end_id=g("eos_token_id") or 0,
        use_gptj_residual=bool(g("use_parallel_residual")),
        layernorm_eps=float(g("layer_norm_eps")),
        rotary_base=float(getattr(hf_config, "rotary_emb_base", 10000.0)),
        activation="gelu" if g("hidden_act") == "gelu" else g("hidden_act"),
        model_name=model_name,
    )


def _reorder_qkv_weight(w_hf: np.ndarray, n_heads: int) -> np.ndarray:
    """HF qkv weight [3H, H] (out layout [nH, 3, dh]) -> [H, 3, nH*dh]."""
    out_dim, hidden = w_hf.shape
    dh = out_dim // (3 * n_heads)
    w = w_hf.T.reshape(hidden, n_heads, 3, dh)
    return np.transpose(w, (0, 2, 1, 3)).reshape(hidden, 3, n_heads * dh)


def _reorder_qkv_bias(b_hf: np.ndarray, n_heads: int) -> np.ndarray:
    """HF qkv bias [3H] (layout [nH, 3, dh]) -> [3, nH*dh]."""
    dh = b_hf.shape[0] // (3 * n_heads)
    b = b_hf.reshape(n_heads, 3, dh)
    return np.transpose(b, (1, 0, 2)).reshape(3, n_heads * dh)


def params_from_hf_state_dict(
    config: GptNeoXConfig,
    state_dict: Mapping[str, Any],
    dtype="fp32",
) -> Params:
    """Convert an HF GPTNeoXForCausalLM state dict into the engine pytree."""
    dtype = jnp_dtype(dtype)
    L = config.layer_num
    nH = config.head_num

    sd = {k: v for k, v in state_dict.items()}

    def get(name):
        return _np(sd[name])

    def stack(fmt, transform=lambda x: x):
        return jnp.asarray(
            np.stack([transform(get(fmt.format(i))) for i in range(L)]), dtype
        )

    pre = "gpt_neox.layers.{}."
    layers = {
        "ln1_w": stack(pre + "input_layernorm.weight"),
        "ln1_b": stack(pre + "input_layernorm.bias"),
        # engine keeps HF's (head, qkv, dh) fused ordering: transpose only
        "qkv_w": stack(pre + "attention.query_key_value.weight", lambda w: w.T),
        "qkv_b": stack(pre + "attention.query_key_value.bias"),
        "proj_w": stack(pre + "attention.dense.weight", lambda w: w.T),
        "ln2_w": stack(pre + "post_attention_layernorm.weight"),
        "ln2_b": stack(pre + "post_attention_layernorm.bias"),
        "up_w": stack(pre + "mlp.dense_h_to_4h.weight", lambda w: w.T),
        "up_b": stack(pre + "mlp.dense_h_to_4h.bias"),
        "down_w": stack(pre + "mlp.dense_4h_to_h.weight", lambda w: w.T),
    }
    if config.use_gptj_residual:
        # pre-summed biases, like the reference converter
        # (huggingface_convert.py:193-206)
        layers["down_b"] = jnp.asarray(
            np.stack(
                [
                    get(pre.format(i) + "attention.dense.bias")
                    + get(pre.format(i) + "mlp.dense_4h_to_h.bias")
                    for i in range(L)
                ]
            ),
            dtype,
        )
    else:
        layers["down_b"] = stack(pre + "mlp.dense_4h_to_h.bias")
        layers["proj_b"] = stack(pre + "attention.dense.bias")

    return {
        "embed": jnp.asarray(get("gpt_neox.embed_in.weight"), dtype),
        "layers": layers,
        "final_ln_w": jnp.asarray(get("gpt_neox.final_layer_norm.weight"), dtype),
        "final_ln_b": jnp.asarray(get("gpt_neox.final_layer_norm.bias"), dtype),
        "lm_head": jnp.asarray(get("embed_out.weight"), dtype),  # [V, H]
    }


# --------------------------------------------------------------------------- #
# Reference-format .bin checkpoint directory IO
# --------------------------------------------------------------------------- #

def convert_hf_to_bin(
    model,  # transformers GPTNeoXForCausalLM (torch)
    saved_dir: str,
    infer_tp: int = 1,
    weight_data_type: str = "fp32",
    model_name: str = "gptneox",
) -> GptNeoXConfig:
    """Write a reference-format checkpoint dir (``N-gpu`` layout) from an HF
    model. File-name and split semantics follow huggingface_convert.py:22-206:
    row-split dense/down (axis 0 of the transposed [in, out] kernel is split on
    the *input* dim), col-split qkv/up, biases of the row-split kernels divided
    by TP, qkv reordered to [3, heads, dh] before col-split.
    """
    os.makedirs(saved_dir, exist_ok=True)
    np_dtype = {"fp32": np.float32, "fp16": np.float16}[weight_data_type]
    config = config_from_hf(model.config, model_name)
    config = GptNeoXConfig(**{**config.__dict__, "weight_data_type": weight_data_type})
    config.to_ini(saved_dir)

    nH = config.head_num
    factor = infer_tp
    sd = {k: _np(v) for k, v in model.state_dict().items()}

    def save(name, arr):
        arr.astype(np_dtype).tofile(os.path.join(saved_dir, name))

    save("model.wte.bin", sd["gpt_neox.embed_in.weight"])
    save("model.final_layernorm.weight.bin", sd["gpt_neox.final_layer_norm.weight"])
    save("model.final_layernorm.bias.bin", sd["gpt_neox.final_layer_norm.bias"])
    save("model.lm_head.weight.bin", sd["embed_out.weight"])

    for i in range(config.layer_num):
        p = f"gpt_neox.layers.{i}."
        o = f"model.layers.{i}."
        save(o + "input_layernorm.weight.bin", sd[p + "input_layernorm.weight"])
        save(o + "input_layernorm.bias.bin", sd[p + "input_layernorm.bias"])
        save(o + "post_attention_layernorm.weight.bin", sd[p + "post_attention_layernorm.weight"])
        save(o + "post_attention_layernorm.bias.bin", sd[p + "post_attention_layernorm.bias"])

        qkv_w = _reorder_qkv_weight(sd[p + "attention.query_key_value.weight"], nH)
        qkv_b = _reorder_qkv_bias(sd[p + "attention.query_key_value.bias"], nH)
        for j, chunk in enumerate(np.split(qkv_w, factor, axis=-1)):
            save(o + f"attention.query_key_value.weight.{j}.bin", chunk)
        for j, chunk in enumerate(np.split(qkv_b, factor, axis=-1)):
            save(o + f"attention.query_key_value.bias.{j}.bin", chunk)

        proj_w = sd[p + "attention.dense.weight"].T  # [nH*dh, H]
        for j, chunk in enumerate(np.split(proj_w, factor, axis=0)):
            save(o + f"attention.dense.weight.{j}.bin", chunk)
        attn_bias = sd[p + "attention.dense.bias"]
        save(o + "attention.dense.bias.bin", attn_bias / factor if factor > 1 else attn_bias)

        up_w = sd[p + "mlp.dense_h_to_4h.weight"].T  # [H, I]
        for j, chunk in enumerate(np.split(up_w, factor, axis=-1)):
            save(o + f"mlp.dense_h_to_4h.weight.{j}.bin", chunk)
        for j, chunk in enumerate(np.split(sd[p + "mlp.dense_h_to_4h.bias"], factor, axis=-1)):
            save(o + f"mlp.dense_h_to_4h.bias.{j}.bin", chunk)

        down_w = sd[p + "mlp.dense_4h_to_h.weight"].T  # [I, H]
        for j, chunk in enumerate(np.split(down_w, factor, axis=0)):
            save(o + f"mlp.dense_4h_to_h.weight.{j}.bin", chunk)
        down_bias = sd[p + "mlp.dense_4h_to_h.bias"]
        save(o + "mlp.dense_4h_to_h.bias.bin", down_bias / factor if factor > 1 else down_bias)

        if config.use_gptj_residual:
            # the reference sums the already-divided biases
            # (huggingface_convert.py:193-206 reads back the saved files)
            save(o + "mlp.attention.bias.sum.bin", (attn_bias + down_bias) / factor)
    return config
