"""Activation-aware (AWQ-style) calibration for weight-only quantization.

The reference ships round-to-nearest weight-only quantization only
(/root/reference/src/fastertransformer/th_op/common/WeightOnlyQuantOps.cc:140-233)
and claims int8 is lossless (README.md:37-39); at int4 that stops being a
given. This module adds the calibration pass the reference lacks: collect
per-input-channel activation magnitudes on sample prompts, grid-search
per-channel weight scales that protect salient channels (the AWQ recipe:
Lin et al., "AWQ: Activation-aware Weight Quantization", MLSys'24 — s_k =
amax_k^alpha, alpha searched per tensor against an activation-weighted
reconstruction loss), and fold the inverse scales EXACTLY into the preceding
layernorm's affine so the fp forward is unchanged.

Folding targets: qkv_w (fed by ln1) and up_w (fed by ln2) — for both, the
input is ``norm(x) * g + b`` and scaling g, b by 1/s divides the linear's
input channel k by s_k exactly. proj_w/down_w have no preceding affine (their
inputs come out of attention / the nonlinearity), so AWQ scaling there would
change the fp function; they stay RTN, like AWQ's own layer coverage on
GPT-NeoX-style blocks.

Flow:
    stats  = collect_activation_stats(cfg, params, token_batches)
    params = apply_awq_scaling(cfg, params, stats)      # fp-exact rewrite
    params = quantize_params(params, weight_bits=4, group_size=128)
"""
from __future__ import annotations

import contextlib
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import GptNeoXConfig
from ..models import gptneox as model
from ..models.params import Params

# call order of ops.linear.linear inside one transformer block
_BLOCK_CALL_ORDER = ("qkv", "proj", "up", "down")
# gated blocks (SwiGLU) make FIVE linear calls: _ffn runs gate, then up
_BLOCK_CALL_ORDER_GATED = ("qkv", "proj", "gate", "up", "down")


@contextlib.contextmanager
def _record_linear_inputs(sink: Dict[str, List[np.ndarray]], order=None):
    """Patch the model's ``linear`` to record each call's input-channel amax.

    Calls inside a block arrive in ``order`` (default _BLOCK_CALL_ORDER:
    qkv -> proj -> up -> down); the recorder keys them by position. Only
    works on an UNROLLED (eager) forward — under lax.scan the values are
    tracers."""
    order = order or _BLOCK_CALL_ORDER
    real = model.linear
    count = [0]

    def recording(x, w, *args, **kwargs):
        name = order[count[0] % len(order)]
        count[0] += 1
        amax = np.asarray(
            jnp.max(jnp.abs(x.astype(jnp.float32)), axis=tuple(range(x.ndim - 1)))
        )
        sink.setdefault(name, []).append(amax)
        return real(x, w, *args, **kwargs)

    model.linear = recording
    try:
        yield
    finally:
        model.linear = real


def collect_activation_stats(
    config: GptNeoXConfig,
    params: Params,
    token_batches: Sequence[Sequence[Sequence[int]]],
    cache_dtype=jnp.bfloat16,
) -> Dict[str, np.ndarray]:
    """Run calibration prompts through an eager prefill, recording per-layer
    per-input-channel activation amax for each linear.

    Returns {"qkv": [L, H], "proj": [L, H], "up": [L, H], "down": [L, I]}
    (running max over all batches/tokens)."""
    assert not config.moe_experts, (
        "the positional linear-call recorder assumes the dense block's call "
        "order; MoE blocks run batched expert einsums it never sees"
    )
    L = config.layer_num
    stats: Dict[str, np.ndarray] = {}
    for batch in token_batches:
        lens = np.array([len(x) for x in batch], np.int32)
        S = int(lens.max())
        ids = np.full((len(batch), S), config.end_id, np.int32)
        for i, row in enumerate(batch):
            ids[i, : len(row)] = np.asarray(row, np.int32)
        cache = model.init_kv_cache(config, len(batch), S, cache_dtype)
        sink: Dict[str, List[np.ndarray]] = {}
        order = (
            _BLOCK_CALL_ORDER_GATED if config.gated_ffn else _BLOCK_CALL_ORDER
        )
        with _record_linear_inputs(sink, order):
            model.prefill(
                config, params, jnp.asarray(ids), jnp.asarray(lens), cache,
                unroll=True,
            )
        for name, per_layer in sink.items():
            assert len(per_layer) == L, (name, len(per_layer))
            arr = np.stack(per_layer)  # [L, K]
            stats[name] = arr if name not in stats else np.maximum(stats[name], arr)
    return stats


def awq_search_scales(
    w: np.ndarray,  # [K, N] float
    amax: np.ndarray,  # [K] activation amax per input channel
    weight_bits: int = 4,
    group_size: int = 0,
    n_grid: int = 20,
) -> np.ndarray:
    """Grid-search the AWQ exponent: s = (amax/gmean)^alpha, alpha in [0,1),
    minimizing the activation-weighted reconstruction error of the quantized
    weight. Returns the best per-input-channel scale s [K] (s=1 at alpha=0)."""
    w = np.asarray(w, np.float32)
    amax = np.asarray(amax, np.float32)
    K, N = w.shape
    qmax = 2 ** (weight_bits - 1) - 1
    ratio = amax / max(np.exp(np.mean(np.log(np.maximum(amax, 1e-8)))), 1e-8)
    ratio = np.maximum(ratio, 1e-4)

    def quant_err(ws: np.ndarray, s: np.ndarray) -> float:
        if group_size:
            g = ws.reshape(K // group_size, group_size, N)
            scale = np.abs(g).max(axis=1, keepdims=True) / qmax
            scale = np.where(scale > 0, scale, 1.0)
            deq = (np.rint(g / scale).clip(-qmax - 1, qmax) * scale).reshape(K, N)
        else:
            scale = np.abs(ws).max(axis=0, keepdims=True) / qmax
            scale = np.where(scale > 0, scale, 1.0)
            deq = np.rint(ws / scale).clip(-qmax - 1, qmax) * scale
        # output-space error proxy: rows weighted by activation magnitude
        dw = (deq / s[:, None]) - w
        return float(np.sum((dw * amax[:, None]) ** 2))

    best_s, best_err = np.ones(K, np.float32), None
    for alpha in np.linspace(0.0, 1.0, n_grid, endpoint=False):
        s = ratio**alpha
        err = quant_err(w * s[:, None], s)
        if best_err is None or err < best_err:
            best_err, best_s = err, s.astype(np.float32)
    return best_s


def apply_awq_scaling(
    config: GptNeoXConfig,
    params: Params,
    stats: Dict[str, np.ndarray],
    weight_bits: int = 4,
    group_size: int = 0,
    n_grid: int = 20,
) -> Params:
    """Rewrite params with AWQ scales folded in — fp-forward-EXACT.

    qkv_w[l] <- qkv_w[l] * s, ln1_{w,b}[l] <- ln1_{w,b}[l] / s (same for
    up_w/ln2). Quantize afterwards with ckpt.quantize.quantize_params."""
    layers = dict(params["layers"])
    dt = layers["qkv_w"].dtype
    L = config.layer_num
    for w_key, ln_key, st_key in (("qkv_w", "ln1", "qkv"), ("up_w", "ln2", "up")):
        w_all = np.array(layers[w_key], np.float32)  # writable copies
        ln_w = np.array(layers[f"{ln_key}_w"], np.float32)
        ln_b = np.array(layers[f"{ln_key}_b"], np.float32)
        for l in range(L):
            s = awq_search_scales(
                w_all[l], stats[st_key][l], weight_bits, group_size, n_grid
            )
            w_all[l] *= s[:, None]
            ln_w[l] /= s
            ln_b[l] /= s
        layers[w_key] = jnp.asarray(w_all, dt)
        layers[f"{ln_key}_w"] = jnp.asarray(ln_w, layers[f"{ln_key}_w"].dtype)
        layers[f"{ln_key}_b"] = jnp.asarray(ln_b, layers[f"{ln_key}_b"].dtype)
    out = dict(params)
    out["layers"] = layers
    return out
