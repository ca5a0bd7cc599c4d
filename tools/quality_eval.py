"""Quantization quality-delta harness.

The reference's quality story is "int8 matches fp16 on CodeFuse-13B"
(README.md:37-39, judged via HumanEval in the paper); this tool measures the
measurable proxy offline: perplexity / mean token NLL of the engine over a
token stream, for any combination of weight precision (fp/bf16, int8, int4)
and KV-cache dtype, plus greedy-token agreement between two configurations.

Usage (library):
    from tools.quality_eval import eval_nll, greedy_agreement
    nll_fp  = eval_nll(cfg, params_fp,  token_ids)
    nll_i8  = eval_nll(cfg, quantize_params(params_fp), token_ids)
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fastertransformer4codefuse_tpu.core.config import GptNeoXConfig
from fastertransformer4codefuse_tpu.models import gptneox as model


def _chunk_nll(config: GptNeoXConfig, params, chunk_ids: jax.Array) -> jax.Array:
    """Sum of next-token NLL over one teacher-forced chunk [S]."""
    S = chunk_ids.shape[0]
    cache = model.init_kv_cache(config, 1, S, jnp.bfloat16)
    hidden, _ = model.prefill(
        config, params, chunk_ids[None], jnp.full((1,), S, jnp.int32), cache
    )
    logits = model.lm_logits(config, params, hidden)[0]  # [S, V]
    lp = jax.nn.log_softmax(logits[:-1], axis=-1)
    tgt = chunk_ids[1:].astype(jnp.int32)
    return -jnp.sum(jnp.take_along_axis(lp, tgt[:, None], axis=1))


def eval_nll(
    config: GptNeoXConfig,
    params,
    token_ids: Sequence[int],
    chunk: int = 512,
) -> float:
    """Mean next-token negative log likelihood over a token stream
    (perplexity = exp(result)). Chunked prefills; one compile per chunk size."""
    ids = np.asarray(token_ids, np.int32)
    fn = jax.jit(lambda p, c: _chunk_nll(config, p, c))
    total_nll, total_tok = 0.0, 0
    for start in range(0, len(ids) - 1, chunk):
        piece = ids[start : start + chunk + 1]
        if len(piece) < 2:
            break
        if len(piece) == chunk + 1:
            total_nll += float(fn(params, jnp.asarray(piece)))
        else:  # variable-length tail: evaluate unjitted once
            total_nll += float(_chunk_nll(config, params, jnp.asarray(piece)))
        total_tok += len(piece) - 1
    return total_nll / max(total_tok, 1)


def _decode_chunk_nll(config, params, chunk_ids, kv_dtype, prefix):
    """Sum of next-token NLL over one chunk, predictions made through the
    DECODE path (teacher-forced) so the quantized KV cache is exercised —
    prefill-based NLL cannot see KV-cache dtype at all."""
    S = chunk_ids.shape[0]
    Sc = S + (S % 2)  # packed caches need even capacity
    cache = model.init_kv_cache(config, 1, Sc, kv_dtype)
    hidden, cache = model.prefill(
        config, params, chunk_ids[None, :prefix],
        jnp.full((1,), prefix, jnp.int32), cache,
    )
    rot = model.make_rotary_tables(
        Sc, config.rotary_embedding_dim, config.rotary_base
    )

    def lp_of(hid, tgt):
        logits = model.lm_logits(config, params, hid[None])[0, -1]
        return jax.nn.log_softmax(logits)[tgt]

    first = lp_of(hidden[0, -1:], chunk_ids[prefix])

    def step(carry, t):
        cache = carry
        hid, cache = model.decode_step(
            config, params, chunk_ids[t][None], jnp.asarray([t], jnp.int32),
            cache, rotary_tables=rot,
        )  # hid [1, H]
        return cache, lp_of(hid, chunk_ids[t + 1])

    _, lps = jax.lax.scan(
        step, cache, jnp.arange(prefix, S - 1, dtype=jnp.int32)
    )
    return -(first + jnp.sum(lps))


def eval_decode_nll(
    config: GptNeoXConfig,
    params,
    token_ids: Sequence[int],
    kv_dtype,
    chunk: int = 256,
    prefix: int = 32,
) -> float:
    """Mean next-token NLL with predictions flowing through decode attention
    over a ``kv_dtype`` cache (the KV-quantization quality measurement)."""
    ids = np.asarray(token_ids, np.int32)
    fn = jax.jit(
        lambda p, c: _decode_chunk_nll(config, p, c, kv_dtype, prefix)
    )
    total_nll, total_tok = 0.0, 0
    for start in range(0, len(ids) - 1, chunk):
        piece = ids[start : start + chunk + 1]
        if len(piece) != chunk + 1:
            break
        total_nll += float(fn(params, jnp.asarray(piece)))
        total_tok += chunk + 1 - prefix
    return total_nll / max(total_tok, 1)


def greedy_agreement(
    engine_a, engine_b, prompts: List[List[int]], output_len: int = 32
) -> float:
    """Fraction of greedy tokens on which two engine configs agree."""
    match, total = 0, 0
    for p in prompts:
        oa = engine_a.generate([p], output_len=output_len, top_k=1)
        ob = engine_b.generate([p], output_len=output_len, top_k=1)
        na = int(oa.sequence_lengths[0, 0])
        nb = int(ob.sequence_lengths[0, 0])
        n = min(na, nb)
        ra = oa.output_ids[0, 0, len(p) : n]
        rb = ob.output_ids[0, 0, len(p) : n]
        match += int((ra == rb).sum())
        total += max(na, nb) - len(p)
    return match / max(total, 1)


if __name__ == "__main__":
    import argparse

    from fastertransformer4codefuse_tpu.ckpt.loader import load_bin_checkpoint
    from fastertransformer4codefuse_tpu.ckpt.quantize import quantize_params

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", required=True)
    ap.add_argument("--tokens_file", required=True, help="np.int32 binary token stream")
    ap.add_argument("--weight_bits", type=int, default=8)
    ap.add_argument("--max_tokens", type=int, default=8192)
    args = ap.parse_args()

    cfg, params = load_bin_checkpoint(args.ckpt_path, dtype="bf16")
    ids = np.fromfile(args.tokens_file, dtype=np.int32)[: args.max_tokens]
    nll_fp = eval_nll(cfg, params, ids)
    qp = quantize_params(params, weight_bits=args.weight_bits)
    nll_q = eval_nll(cfg, qp, ids)
    print(
        f"fp nll {nll_fp:.4f} (ppl {np.exp(nll_fp):.2f})  "
        f"w{args.weight_bits} nll {nll_q:.4f} (ppl {np.exp(nll_q):.2f})  "
        f"delta {nll_q - nll_fp:+.4f}"
    )
