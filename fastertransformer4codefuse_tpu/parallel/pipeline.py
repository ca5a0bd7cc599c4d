"""Pipeline parallelism: a "pp" mesh axis over contiguous layer blocks.

TPU-native rebuild of the reference's pipeline scheme
(/root/reference/src/fastertransformer/models/gptneox/GptNeoXDecoder.cc:94-120
contiguous layers-per-rank blocks, :252-265/:372-383 activation handoff at
stage edges, GptNeoX.cc:998-1021 end-of-step broadcast):

  - Stacked layer weights [L, ...] and the KV cache [L, B, nH, S, dh] are
    sharded on the L axis over the "pp" mesh axis — each stage holds
    L/pp contiguous layers and their cache slabs. A model bigger than one
    chip's HBM fits by raising pp.
  - The forward runs under ``jax.shard_map`` manual over "pp" only; "tp"/"dp"
    stay GSPMD-auto, so the per-layer single-all-reduce TP property inside a
    stage is untouched.
  - A pp-tick ``fori_loop`` drives the stages: at tick t only stage t runs its
    local layer scan (``lax.cond`` — idle stages do NOT stream their weights),
    then the activation hops to the next stage via ``lax.ppermute``. After pp
    ticks the final activation has wrapped around to stage 0 and is broadcast
    with one small psum — the analog of the reference's per-step
    ftNcclBroadcast of output ids.

Sampling and the LM head run OUTSIDE the shard_map, replicated over "pp"
(GSPMD-auto): every stage redundantly computes the logits+sampling for its
copy of the broadcast hidden state, which is value-identical, so no separate
token broadcast is needed.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import GptNeoXConfig
from ..models import gptneox as model
from ..models.params import Params
from ..ops.attention import make_decode_valid, make_prefill_mask
from ..ops.rotary import make_rotary_tables


def _ring(pp: int):
    return [(i, (i + 1) % pp) for i in range(pp)]


def _stage_loop(pp: int, run_local, x, cache):
    """Serial pipeline chain: tick t runs stage t's layers, then the
    activation hops one stage forward; the final value wraps to stage 0."""
    stage = jax.lax.axis_index("pp")

    def tick(t, carry):
        x, cache = carry
        x, cache = jax.lax.cond(
            stage == t, run_local, lambda x, c: (x, c), x, cache
        )
        x = jax.lax.ppermute(x, "pp", _ring(pp))
        return x, cache

    x, cache = jax.lax.fori_loop(0, pp, tick, (x, cache))
    # broadcast the wrapped-around result from stage 0 to every stage
    x = jax.lax.psum(jnp.where(stage == 0, x, jnp.zeros_like(x)), "pp")
    return x, cache


def decode_step(
    config: GptNeoXConfig,
    mesh: Mesh,
    params: Params,
    tokens: jax.Array,  # [B] int32
    positions: jax.Array,  # [B] int32
    cache,
    beam=None,
    kv_skip=None,
):
    """Pipeline-parallel analog of models.gptneox.decode_step.

    Returns (hidden [B, H] replicated over pp, cache updated in each stage's
    local slab)."""
    pp = mesh.shape["pp"]
    L = config.layer_num
    assert L % pp == 0, f"layer_num {L} must divide pp {pp}"
    Lpp = L // pp
    embed_p = {"embed": params["embed"], "final_ln_w": params["final_ln_w"]}
    bw = beam[0] if beam is not None else 0
    beam_indir = beam[1] if beam is not None else jnp.zeros((1,), jnp.int32)
    if kv_skip is None:
        kv_skip_arg = jnp.zeros((1,), jnp.bool_)
        use_skip = False
    else:
        kv_skip_arg = kv_skip
        use_skip = True

    def f(layers_local, embed_p, tokens, positions, cache_local, beam_indir, kv_skip_a):
        S = cache_local["k"].shape[3]
        x = model._embed_lookup(embed_p, tokens)[:, None, :]
        cos_t, sin_t = make_rotary_tables(
            S, config.rotary_embedding_dim, config.rotary_base
        )
        cos = jnp.take(cos_t, positions, axis=0)[:, None, :]
        sin = jnp.take(sin_t, positions, axis=0)[:, None, :]
        valid = make_decode_valid(positions, S)
        beam_t = (bw, beam_indir) if bw else None
        skip = kv_skip_a if use_skip else None

        def run_local(x, cache):
            def body(carry, l):
                x, c = carry
                lp = model._layer_slice(layers_local, l)
                y, c = model.block_decode(
                    config, lp, x, c, l, cos, sin, positions, valid,
                    beam=beam_t, kv_skip=skip,
                )
                return (y, c), None

            (x, cache), _ = jax.lax.scan(body, (x, cache), jnp.arange(Lpp))
            return x, cache

        x, cache_local = _stage_loop(pp, run_local, x, cache_local)
        return x[:, 0], cache_local

    fn = jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P("pp"), P(), P(), P(), P("pp"), P(), P()),
        out_specs=(P(), P("pp")),
        axis_names={"pp"},
        check_vma=False,
    )
    return fn(
        params["layers"], embed_p, tokens, positions, cache, beam_indir, kv_skip_arg
    )


def prefill(
    config: GptNeoXConfig,
    mesh: Mesh,
    params: Params,
    input_ids: jax.Array,  # [B, S] int32
    input_lengths: jax.Array,  # [B]
    cache,
):
    """Pipeline-parallel analog of models.gptneox.prefill.

    Returns (hidden [B, S, H] replicated over pp, cache with [0, S) filled in
    each stage's local slab)."""
    pp = mesh.shape["pp"]
    L = config.layer_num
    assert L % pp == 0, f"layer_num {L} must divide pp {pp}"
    Lpp = L // pp
    embed_p = {"embed": params["embed"], "final_ln_w": params["final_ln_w"]}

    def f(layers_local, embed_p, input_ids, input_lengths, cache_local):
        B, S = input_ids.shape
        x = model._embed_lookup(embed_p, input_ids)
        cos_t, sin_t = make_rotary_tables(
            S, config.rotary_embedding_dim, config.rotary_base
        )
        mask = make_prefill_mask(input_lengths, S)

        def run_local(x, cache):
            def body(carry, l):
                x, c = carry
                lp = model._layer_slice(layers_local, l)
                y, c = model.block_prefill(
                    config, lp, x, c, l, cos_t, sin_t, mask, input_lengths
                )
                return (y, c), None

            (x, cache), _ = jax.lax.scan(body, (x, cache), jnp.arange(Lpp))
            return x, cache

        x, cache_local = _stage_loop(pp, run_local, x, cache_local)
        return x, cache_local

    fn = jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P("pp"), P(), P(), P(), P("pp")),
        out_specs=(P(), P("pp")),
        axis_names={"pp"},
        check_vma=False,
    )
    return fn(params["layers"], embed_p, input_ids, input_lengths, cache)
