"""Collective/compute overlap evidence at the HLO level (VERDICT r4 item 6).

The reference overlaps NCCL collectives with compute through CUDA stream
ordering (its per-layer all-reduce launches on the compute stream,
TensorParallelDecoderSelfAttentionLayer.cc:214-222); on TPU the analogous
guarantee is XLA's async collective lowering: a collective becomes a
start/done pair and the scheduler is free to place independent work between
the two. One chip cannot MEASURE the overlap, but the lowering itself is
checkable without hardware: jax.experimental.topologies AOT-compiles for a
full v5e 2x4 slice (8 devices) on any host, producing the real scheduled TPU
HLO. These tests pin that artifact:

  - every pipeline stage-edge ppermute lowers to collective-permute-start/
    -done (never a synchronous collective-permute), and the schedule places
    instructions between start and done — the "distance" that the latency-
    hiding scheduler can fill with compute;
  - the TP decode layer keeps exactly ONE all-reduce in the scanned layer
    body on real TPU lowering (the parallel-residual single-psum claim,
    previously asserted only on CPU SPMD HLO — GptNeoXDecoder.cc:342-360).

If the installed PJRT TPU compiler cannot build the abstract topology (no
libtpu), the tests skip with that reason rather than fail.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastertransformer4codefuse_tpu import GptNeoXConfig, init_params
from fastertransformer4codefuse_tpu.models import gptneox as model
from fastertransformer4codefuse_tpu.models.params import QuantizedTensor
from fastertransformer4codefuse_tpu.parallel import pipeline
from fastertransformer4codefuse_tpu.parallel.sharding import (
    cache_sharding,
    pad_vocab_for_tp,
    param_shardings,
)


def _v5e_mesh(dp, pp, tp):
    from jax.experimental import topologies
    from jax.sharding import Mesh

    try:
        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x4"
        )
    except Exception as e:  # no libtpu / unsupported plugin
        pytest.skip(f"TPU AOT topology unavailable: {e}")
    return Mesh(np.array(topo.devices).reshape(dp, pp, tp), ("dp", "pp", "tp"))


def _sds(tree, shardings):
    def to_sds(x, s):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)

    def leaf(p, s):
        if isinstance(s, QuantizedTensor):
            return QuantizedTensor(
                q=to_sds(p.q, s.q), scale=to_sds(p.scale, s.scale),
                k_axis=p.k_axis, bits=p.bits, group_size=p.group_size,
            )
        return to_sds(p, s)

    return jax.tree.map(
        leaf, tree, shardings, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )


def _compile_decode(mesh, microbatches=0):
    cfg = GptNeoXConfig.tiny(
        head_num=8, size_per_head=64, vocab_size=512, layer_num=4,
        inter_size=1024,
    )
    params = jax.eval_shape(
        lambda: pad_vocab_for_tp(cfg, init_params(cfg, dtype="bf16"), mesh)
    )
    p_sds = _sds(params, param_shardings(cfg, params, mesh))
    B, S = 4, 256
    cache = jax.eval_shape(lambda: model.init_kv_cache(cfg, B, S, jnp.bfloat16))
    cs = cache_sharding(mesh)
    c_sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=cs), cache
    )
    tok = jax.ShapeDtypeStruct((B,), jnp.int32)
    pos = jax.ShapeDtypeStruct((B,), jnp.int32)

    def step(params, tokens, positions, cache):
        if microbatches:
            h, cache = pipeline.decode_step(
                cfg, mesh, params, tokens, positions, cache,
                microbatches=microbatches,
            )
        else:
            h, cache = model.decode_step(cfg, params, tokens, positions, cache)
        return model.lm_logits(cfg, params, h), cache

    return jax.jit(step).lower(p_sds, tok, pos, c_sds).compile().as_text()


def _start_done_distances(hlo, start_op, done_op):
    """Scheduled-instruction distances between matching start/done pairs.

    In a scheduled module (is_scheduled=true) instruction order within a
    computation IS the execution schedule, so line distance = how much the
    scheduler hoisted between issuing the collective and blocking on it."""
    dists = []
    for comp in hlo.split("\n\n"):
        if start_op not in comp:
            continue
        lines = comp.splitlines()
        starts = {}
        for i, ln in enumerate(lines):
            m = re.match(rf"\s*%([\w.\-]+) = [^=]*{start_op}\(", ln)
            if m:
                starts[m.group(1)] = i
            m2 = re.search(rf"{done_op}\(%([\w.\-]+)\)", ln)
            if m2 and m2.group(1) in starts:
                dists.append(i - starts.pop(m2.group(1)) - 1)
    return dists


def test_pp_stage_edges_lower_to_async_pairs_on_v5e8():
    mesh = _v5e_mesh(1, 2, 4)
    hlo = _compile_decode(mesh, microbatches=2)
    assert "is_scheduled=true" in hlo
    n_start = hlo.count("collective-permute-start")
    # the stage-edge ppermute must be ASYNC: a sync collective-permute would
    # serialize the ring hop exactly where the reference's stream ordering
    # lets NCCL overlap
    assert n_start >= 1, "no async collective-permute emitted"
    assert " collective-permute(" not in hlo, (
        "stage-edge ppermute lowered to a SYNCHRONOUS collective-permute"
    )
    dists = _start_done_distances(
        hlo, "collective-permute-start", "collective-permute-done"
    )
    assert dists, "could not pair any start/done in the scheduled module"
    assert max(dists) > 0, (
        "scheduler placed nothing between collective start and done — "
        f"distances {dists}"
    )


def test_tp_decode_single_allreduce_per_layer_on_v5e8():
    mesh = _v5e_mesh(1, 1, 8)
    hlo = _compile_decode(mesh)
    assert "is_scheduled=true" in hlo
    # The whole module must carry exactly ONE all-reduce OP — sitting inside
    # the scanned layer loop, so it launches once per layer (the reference's
    # single fused all-reduce, GptNeoXDecoder.cc:342-360). On this lowering
    # XLA even TUPLES the attention-proj and ffn-down partial sums into one
    # collective launch (a tupled all-reduce of both [B, H] partials), and
    # the vocab-split logits need no collective at all because the output
    # stays sharded. No sync/async distinction matters for the count: both
    # spellings are counted.
    lines = hlo.splitlines()
    n_ar = sum(
        1 for ln in lines
        if (" all-reduce(" in ln or " all-reduce-start(" in ln)
    )
    assert n_ar == 1, f"expected exactly 1 all-reduce op, got {n_ar}"
    assert any(" while(" in ln for ln in lines), "layer scan loop missing"
    # and zero per-projection collectives of any other flavor
    for op in (" reduce-scatter(", " all-to-all("):
        assert not any(op in ln for ln in lines), f"unexpected {op} in decode"
