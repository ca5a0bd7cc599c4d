"""Pallas decode attention over the (optionally int8) KV cache.

The TPU replacement for the reference's fused masked multi-head attention
decode kernel (/root/reference/src/fastertransformer/kernels/
decoder_masked_multihead_attention.cu: one CTA per (batch, head) streaming the
cached keys with online softmax). Design notes for the TPU version:

- The sequence axis is CHUNKED through the innermost grid dim (online softmax
  over running (m, l, acc) scratch), so arbitrarily long caches stream
  through a double-buffered pipeline instead of demanding one whole-[S] VMEM
  block (the round-1 kernel's S<=4096 gate came from exactly that).
- A block covers ``hb`` heads (amortizing per-grid-step overhead — a
  head-per-cell grid measured 2x slower on small blocks); the math runs
  BATCHED over all hb heads: one batched M=1 MXU dot for scores
  (``[hb, 1, bs] = q[hb, 1, dh] @ k[hb, bs, dh]^T``), one ``exp`` over the
  whole ``[hb, bs]`` score tile, one batched dot for pv
  (``[hb, 1, dh] = p[hb, 1, bs] @ v[hb, bs, dh]``), scores LANE-major so the
  per-vector cache scales ([hb, bs] slabs) and the mask iota land with ZERO
  relayouts. An unrolled per-head loop of the same dots measured 38us/layer
  vs 23us batched at S=1088 (DMA floor 17us): per-head [1, bs] ops waste
  7/8 sublanes of every VPU op, the batched form fills them.
  All converts feed the MXU as bf16: int8 -> bf16 is EXACT (|x| <= 127 fits
  bf16's 8-bit mantissa) and halves the relayout + feed width vs f32; only
  scores/p/acc stay f32.
- The layer is scalar-prefetched from the stacked [L, ...] cache slabs (same
  trick as the stacked weight kernels), so the kernel reads straight out of
  the scan-carried cache with no per-layer slice copy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    scalars_ref, q_ref, k_ref, *rest, sm_scale, bs, n_s, hb, g, has_scale,
    k_packed=False, v_packed=False, compute_dtype=jnp.bfloat16, gq=None,
):
    """``g`` = query rows per KV head (1 = plain MHA; >1 = GQA, the LLaMA
    family): the per-KV-head query dot simply widens from M=1 to M=g — the
    KV bytes are still read once per KV head, matching the reference decode
    kernel's head_num/kv_head_num grouping
    (decoder_masked_multihead_attention_template.hpp).

    ``gq`` (chunk mode, flash_chunk_paged): g = C * gq packs C CONSECUTIVE
    query positions per GQA group of gq heads; row r's causal bound is then
    pos + (r % g) // gq, where ``pos`` is the chunk's START position — the
    multi-query generalization needs no per-query scalars because chunk
    positions are consecutive."""
    if has_scale:
        ks_ref, v_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        v_ref, o_ref, m_ref, l_ref, acc_ref = rest
    R = hb * g  # flattened (kv_head, group) score rows
    cq = 1 if gq is None else g // gq  # consecutive query positions

    def load_kv(ref, packed):
        # packed int4 slabs: bitcast doubles the sublane (sequence) axis with
        # rows (2i, 2i+1) = positions in order; int4 -> bf16 is exact
        raw = ref[0, 0]  # [hb, bs(/2), dh]
        if packed:
            return pltpu.bitcast(raw, jnp.int4).astype(compute_dtype)
        return raw.astype(compute_dtype)
    b = pl.program_id(0)
    s_idx = pl.program_id(2)
    pos = scalars_ref[1 + b]  # newest-token slot (inclusive mask bound)

    @pl.when(s_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)  # running max (col 0)
        l_ref[...] = jnp.zeros_like(l_ref)  # running denom (col 0)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # chunks fully past the valid prefix contribute nothing; skip their math
    # (their DMA is already in flight — the win is VPU time, not bytes)
    @pl.when(s_idx * bs <= pos + cq - 1)
    def _compute():
        col = jax.lax.broadcasted_iota(jnp.int32, (R, bs), 1) + s_idx * bs
        if cq == 1:
            bound = pos
        else:  # per-row query offset within the consecutive chunk
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, bs), 0)
            bound = pos + (r_iota % g) // (g // cq)
        valid = col <= bound
        qb = q_ref[0].astype(compute_dtype)  # [hb, g, dh]
        kf = load_kv(k_ref, k_packed)  # [hb, bs, dh]
        # scores = q @ k^T: hb-batched M=g MXU dot, LANE-major [hb, g, bs]
        scores = jax.lax.dot_general(
            qb, kf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(R, bs)
        if has_scale:
            ks = ks_ref[0, 0].astype(jnp.float32)  # [hb, bs]
            scores = scores * jnp.repeat(ks, g, axis=0) if g > 1 else scores * ks
        scores = jnp.where(valid, scores * sm_scale, MASK_VALUE)

        m_prev = m_ref[:, :1]  # [R, 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # [R, bs]; masked cols -> 0
        if cq > 1:
            # per-row bounds: a row whose bound lies wholly before this chunk
            # has ALL scores at MASK_VALUE, making p = exp(0) = 1 — re-mask
            # so such rows contribute nothing (same hazard as _beam_kernel)
            p = jnp.where(valid, p, 0.0)

        if has_scale:
            # OOB tail loads can hold NaN bit patterns in the scale slab
            # and 0 * NaN = NaN — re-mask after the multiply
            vs = vs_ref[0, 0].astype(jnp.float32)
            vsr = jnp.repeat(vs, g, axis=0) if g > 1 else vs
            pv_w = jnp.where(valid, p * vsr, 0.0)
        else:
            pv_w = p
        vf = load_kv(v_ref, v_packed)  # [hb, bs, dh]
        if not has_scale:
            # float caches: tail garbage could be NaN while p is 0 (chunk
            # mode: valid data extends through the chunk's own last write)
            row = jax.lax.broadcasted_iota(jnp.int32, (hb, bs, 1), 1) + s_idx * bs
            vf = jnp.where(row <= pos + cq - 1, vf, 0.0)
        # pv = p @ v: hb-batched M=g MXU dot, K=bs on v's sublanes
        pv = jax.lax.dot_general(
            pv_w.astype(compute_dtype).reshape(hb, g, bs), vf,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(R, -1)  # [R, dh]
        acc_ref[...] = alpha * acc_ref[...] + pv
        m_ref[:, :1] = m_new
        l_ref[:, :1] = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)

    @pl.when(s_idx == n_s - 1)
    def _done():
        denom = jnp.maximum(l_ref[:, :1], 1e-20)
        o_ref[0] = (
            (acc_ref[...] / denom).reshape(hb, g, -1).astype(o_ref.dtype)
        )


def _beam_kernel(
    scalars_ref, q_ref, ind_ref, k_ref, *rest,
    sm_scale, bs, n_s, hb, bw, has_scale,
):
    """Grouped beam decode chunk: loads ALL bw physical rows' K/V tiles for
    one beam group and resolves the cache indirection in-register — each
    cache byte is read ONCE per group (like attend_decode_beam's all-pairs
    formulation, but fused with the online softmax and streaming
    length-proportional chunks like the plain decode kernel)."""
    if has_scale:
        ks_ref, v_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        v_ref, o_ref, m_ref, l_ref, acc_ref = rest

    g = pl.program_id(0)
    s_idx = pl.program_id(2)
    # per-row newest-token slots for this group: scalars[1 + g*bw + j]
    R = bw * hb  # flattened (j, h) rows

    @pl.when(s_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    group_max = scalars_ref[1 + g * bw]
    for j in range(1, bw):
        group_max = jnp.maximum(group_max, scalars_ref[1 + g * bw + j])

    @pl.when(s_idx * bs <= group_max)
    def _compute():
        qb = q_ref[0].astype(jnp.bfloat16)  # [bw, hb, dh]
        qh = qb.transpose(1, 0, 2)  # [hb, bw, dh]
        ind = ind_ref[0]  # [bw, bs] int32 physical row per (beam, position)
        col = jax.lax.broadcasted_iota(jnp.int32, (bw, bs), 1) + s_idx * bs

        # selected scores [hb, bw, bs]: unrolled over the bw physical rows,
        # one-hot indirection select per (beam, position) in-register
        sel_scores = jnp.zeros((hb, bw, bs), jnp.float32)
        for c in range(bw):
            kc = k_ref[0, 0, c].astype(jnp.bfloat16)  # [hb, bs, dh]
            sc = jax.lax.dot_general(
                qh, kc, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [hb, bw, bs]
            if has_scale:
                sc = sc * ks_ref[0, 0, c].astype(jnp.float32)[:, None, :]
            sel_scores = sel_scores + jnp.where(
                (ind == c)[None, :, :], sc, 0.0
            )

        # per-beam causal bound: valid[j, s] = s <= positions[group*bw + j]
        rowj = jax.lax.broadcasted_iota(jnp.int32, (bw, bs), 0)
        bound = jnp.zeros((bw, bs), jnp.int32)
        for j in range(bw):
            bound = jnp.where(rowj == j, scalars_ref[1 + g * bw + j], bound)
        valid = col <= bound
        scores = jnp.where(
            valid[None, :, :], sel_scores * sm_scale, MASK_VALUE
        ).reshape(R, bs)  # rows = (h, j)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)  # [R, bs]
        # a row whose chunk lies wholly past ITS OWN position (the group
        # bound admits the chunk when ANY row still has data) has every score
        # at MASK_VALUE, making p = exp(0) = 1 — re-mask so such rows
        # contribute nothing to l/acc (and 0*NaN scale tails stay out)
        p = jnp.where(
            jnp.broadcast_to(valid[None, :, :], (hb, bw, bs)).reshape(R, bs),
            p, 0.0,
        )

        ph = p.reshape(hb, bw, bs)
        pv = jnp.zeros((hb, bw, acc_ref.shape[-1]), jnp.float32)
        for c in range(bw):
            sel = (ind == c)[None, :, :] & valid[None, :, :]
            if has_scale:
                # mask AFTER the scale multiply: OOB scale tails can be NaN
                pc = jnp.where(
                    sel, ph * vs_ref[0, 0, c].astype(jnp.float32)[:, None, :],
                    0.0,
                )
            else:
                pc = jnp.where(sel, ph, 0.0)
            vc = v_ref[0, 0, c].astype(jnp.bfloat16)  # [hb, bs, dh]
            if not has_scale:
                # float caches: the region past EVERY row's extent can hold
                # garbage and 0 * NaN = NaN inside the dot — zero it. Between
                # a shorter row's own extent and group_max the bytes are
                # unwritten too, but engine caches are zero-init (finite) and
                # the indirection contract only selects rows whose extent
                # covers the position (matching the XLA fallback, which reads
                # vg unmasked — see kv_cache.attend_decode_beam)
                tail = jax.lax.broadcasted_iota(jnp.int32, (1, bs, 1), 1)
                vc = jnp.where(tail + s_idx * bs <= group_max, vc, 0.0)
            pv = pv + jax.lax.dot_general(
                pc.astype(jnp.bfloat16), vc, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [hb, bw, dh]

        acc_ref[...] = alpha * acc_ref[...] + pv.reshape(R, -1)
        m_ref[:, :1] = m_new
        l_ref[:, :1] = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)

    @pl.when(s_idx == n_s - 1)
    def _done():
        denom = jnp.maximum(l_ref[:, :1], 1e-20)
        out = (acc_ref[...] / denom).reshape(hb, bw, -1).transpose(1, 0, 2)
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bw", "sm_scale", "hb", "bs", "interpret")
)
def flash_decode_beam_stacked(
    q: jax.Array,  # [BB, nH, dh] bf16 (BB = B * bw, beam-minor rows)
    k_all: jax.Array,  # [L, BB, nH, S, dh] int8 or float
    ks_all,  # [L, BB, nH, S] scales or None
    v_all: jax.Array,
    vs_all,
    layer: jax.Array,
    positions: jax.Array,  # [BB] newest-token slot per row
    indir: jax.Array,  # [BB, S] int32 in [0, bw) — cache indirection
    bw: int,
    sm_scale: float,
    hb: int = 40,
    bs: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Beam decode attention with IN-KERNEL cache indirection — the analog of
    the reference decode kernel's cache_indir parameter
    (decoder_masked_multihead_attention.h): each beam group's bw physical
    rows stream through VMEM once per chunk; per-position one-hot selects
    resolve which row belongs to each target beam. Streams only
    ceil(max_group_pos/bs) chunks (length-proportional reads) vs the XLA
    all-pairs path's full-allocation reads."""
    BB, nH, dh = q.shape
    B = BB // bw
    has_scale = ks_all is not None
    L, _, _, S, _ = k_all.shape
    hb = next(d for d in range(min(hb, nH), 0, -1) if nH % d == 0)
    # VMEM guard: bw rows of K+V (+scales) double-buffered within ~12MB
    kv_bytes = 2 * k_all.dtype.itemsize
    while bw * hb * bs * (dh * kv_bytes + 4 * has_scale) * 2 > 12 * 1024 * 1024:
        if bs > 128:
            bs //= 2
        else:
            hb = next(d for d in range(hb - 1, 0, -1) if nH % d == 0)
    n_s = -(-S // bs)
    scalars = jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), positions.astype(jnp.int32)]
    )

    qg = q.reshape(B, bw, nH, dh)
    indg = indir.reshape(B, bw, S)
    kg = k_all.reshape(L, B, bw, nH, S, dh)
    vg = v_all.reshape(L, B, bw, nH, S, dh)

    def _clamp(g, s, sr):
        m = sr[1 + g * bw]
        for j in range(1, bw):
            m = jnp.maximum(m, sr[1 + g * bw + j])
        return jnp.minimum(s, m // bs)

    kv_spec = pl.BlockSpec(
        (1, 1, bw, hb, bs, dh),
        lambda g, h, s, sr: (sr[0], g, 0, h, _clamp(g, s, sr), 0),
    )
    sc_spec = pl.BlockSpec(
        (1, 1, bw, hb, bs),
        lambda g, h, s, sr: (sr[0], g, 0, h, _clamp(g, s, sr)),
    )
    in_specs = [
        pl.BlockSpec((1, bw, hb, dh), lambda g, h, s, sr: (g, 0, h, 0)),
        pl.BlockSpec(
            (1, bw, bs), lambda g, h, s, sr: (g, 0, _clamp(g, s, sr))
        ),
        kv_spec,
    ]
    operands = [qg, indg, kg]
    if has_scale:
        ksg = ks_all.reshape(L, B, bw, nH, S)
        vsg = vs_all.reshape(L, B, bw, nH, S)
        in_specs += [sc_spec, kv_spec, sc_spec]
        operands += [ksg, vg, vsg]
    else:
        in_specs += [kv_spec]
        operands += [vg]
    R = bw * hb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nH // hb, n_s),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, bw, hb, dh), lambda g, h, s, sr: (g, 0, h, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _beam_kernel, sm_scale=sm_scale, bs=bs, n_s=n_s, hb=hb, bw=bw,
            has_scale=has_scale,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, bw, nH, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BB * bw * nH * S * dh,
            bytes_accessed=2 * BB * nH * S * dh * k_all.dtype.itemsize,
            transcendentals=BB * nH * S,
        ),
        interpret=interpret,
    )(scalars, *operands)
    return out.reshape(BB, nH, dh)


@functools.partial(jax.jit, static_argnames=("sm_scale", "hb", "interpret"))
def flash_decode_paged(
    q: jax.Array,  # [B, nH, dh] (nH may exceed the pool's KV heads: GQA)
    pk: jax.Array,  # [L, P, nKV, ps, dh] int8 or float page-pool slab
    pks,  # [L, P, nKV, ps] scales, or None for float pages
    pv: jax.Array,
    pvs,
    layer: jax.Array,  # scalar
    positions: jax.Array,  # [B] — newest-token LOGICAL slot (inclusive mask)
    page_table: jax.Array,  # [B, n_pg] int32 physical page per logical chunk
    sm_scale: float,
    hb: int = 40,
    interpret: bool = False,
) -> jax.Array:
    """Block-table decode attention over a PAGED KV pool (engine/paged_kv.py).

    Identical math to flash_decode_stacked — the kernel body is shared — with
    the sequence-chunk grid resolved through a scalar-prefetched block table:
    chunk size == page size, and grid step (b, h, s) streams physical page
    ``page_table[b, min(s, pos_b // ps)]``. The clamp keeps reads
    length-proportional exactly like the dense kernel (revisited block index
    -> the Pallas pipeline skips the re-fetch), and the whole-page block keeps
    the [ps, dh] minor layout canonical — no gather, no relayout pressure at
    any pool width (the dense pool's batched scatter forces wide pools off
    the kernel; paged pools never scatter)."""
    B, nH, dh = q.shape
    has_scale = pks is not None
    L, P, nKV, psk, dh2 = pk.shape
    # packed int4 pages carry ps/2 position-pair bytes; the scale slab always
    # has the UNPACKED page size, which defines the grid and mask arithmetic
    ps = pks.shape[3] if has_scale else psk
    k_packed = has_scale and 2 * psk == ps
    v_packed = has_scale and 2 * pv.shape[3] == ps
    if k_packed or v_packed:
        assert ps >= 256, "packed pages need page_size >= 256 (sublane tile)"
    n_pg = page_table.shape[1]
    assert (dh, ) == (dh2, ) and nH % nKV == 0
    g = nH // nKV
    q = q.reshape(B, nKV, g, dh)
    hb = next(d for d in range(min(hb, nKV), 0, -1) if nKV % d == 0)
    # VMEM guard: chunk size is pinned to the page size, so only hb shrinks
    kv_bytes = (2 - k_packed * 0.5 - v_packed * 0.5) * pk.dtype.itemsize
    while hb > 1 and hb * ps * (dh * kv_bytes + 4 * has_scale) * 2 > 12 * 1024 * 1024:
        hb = next(d for d in range(hb - 1, 0, -1) if nKV % d == 0)
    scalars = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        positions.astype(jnp.int32),
        page_table.astype(jnp.int32).reshape(-1),
    ])

    def _page(b, s, sr):
        sc = jnp.minimum(s, sr[1 + b] // ps)  # clamp past the valid prefix
        return sr[1 + B + b * n_pg + sc]

    def kv_spec(packed):
        rows = ps // 2 if packed else ps
        return pl.BlockSpec(
            (1, 1, hb, rows, dh),
            lambda b, h, s, sr: (sr[0], _page(b, s, sr), h, 0, 0),
        )

    sc_spec = pl.BlockSpec(
        (1, 1, hb, ps), lambda b, h, s, sr: (sr[0], _page(b, s, sr), h, 0)
    )
    in_specs = [
        pl.BlockSpec((1, hb, g, dh), lambda b, h, s, sr: (b, h, 0, 0)),
        kv_spec(k_packed),
    ]
    operands = [q, pk]
    if has_scale:
        in_specs += [sc_spec, kv_spec(v_packed), sc_spec]
        operands += [pks, pv, pvs]
    else:
        in_specs += [kv_spec(False)]
        operands += [pv]
    R = hb * g
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nKV // hb, n_pg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, hb, g, dh), lambda b, h, s, sr: (b, h, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, sm_scale=sm_scale, bs=ps, n_s=n_pg, hb=hb, g=g,
            has_scale=has_scale, k_packed=k_packed, v_packed=v_packed,
            compute_dtype=jnp.float32 if interpret else jnp.bfloat16,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nKV, g, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nH * n_pg * ps * dh,
            bytes_accessed=2 * B * nKV * n_pg * ps * dh * pk.dtype.itemsize,
            transcendentals=B * nH * n_pg * ps,
        ),
        interpret=interpret,
    )(scalars, *operands)
    return out.reshape(B, nH, dh)


@functools.partial(jax.jit, static_argnames=("sm_scale", "hb", "interpret"))
def flash_chunk_paged(
    q: jax.Array,  # [B, C, nH, dh] — C CONSECUTIVE query positions per row
    pk: jax.Array,  # [L, P, nKV, ps(/2), dh]
    pks,
    pv: jax.Array,
    pvs,
    layer: jax.Array,
    pos: jax.Array,  # [B] chunk START positions
    page_table: jax.Array,  # [B, n_pg]
    sm_scale: float,
    hb: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Chunked-prefill attention over a PAGED pool: the multi-query
    generalization of flash_decode_paged. The C chunk queries ride the
    kernel's per-KV-head row axis (g = C * gqa) with per-row causal bounds
    pos + query_offset — expressible without per-query scalars because chunk
    positions are consecutive. Replaces the XLA page-gather fallback that
    materialized the whole logical cache per layer on chunk ticks (measured
    +16% per chunk tick at 13B B=8)."""
    B, C, nH, dh = q.shape
    has_scale = pks is not None
    L, P, nKV, psk, dh2 = pk.shape
    ps = pks.shape[3] if has_scale else psk
    k_packed = has_scale and 2 * psk == ps
    v_packed = has_scale and 2 * pv.shape[3] == ps
    n_pg = page_table.shape[1]
    gq = nH // nKV
    g = C * gq
    qg = (
        q.reshape(B, C, nKV, gq, dh)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, nKV, g, dh)
    )
    hb = next(d for d in range(min(hb, nKV), 0, -1) if nKV % d == 0)
    # VMEM guard: R = hb * C * gq rows of fp32 scratch + the KV block
    kv_bytes = (2 - k_packed * 0.5 - v_packed * 0.5) * pk.dtype.itemsize
    while hb > 1 and (
        hb * ps * (dh * kv_bytes + 4 * has_scale) * 2
        + hb * g * (256 + dh) * 4
    ) > 12 * 1024 * 1024:
        hb = next(d for d in range(hb - 1, 0, -1) if nKV % d == 0)
    scalars = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        pos.astype(jnp.int32),
        page_table.astype(jnp.int32).reshape(-1),
    ])

    def _page(b, s, sr):
        sc = jnp.minimum(s, (sr[1 + b] + C - 1) // ps)
        return sr[1 + B + b * n_pg + sc]

    def kv_spec(packed):
        rows = ps // 2 if packed else ps
        return pl.BlockSpec(
            (1, 1, hb, rows, dh),
            lambda b, h, s, sr: (sr[0], _page(b, s, sr), h, 0, 0),
        )

    sc_spec = pl.BlockSpec(
        (1, 1, hb, ps), lambda b, h, s, sr: (sr[0], _page(b, s, sr), h, 0)
    )
    in_specs = [
        pl.BlockSpec((1, hb, g, dh), lambda b, h, s, sr: (b, h, 0, 0)),
        kv_spec(k_packed),
    ]
    operands = [qg, pk]
    if has_scale:
        in_specs += [sc_spec, kv_spec(v_packed), sc_spec]
        operands += [pks, pv, pvs]
    else:
        in_specs += [kv_spec(False)]
        operands += [pv]
    R = hb * g
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nKV // hb, n_pg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, hb, g, dh), lambda b, h, s, sr: (b, h, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, dh), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, sm_scale=sm_scale, bs=ps, n_s=n_pg, hb=hb, g=g, gq=gq,
            has_scale=has_scale, k_packed=k_packed, v_packed=v_packed,
            compute_dtype=jnp.float32 if interpret else jnp.bfloat16,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nKV, g, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nH * C * n_pg * ps * dh,
            bytes_accessed=2 * B * nKV * n_pg * ps * dh * pk.dtype.itemsize,
            transcendentals=B * nH * C * n_pg * ps,
        ),
        interpret=interpret,
    )(scalars, *operands)
    return (
        out.reshape(B, nKV, C, gq, dh)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, C, nH, dh)
    )


@functools.partial(jax.jit, static_argnames=("sm_scale", "hb", "bs", "interpret"))
def flash_decode_stacked(
    q: jax.Array,  # [B, nH, dh] bf16 (nH may exceed the cache's KV heads: GQA)
    k_all: jax.Array,  # [L, B, nKV, S, dh] int8 or bf16
    ks_all,  # [L, B, nKV, S] scales, or None for float caches
    v_all: jax.Array,
    vs_all,
    layer: jax.Array,  # scalar
    positions: jax.Array,  # [B] — newest-token slot per row (inclusive mask)
    sm_scale: float,
    hb: int = 40,  # KV heads per grid block (largest divisor of nKV is taken)
    bs: int = 256,  # sequence chunk (any S; ragged tail masked)
    interpret: bool = False,  # CPU emulation for tests
) -> jax.Array:
    B, nH, dh = q.shape
    has_scale = ks_all is not None
    # packed int4 slabs carry S/2 position-pair bytes; the scale slab always
    # has the UNPACKED length, which defines the grid and mask arithmetic
    L, B2, nKV, Sk, dh2 = k_all.shape
    S = ks_all.shape[3] if has_scale else Sk
    k_packed = has_scale and 2 * Sk == S
    v_packed = has_scale and 2 * v_all.shape[3] == S
    assert (B, dh) == (B2, dh2) and nH % nKV == 0
    g = nH // nKV  # query heads per KV head (GQA; 1 = plain MHA)
    q = q.reshape(B, nKV, g, dh)
    hb = next(d for d in range(min(hb, nKV), 0, -1) if nKV % d == 0)
    # VMEM guard: K+V (+scales) blocks, double-buffered, must fit ~16MB
    kv_bytes = (2 - k_packed * 0.5 - v_packed * 0.5) * k_all.dtype.itemsize
    while hb * bs * (dh * kv_bytes + 4) * 2 > 12 * 1024 * 1024:
        bs //= 2
    bs = min(bs, -(-S // 128) * 128)
    if k_packed or v_packed:
        bs = max(bs, 256)  # bs//2 must stay a sublane multiple of 128
    n_s = -(-S // bs)  # ceil: tail chunk rows are masked by the pos bound
    scalars = jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), positions.astype(jnp.int32)]
    )
    # Chunks wholly past this row's newest token carry no valid data: clamp
    # their block index to the last valid chunk. Consecutive grid steps then
    # map to the SAME block and the Pallas pipeline skips the re-fetch, so the
    # kernel streams only ceil(pos/bs) chunks of cache while the XLA path
    # always reads the full allocation — the length-proportional read the
    # reference gets from its per-timestep loop (decoder_masked_multihead_
    # attention_template.hpp, ti < tlength loop).
    def _s_clamp(b, s, sr):
        return jnp.minimum(s, sr[1 + b] // bs)

    def kv_spec(packed):
        rows = bs // 2 if packed else bs
        return pl.BlockSpec(
            (1, 1, hb, rows, dh),
            lambda b, h, s, sr: (sr[0], b, h, _s_clamp(b, s, sr), 0),
        )

    sc_spec = pl.BlockSpec(
        (1, 1, hb, bs), lambda b, h, s, sr: (sr[0], b, h, _s_clamp(b, s, sr))
    )
    in_specs = [
        pl.BlockSpec((1, hb, g, dh), lambda b, h, s, sr: (b, h, 0, 0)),
        kv_spec(k_packed),
    ]
    operands = [q, k_all]
    if has_scale:
        in_specs += [sc_spec, kv_spec(v_packed), sc_spec]
        operands += [ks_all, v_all, vs_all]
    else:
        in_specs += [kv_spec(False)]
        operands += [v_all]
    R = hb * g
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nKV // hb, n_s),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, hb, g, dh), lambda b, h, s, sr: (b, h, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),  # running max (col 0)
            pltpu.VMEM((R, 128), jnp.float32),  # running denom (col 0)
            pltpu.VMEM((R, dh), jnp.float32),  # running numerators
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, sm_scale=sm_scale, bs=bs, n_s=n_s, hb=hb, g=g,
            has_scale=has_scale, k_packed=k_packed, v_packed=v_packed,
            # interpret mode runs the dots on CPU, whose thunks reject bf16
            compute_dtype=jnp.float32 if interpret else jnp.bfloat16,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nKV, g, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nH * S * dh,
            bytes_accessed=2 * B * nKV * S * dh * k_all.dtype.itemsize,
            transcendentals=B * nH * S,
        ),
        interpret=interpret,
    )(scalars, *operands)
    return out.reshape(B, nH, dh)
