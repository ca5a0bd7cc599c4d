"""Reference-format ``.bin`` checkpoint directory -> engine parameter pytree.

Reads the directory layout the reference loads per-rank
(/root/reference/examples/pytorch/codefuse/codefuse_example.py:336-419):
``model.layers.{i}.<name>[.rank].bin`` raw tensors + ``config.ini``, including
the pre-quantized INT8 variant (``.q.bin`` int8 payload + ``.s.bin`` scales,
written by quant_and_save.py). TP-rank-split files are concatenated back to
full tensors — sharding happens later via GSPMD placement, not at load time —
and the reference's divided-by-TP shared biases are multiplied back.

INT8 note: the reference's ``.q.bin`` files are CUTLASS-preprocessed
(interleaved/permuted for tensor-core LDSM, WeightOnlyQuantOps.cc:235-313).
Pass ``q_layout="cutlass"`` to undo that preprocessing at load time
(``ckpt.cutlass_interop``); the default ``q_layout="plain"`` reads the plain
row-major int8 layout that ``ckpt.quantize`` writes.
"""
from __future__ import annotations

import glob
import os
import re
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax.numpy as jnp
import numpy as np


def _ft_qkv_to_engine(w: np.ndarray, nH: int) -> np.ndarray:
    """FT on-disk fused-QKV ordering [..., 3, nH*dh] -> engine/HF ordering
    [..., nH*3*dh] with (head, qkv, dh) flat layout."""
    lead = w.shape[:-2]
    dh = w.shape[-1] // nH
    w = w.reshape(*lead, 3, nH, dh)
    order = tuple(range(len(lead))) + (len(lead) + 1, len(lead), len(lead) + 2)
    return np.transpose(w, order).reshape(*lead, 3 * nH * dh)

from ..core.config import GptNeoXConfig
from ..core.dtypes import jnp_dtype
from ..models.params import QuantizedTensor


def _rank_files(ckpt: str, base: str) -> list:
    # only plain rank files: "<base>.<rank>.bin" (exclude .q.bin/.s.bin)
    cands = [
        p
        for p in glob.glob(os.path.join(ckpt, base + ".*.bin"))
        if re.search(r"\.(\d+)\.bin$", p)
    ]
    files = sorted(cands, key=lambda p: int(re.search(r"\.(\d+)\.bin$", p).group(1)))
    if not files:
        raise FileNotFoundError(f"no files matching {base}.*.bin in {ckpt}")
    return files


def detect_tp_size(ckpt: str) -> int:
    return len(_rank_files(ckpt, "model.layers.0.attention.query_key_value.bias"))


def _bulk_read_dir(ckpt_path: str, num_threads: int):
    """Prefetch every .bin in the dir into host memory in one native call
    (C++ thread-pool preads — the analog of the reference's load-speed
    optimizations, README.md:36) with a Python thread-pool fallback."""
    from .. import native

    paths = sorted(glob.glob(os.path.join(ckpt_path, "*.bin")))
    sizes = [os.path.getsize(p) for p in paths]
    bufs = [np.empty(s, np.uint8) for s in sizes]
    if native.available():
        native.read_files(paths, bufs, threads=num_threads)
    else:
        pool = ThreadPoolExecutor(num_threads)

        def rd(i):
            with open(paths[i], "rb") as f:
                f.readinto(memoryview(bufs[i]))

        list(pool.map(rd, range(len(paths))))
        pool.shutdown()
    return dict(zip(paths, bufs))


def load_bin_checkpoint(
    ckpt_path: str,
    config: Optional[GptNeoXConfig] = None,
    dtype="fp32",
    int8_mode: int = 0,
    weight_bits: int = 8,
    group_size: int = 0,
    num_threads: int = 16,
    q_layout: str = "plain",
    quantize_embeddings: Optional[bool] = None,
) -> tuple:
    """Load a reference-format checkpoint dir. Returns (config, params).

    ``quantize_embeddings`` also quantizes the embedding table + LM head
    (engine extension beyond the reference; needed to fit 13B on one 16GB
    chip). ``int8_mode=2`` is a deprecated back-compat alias for it — the
    reference reserves mode 2 for SmoothQuant full-int8 (SURVEY §2.2), which
    its gptneox path does not support either."""
    if quantize_embeddings is None:
        quantize_embeddings = int8_mode >= 2
    if config is None:
        config = GptNeoXConfig.from_ini(ckpt_path)
    dtype = jnp_dtype(dtype)
    wdt = np.float16 if config.weight_data_type == "fp16" else np.float32
    L, H, nH, dh, I, V = (
        config.layer_num,
        config.hidden_size,
        config.head_num,
        config.size_per_head,
        config.inter_size,
        config.vocab_size,
    )
    tp = detect_tp_size(ckpt_path)
    pool = ThreadPoolExecutor(num_threads)
    blobs = _bulk_read_dir(ckpt_path, num_threads)

    def _view(path, dt):
        return np.frombuffer(blobs[path], dtype=dt)

    def read(name, shape=None, dt=wdt):
        arr = _view(os.path.join(ckpt_path, name), dt)
        return arr.reshape(shape) if shape is not None else arr

    def read_split(base, rank_shape, axis, dt=wdt):
        parts = [
            _view(p, dt).reshape(rank_shape) for p in _rank_files(ckpt_path, base)
        ]
        return np.concatenate(parts, axis=axis)

    def stack(fn):
        return jnp.asarray(np.stack(list(pool.map(fn, range(L)))), dtype)

    lh = nH * dh // tp  # local hidden per rank
    li = I // tp

    layers = {
        "ln1_w": stack(lambda i: read(f"model.layers.{i}.input_layernorm.weight.bin", (H,))),
        "ln1_b": stack(lambda i: read(f"model.layers.{i}.input_layernorm.bias.bin", (H,))),
        "qkv_b": stack(
            lambda i: _ft_qkv_to_engine(
                read_split(
                    f"model.layers.{i}.attention.query_key_value.bias", (3, lh), axis=-1
                ),
                nH,
            )
        ),
        "ln2_w": stack(lambda i: read(f"model.layers.{i}.post_attention_layernorm.weight.bin", (H,))),
        "ln2_b": stack(lambda i: read(f"model.layers.{i}.post_attention_layernorm.bias.bin", (H,))),
        "up_b": stack(
            lambda i: read_split(f"model.layers.{i}.mlp.dense_h_to_4h.bias", (li,), axis=-1)
        ),
    }
    if config.use_gptj_residual:
        # reference stores (attn.b + down.b)/tp; restore the full sum
        layers["down_b"] = stack(
            lambda i: read(f"model.layers.{i}.mlp.attention.bias.sum.bin", (H,)) * tp
        )
    else:
        layers["down_b"] = stack(
            lambda i: read(f"model.layers.{i}.mlp.dense_4h_to_h.bias.bin", (H,)) * tp
        )
        layers["proj_b"] = stack(
            lambda i: read(f"model.layers.{i}.attention.dense.bias.bin", (H,)) * tp
        )

    # Quantize-on-load fallback: when the dir has no pre-quantized payloads
    # (.q4.bin / .q.bin), load the fp kernels and quantize in memory — the
    # analog of the reference's non-pre-quantized int8 path (GptNeoXOp.h
    # quantizes at load when use_int8_weights without .q files). Also the
    # TP>1 int4 path (rank-merge happens in fp, then one whole-tensor quant).
    quantize_on_load = False
    if int8_mode >= 1:
        suffix = "*.q4.bin" if weight_bits == 4 else "*.q.bin"
        if not glob.glob(os.path.join(ckpt_path, suffix)):
            quantize_on_load = True

    if int8_mode >= 1 and weight_bits == 4 and not quantize_on_load:
        # int4 disk format (.q4.bin nibble-packed + .s4[gN].bin scales):
        # TP=1 only for direct load; re-quantize-merge for TP>1 would go
        # through the fp files instead
        assert tp == 1, "int4 .bin loading supports tp=1 dirs; merge via fp files"
        from ..models.params import QuantizedTensor

        ssuffix = f"s4g{group_size}" if group_size else "s4"

        def load_q4(base_fmt, kdim, final_shape, final_s_shape, reorder=None):
            qs, ss = [], []
            for i in range(L):
                base = base_fmt.format(i)
                q = _view(os.path.join(ckpt_path, base + ".0.q4.bin"), np.int8)
                sc = _view(os.path.join(ckpt_path, base + f".0.{ssuffix}.bin"), wdt)
                q = q.reshape(kdim // 2, -1)
                if reorder is not None:
                    # FT's fused-QKV column order -> engine order; the column
                    # permutation commutes with the K-axis nibble packing
                    q = reorder(q.reshape(kdim // 2, 3, -1))
                    sc = reorder(sc.reshape(final_s_shape[:-1] + (3, -1)))
                qs.append(q.reshape(kdim // 2, -1))
                ss.append(sc.reshape(final_s_shape))
            packed_shape = (final_shape[0] // 2,) + final_shape[1:]
            from .quantize import group_scale_dtype

            return QuantizedTensor(
                q=jnp.asarray(np.stack(qs)).reshape((L,) + packed_shape),
                # bf16 group scales (exact f32->bf16 roundtrip: quantize_array
                # rounded them to bf16 before they were written to disk)
                scale=jnp.asarray(np.stack(ss), group_scale_dtype(4, group_size)),
                k_axis=-2,
                bits=4,
                group_size=group_size,
            )

        def s_shape(K, N):
            return (K // group_size, N) if group_size else (N,)

        layers["qkv_w"] = load_q4(
            "model.layers.{}.attention.query_key_value.weight", H,
            (H, 3 * nH * dh), s_shape(H, 3 * nH * dh),
            reorder=lambda a: _ft_qkv_to_engine(a, nH),
        )
        layers["proj_w"] = load_q4(
            "model.layers.{}.attention.dense.weight", nH * dh,
            (nH * dh, H), s_shape(nH * dh, H),
        )
        layers["up_w"] = load_q4(
            "model.layers.{}.mlp.dense_h_to_4h.weight", H, (H, I), s_shape(H, I)
        )
        layers["down_w"] = load_q4(
            "model.layers.{}.mlp.dense_4h_to_h.weight", I, (I, H), s_shape(I, H)
        )
    elif int8_mode >= 1 and not quantize_on_load:
        from ..models.params import QuantizedTensor
        from .quantize import quantize_array

        def _q_rank_files(base, suffix):
            files = sorted(
                glob.glob(os.path.join(ckpt_path, f"{base}.*.{suffix}.bin")),
                key=lambda p: int(re.search(rf"\.(\d+)\.{suffix}\.bin$", p).group(1)),
            )
            if not files:
                raise FileNotFoundError(f"no {base}.*.{suffix}.bin in {ckpt_path}")
            return files

        def load_quant(base_fmt, rank_q_shape, rank_s_shape, axis, s_axis, k_axis, final_shape, final_s_shape, reorder=None):
            """Load .q.bin/.s.bin per layer. For TP=1 the payload is used
            directly; for TP>1 row-split (axis-0) kernels each rank has its own
            per-output scales, so ranks are dequantized and requantized whole
            (the reference instead keeps per-rank scales on per-rank GPUs)."""
            qs, ss = [], []
            def _rank_q(p):
                flat = _view(p, np.int8)
                if q_layout == "cutlass":
                    # reference payloads are CUTLASS-preprocessed per rank
                    # matrix [rows, prod(cols)]; undo to row-major int8
                    from .cutlass_interop import unpreprocess_weights

                    rows = rank_q_shape[0]
                    flat = unpreprocess_weights(flat, rows, flat.size // rows)
                return flat.reshape(rank_q_shape)

            for i in range(L):
                base = base_fmt.format(i)
                qparts = [_rank_q(p) for p in _q_rank_files(base, "q")]
                sparts = [
                    _view(p, wdt).reshape(rank_s_shape)
                    for p in _q_rank_files(base, "s")
                ]
                if tp == 1 or axis != 0:
                    q = np.concatenate(qparts, axis=axis)
                    s = np.concatenate(sparts, axis=s_axis)
                    if reorder is not None:
                        q, s = reorder(q), reorder(s)
                    q = q.reshape(final_shape)
                    s = s.reshape(final_s_shape)
                else:
                    deq = np.concatenate(
                        [
                            qp.astype(np.float32) * sp[None, :].astype(np.float32)
                            for qp, sp in zip(qparts, sparts)
                        ],
                        axis=0,
                    )
                    qt = quantize_array(jnp.asarray(deq.reshape(final_shape)), k_axis)
                    q, s = np.asarray(qt.q), np.asarray(qt.scale)
                qs.append(q)
                ss.append(s)
            return QuantizedTensor(
                q=jnp.asarray(np.stack(qs)),
                scale=jnp.asarray(np.stack(ss), jnp.float32),
                k_axis=k_axis,
            )

        layers["qkv_w"] = load_quant(
            "model.layers.{}.attention.query_key_value.weight",
            (H, 3, lh), (3, lh), axis=-1, s_axis=-1, k_axis=-2,
            final_shape=(H, 3 * nH * dh), final_s_shape=(3 * nH * dh,),
            reorder=lambda a: _ft_qkv_to_engine(a, nH),
        )
        layers["proj_w"] = load_quant(
            "model.layers.{}.attention.dense.weight",
            (lh, H), (H,), axis=0, s_axis=None, k_axis=-2,
            final_shape=(nH * dh, H), final_s_shape=(H,),
        )
        layers["up_w"] = load_quant(
            "model.layers.{}.mlp.dense_h_to_4h.weight",
            (H, li), (li,), axis=-1, s_axis=-1, k_axis=-2,
            final_shape=(H, I), final_s_shape=(I,),
        )
        layers["down_w"] = load_quant(
            "model.layers.{}.mlp.dense_4h_to_h.weight",
            (li, H), (H,), axis=0, s_axis=None, k_axis=-2,
            final_shape=(I, H), final_s_shape=(H,),
        )
    else:
        layers["qkv_w"] = stack(
            lambda i: _ft_qkv_to_engine(
                read_split(
                    f"model.layers.{i}.attention.query_key_value.weight",
                    (H, 3, lh),
                    axis=-1,
                ),
                nH,
            )
        )
        layers["proj_w"] = stack(
            lambda i: read_split(
                f"model.layers.{i}.attention.dense.weight", (lh, H), axis=0
            )
        )
        layers["up_w"] = stack(
            lambda i: read_split(
                f"model.layers.{i}.mlp.dense_h_to_4h.weight", (H, li), axis=-1
            )
        )
        layers["down_w"] = stack(
            lambda i: read_split(
                f"model.layers.{i}.mlp.dense_4h_to_h.weight", (li, H), axis=0
            )
        )

    params = {
        "embed": jnp.asarray(read("model.wte.bin", (V, H)), dtype),
        "layers": layers,
        "final_ln_w": jnp.asarray(read("model.final_layernorm.weight.bin", (H,)), dtype),
        "final_ln_b": jnp.asarray(read("model.final_layernorm.bias.bin", (H,)), dtype),
        "lm_head": jnp.asarray(read("model.lm_head.weight.bin", (V, H)), dtype),
    }
    pool.shutdown()
    if int8_mode >= 1 and (quantize_on_load or quantize_embeddings):
        # quantize_on_load: fp kernels -> QuantizedTensors in memory (already-
        # quantized layer weights are skipped). quantize_embeddings (engine
        # extension beyond the reference, documented in STATUS.md):
        # embeddings + LM head int8 too (int4 transposed head when
        # weight_bits=4) — the single-16GB-chip configuration for 13B.
        from .quantize import quantize_params

        params = quantize_params(
            params, include_embeddings=quantize_embeddings,
            weight_bits=weight_bits, group_size=group_size,
        )
    return config, params
