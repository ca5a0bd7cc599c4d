"""CUTLASS preprocessed-weight interop: forward spec pinned to the reference's
hand-computed vectors (tests/weight_only_quant_ops/th_weight_quant_ops_unit_tests.py)
and inverse validated by round trip + loading a reference-layout ``.q.bin``."""
import numpy as np
import pytest

from fastertransformer4codefuse_tpu.ckpt.cutlass_interop import (
    PERM16,
    PERM32,
    add_bias_and_interleave,
    pack_int4,
    permute_b_rows,
    preprocess_weights_for_mixed_gemm,
    un_bias_and_interleave,
    unpack_int4,
    unpreprocess_weights,
)


def test_unpack_int4_reference_vector():
    # th_weight_quant_ops_unit_tests.py:151-156
    packed = np.array([-104, -70, -36, -2, 16, 50, 84, 118], dtype=np.int8)
    np.testing.assert_array_equal(unpack_int4(packed), np.arange(-8, 8, dtype=np.int8))
    np.testing.assert_array_equal(pack_int4(np.arange(-8, 8, dtype=np.int8)), packed)


def test_add_bias_interleave_int8_reference_vector():
    # th_weight_quant_ops_unit_tests.py:110-116
    x = np.array([-104, -70, -36, 127, 16, 50, 84, 118], dtype=np.int8)
    expect = (np.array([-104, -36, -70, 127, 16, 84, 50, 118], np.int32) + 128).astype(np.uint8)
    got = add_bias_and_interleave(x, bits=8)
    np.testing.assert_array_equal(got, expect)
    np.testing.assert_array_equal(un_bias_and_interleave(got, bits=8), x)


def test_add_bias_interleave_int4_reference_vector():
    # th_weight_quant_ops_unit_tests.py:102-108 (packed form)
    packed = np.array([-104, -70, -36, -2, 16, 50, 84, 118], dtype=np.int8)
    expect_packed = np.array([32, 100, 49, 117, -88, -20, -71, -3], dtype=np.int8)
    got = pack_int4(add_bias_and_interleave(unpack_int4(packed), bits=4).view(np.int8))
    np.testing.assert_array_equal(got, expect_packed)


@pytest.mark.parametrize("bits,tile", [(8, 16), (4, 32)])
def test_permute_rows_matches_reference_map(bits, tile):
    # reference_interleave (th_weight_quant_ops_unit_tests.py:31-47) is an
    # index-select by the map; the C loop formula must agree
    rng = np.random.RandomState(0)
    w = rng.randint(-8, 8, size=(tile * 4, 24)).astype(np.int8)
    perm = PERM16 if bits == 8 else PERM32
    expect = w.reshape(-1, tile, 24)[:, perm, :].reshape(w.shape)
    np.testing.assert_array_equal(permute_b_rows(w, bits), expect)
    np.testing.assert_array_equal(
        permute_b_rows(permute_b_rows(w, bits), bits, inverse=True), w
    )


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("K,N", [(64, 32), (128, 48), (256, 128)])
def test_preprocess_round_trip(bits, K, N):
    rng = np.random.RandomState(1)
    lo, hi = (-128, 128) if bits == 8 else (-8, 8)
    w = rng.randint(lo, hi, size=(K, N)).astype(np.int8)
    raw = preprocess_weights_for_mixed_gemm(w, bits=bits)
    assert raw.dtype == np.int8 and raw.size == K * N * bits // 8
    back = unpreprocess_weights(raw, K, N, bits=bits)
    np.testing.assert_array_equal(back, w)
    # processed layout must actually differ from row-major (not a no-op)
    if bits == 8:
        assert not np.array_equal(raw.reshape(K, N), w)


@pytest.mark.parametrize("tp", [1, 2])
def test_load_reference_preprocessed_q_bin(tmp_path, tp):
    """Write .q.bin exactly as the reference's quant_and_save.py does
    (symmetric per-column quantize + CUTLASS preprocess per rank file), then
    load with q_layout='cutlass' and check dequant matches the fp weights to
    int8 rounding."""
    torch = pytest.importorskip("torch")
    import glob
    import os

    import jax.numpy as jnp

    from fastertransformer4codefuse_tpu.ckpt.convert import convert_hf_to_bin
    from fastertransformer4codefuse_tpu.ckpt.loader import load_bin_checkpoint
    from fastertransformer4codefuse_tpu.ckpt.quantize import quantize_array
    from fastertransformer4codefuse_tpu.models.params import QuantizedTensor
    import transformers

    # dims chosen so every TP-rank matrix satisfies the CUTLASS tile
    # constraints (K % 64 == 0) that the reference preprocessor also enforces
    torch.manual_seed(0)
    hf = transformers.GPTNeoXForCausalLM(
        transformers.GPTNeoXConfig(
            vocab_size=96, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=512, rotary_pct=0.25,
            max_position_embeddings=128, use_parallel_residual=True,
            bos_token_id=0, eos_token_id=95, hidden_act="gelu",
        )
    ).eval()
    ckpt = str(tmp_path / f"{tp}-gpu")
    convert_hf_to_bin(hf, ckpt, infer_tp=tp, weight_data_type="fp32")
    H = hf.config.hidden_size

    # reference quantizer: per rank file, shape [K, N_local] (quant_and_save.py:86-99)
    for path in sorted(glob.glob(os.path.join(ckpt, "model.layers.*.weight.*.bin"))):
        name = os.path.basename(path)
        if ".q.bin" in name or ".s.bin" in name or "layernorm" in name:
            continue
        flat = np.fromfile(path, dtype=np.float32)
        if "query_key_value" in name or "h_to_4h" in name:
            k_dim = H
        else:
            k_dim = flat.size // H
        w = flat.reshape(k_dim, -1)
        qt = quantize_array(jnp.asarray(w), k_axis=-2)
        q = np.asarray(qt.q)
        s = np.asarray(qt.scale).astype(np.float32)
        processed = preprocess_weights_for_mixed_gemm(q, bits=8)
        processed.tofile(path[:-4] + ".q.bin")
        s.tofile(path[:-4] + ".s.bin")

    cfg, params = load_bin_checkpoint(
        ckpt, dtype="fp32", int8_mode=1, q_layout="cutlass"
    )
    _, params_fp = load_bin_checkpoint(ckpt, dtype="fp32")
    for k in ("qkv_w", "proj_w", "up_w", "down_w"):
        qt = params["layers"][k]
        assert isinstance(qt, QuantizedTensor)
        deq = np.asarray(qt.dequantize(jnp.float32))
        fp = np.asarray(params_fp["layers"][k], np.float32)
        err = np.abs(deq - fp)
        # int8 rounding: scale/2 per output channel; TP>1 row-split kernels
        # are dequant-merged + requantized (one extra rounding), so allow 1x
        bound = np.asarray(qt.scale, np.float32)[:, None, :] + 1e-6
        assert (err <= bound).all(), k
