"""The reference's gemm_dequantize exactness trick, ported to the TPU stack:
with an IDENTITY activation matrix, the fused dequant-GEMM's output must equal
the dequantized weight EXACTLY (atol=0) — tests/gemm_dequantize/
th_gemm_dequantize.py:28-39 in the reference. Every int8 value is exactly
representable in bf16, I @ q is exact, and the f32 scale multiply is the
dequant formula itself, so any deviation is a kernel indexing/accumulation
bug, not rounding.

int8 only (interpret mode cannot reproduce the hardware int4 nibble order;
tools/tpu_smoke.py covers int4 on the chip).
"""
import numpy as np

import jax.numpy as jnp

from fastertransformer4codefuse_tpu.ops.quant_matmul import quant_matmul_pallas


def test_identity_activation_exact_dequant():
    rng = np.random.default_rng(0)
    K, N = 256, 384
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.random((N,)) * 0.05 + 0.001, jnp.float32)
    eye = jnp.eye(K, dtype=jnp.bfloat16)
    got = quant_matmul_pallas(
        eye, w, scale, out_dtype=jnp.float32, bm=128, bn=128, bk=128,
        interpret=True,
    )
    want = w.astype(jnp.float32) * scale[None, :]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_identity_activation_exact_dequant_xla():
    from fastertransformer4codefuse_tpu.models.params import QuantizedTensor
    from fastertransformer4codefuse_tpu.ops.linear import quantized_matmul_xla

    rng = np.random.default_rng(1)
    K, N = 128, 192
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.random((N,)) * 0.05 + 0.001, jnp.float32)
    qt = QuantizedTensor(q=w, scale=scale, k_axis=0)
    got = quantized_matmul_xla(jnp.eye(K, dtype=jnp.float32), qt)
    want = (w.astype(jnp.float32) * scale[None, :]).astype(got.dtype)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
