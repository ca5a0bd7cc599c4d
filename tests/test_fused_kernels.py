"""Interpret-mode coverage of the merged-pair decode kernels
(ops/quant_matmul_fused.py).

int8 only: the int4 path uses ``pltpu.bitcast(int4)`` whose nibble order is
backend-defined — interpret mode does NOT reproduce the v5e hardware order
(the same reason ops/quant_matmul_w4 has no CPU test), so int4 fused-vs-
unmerged parity is asserted on the chip by tools/tpu_smoke.py instead.

Covers: segment routing (x1 -> W1 columns, x2 -> W2 columns), stacked-layer
bias indexing, per-segment scales in the K-concatenated kernel, the fused
residual epilogue, and group-wise scales.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from fastertransformer4codefuse_tpu.ops.quant_matmul_fused import (
    fused_proj_down,
    fused_qkv_up,
    fused_up_proj_down,
)


def _mk(rng, shape, scale=0.02):
    return jnp.asarray(rng.random(shape) * scale, jnp.float32)


@pytest.mark.parametrize("G", [0, 128])
def test_fused_qkv_up_int8(G):
    rng = np.random.default_rng(0)
    M, K, N1, N2, L = 3, 512, 768, 1024, 2
    x1 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    p1 = jnp.asarray(rng.integers(-128, 128, (L, K, N1)), jnp.int8)
    p2 = jnp.asarray(rng.integers(-128, 128, (L, K, N2)), jnp.int8)
    s1 = _mk(rng, (L, N1) if not G else (L, K // G, N1))
    s2 = _mk(rng, (L, N2) if not G else (L, K // G, N2))
    b1 = jnp.asarray(rng.standard_normal((L, 1, N1)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((L, 1, N2)), jnp.float32)
    y = fused_qkv_up(
        x1, x2, p1, p2, s1, s2, b1, b2, jnp.int32(1), bits=8, G=G,
        bn=256, bk=256, interpret=True,
    )
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    w1, w2 = p1[1].astype(jnp.float32), p2[1].astype(jnp.float32)
    if G:
        r1 = sum(
            (x1f[:, g * G : (g + 1) * G] @ w1[g * G : (g + 1) * G]) * s1[1][g]
            for g in range(K // G)
        ) + b1[1, 0]
        r2 = sum(
            (x2f[:, g * G : (g + 1) * G] @ w2[g * G : (g + 1) * G]) * s2[1][g]
            for g in range(K // G)
        ) + b2[1, 0]
    else:
        r1 = (x1f @ w1) * s1[1] + b1[1, 0]
        r2 = (x2f @ w2) * s2[1] + b2[1, 0]
    ref = jnp.concatenate([r1, r2], axis=1).astype(jnp.bfloat16)
    err = float(
        jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32)))
        / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-6)
    )
    assert err < 5e-3, err


@pytest.mark.parametrize("G", [0, 128])
def test_fused_up_proj_down_int8(G):
    """Kernel C: up -> staged hidden -> proj -> down -> bias+residual, all in
    one call, equals the explicit three-GEMM parallel-residual composition."""
    rng = np.random.default_rng(2)
    M, H, F, L = 3, 512, 1024, 2
    x_up = jnp.asarray(rng.standard_normal((M, H)), jnp.bfloat16)
    x_proj = jnp.asarray(rng.standard_normal((M, H)), jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((M, H)), jnp.bfloat16)
    p_up = jnp.asarray(rng.integers(-128, 128, (L, H, F)), jnp.int8)
    p_proj = jnp.asarray(rng.integers(-128, 128, (L, H, H)), jnp.int8)
    p_down = jnp.asarray(rng.integers(-128, 128, (L, F, H)), jnp.int8)
    s_up = _mk(rng, (L, F) if not G else (L, H // G, F))
    s_proj = _mk(rng, (L, H) if not G else (L, H // G, H))
    s_down = _mk(rng, (L, H) if not G else (L, F // G, H))
    b_up = jnp.asarray(rng.standard_normal((L, 1, F)), jnp.float32)
    b_down = jnp.asarray(rng.standard_normal((L, 1, H)), jnp.float32)
    y = fused_up_proj_down(
        x_up, x_proj, res, p_up, p_proj, p_down, s_up, s_proj, s_down,
        b_up, b_down, jnp.int32(1), bits=8, G=G, act="gelu-tanh",
        bku=256, bkp=256, bkd=256, interpret=True,
    )

    def gemm(x, w, s, K):
        if G:
            return sum(
                (x[:, g * G : (g + 1) * G] @ w[g * G : (g + 1) * G]) * s[g]
                for g in range(K // G)
            )
        return (x @ w) * s

    import jax

    xu, xp = x_up.astype(jnp.float32), x_proj.astype(jnp.float32)
    h = jax.nn.gelu(
        gemm(xu, p_up[1].astype(jnp.float32), s_up[1], H) + b_up[1, 0],
        approximate=True,
    ).astype(jnp.bfloat16).astype(jnp.float32)
    r = gemm(xp, p_proj[1].astype(jnp.float32), s_proj[1], H)
    r = r + gemm(h, p_down[1].astype(jnp.float32), s_down[1], F)
    ref = (r + b_down[1, 0] + res.astype(jnp.float32)).astype(jnp.bfloat16)
    err = float(
        jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32)))
        / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-6)
    )
    assert err < 2e-2, err


@pytest.mark.parametrize("G", [0, 128])
def test_fused_proj_down_int8_with_residual(G):
    rng = np.random.default_rng(1)
    M, K1, K2, N, L = 3, 1024, 2048, 768, 2
    x1 = jnp.asarray(rng.standard_normal((M, K1)), jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal((M, K2)), jnp.bfloat16)
    p1 = jnp.asarray(rng.integers(-128, 128, (L, K1, N)), jnp.int8)
    p2 = jnp.asarray(rng.integers(-128, 128, (L, K2, N)), jnp.int8)
    s1 = _mk(rng, (L, N) if not G else (L, K1 // G, N))
    s2 = _mk(rng, (L, N) if not G else (L, K2 // G, N))
    b = jnp.asarray(rng.standard_normal((L, 1, N)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((M, N)), jnp.bfloat16)
    y = fused_proj_down(
        x1, x2, p1, p2, s1, s2, b, res, jnp.int32(0), bits=8, G=G,
        bn=256, bk=256, interpret=True,
    )
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    w1, w2 = p1[0].astype(jnp.float32), p2[0].astype(jnp.float32)
    if G:
        r = sum(
            (x1f[:, g * G : (g + 1) * G] @ w1[g * G : (g + 1) * G]) * s1[0][g]
            for g in range(K1 // G)
        ) + sum(
            (x2f[:, g * G : (g + 1) * G] @ w2[g * G : (g + 1) * G]) * s2[0][g]
            for g in range(K2 // G)
        )
    else:
        r = (x1f @ w1) * s1[0] + (x2f @ w2) * s2[0]
    ref = (r + b[0, 0] + res.astype(jnp.float32)).astype(jnp.bfloat16)
    err = float(
        jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32)))
        / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-6)
    )
    assert err < 5e-3, err
