"""Batched-scatter cache writes (B > _SCATTER_MIN_B) must be byte-identical
to the small-B unrolled dynamic-update-slice path — both for per-token decode
writes and the batcher's chunked admission (incl. inactive-row preservation
via the out-of-bounds-drop trick)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastertransformer4codefuse_tpu.engine import kv_cache as kvc


def _mk_cache(rng, L, B, nH, S, dh, quant):
    if quant:
        return {
            "k": jnp.asarray(rng.integers(-90, 90, (L, B, nH, S, dh)), jnp.int8),
            "v": jnp.asarray(rng.integers(-90, 90, (L, B, nH, S, dh)), jnp.int8),
            "k_s": jnp.asarray(rng.uniform(0.01, 0.1, (L, B, nH, S)), jnp.bfloat16),
            "v_s": jnp.asarray(rng.uniform(0.01, 0.1, (L, B, nH, S)), jnp.bfloat16),
        }
    return {
        "k": jnp.asarray(rng.normal(size=(L, B, nH, S, dh)), jnp.float32),
        "v": jnp.asarray(rng.normal(size=(L, B, nH, S, dh)), jnp.float32),
    }


@pytest.mark.parametrize("quant", [False, True])
def test_write_decode_scatter_matches_unrolled(quant, monkeypatch):
    rng = np.random.default_rng(0)
    L, B, nH, S, dh = 2, 12, 2, 16, 8  # B=12 > _SCATTER_MIN_B
    cache = _mk_cache(rng, L, B, nH, S, dh, quant)
    k = jnp.asarray(rng.normal(size=(B, 1, nH, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, 1, nH, dh)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, S, B), jnp.int32)

    got = kvc.write_decode(dict(cache), jnp.int32(1), k, v, pos)
    monkeypatch.setattr(kvc, "_SCATTER_MIN_B", 1000)  # force unrolled
    want = kvc.write_decode(dict(cache), jnp.int32(1), k, v, pos)
    for key in cache:
        np.testing.assert_array_equal(np.asarray(got[key]), np.asarray(want[key]))


@pytest.mark.parametrize("quant", [False, True])
def test_write_chunk_scatter_matches_unrolled(quant, monkeypatch):
    rng = np.random.default_rng(1)
    L, B, nH, S, dh, C = 2, 12, 2, 24, 8, 4
    cache = _mk_cache(rng, L, B, nH, S, dh, quant)
    k = jnp.asarray(rng.normal(size=(B, C, nH, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, C, nH, dh)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, S - C + 1, B), jnp.int32)
    active = jnp.asarray(rng.integers(0, 2, B), jnp.bool_)  # mixed rows

    got = kvc.write_chunk(dict(cache), jnp.int32(0), k, v, pos, active)
    monkeypatch.setattr(kvc, "_SCATTER_MIN_B", 1000)
    want = kvc.write_chunk(dict(cache), jnp.int32(0), k, v, pos, active)
    for key in cache:
        np.testing.assert_array_equal(np.asarray(got[key]), np.asarray(want[key]))
    # inactive rows' bytes are bit-preserved
    for b in range(B):
        if not bool(active[b]):
            np.testing.assert_array_equal(
                np.asarray(got["k"][:, b]), np.asarray(cache["k"][:, b])
            )
