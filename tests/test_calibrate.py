"""AWQ-style calibration tests: stat collection, fp-exact folding, and the
quality win on outlier-channel activations (the scenario AWQ exists for)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.ckpt.calibrate import (
    apply_awq_scaling,
    awq_search_scales,
    collect_activation_stats,
)
from fastertransformer4codefuse_tpu.ckpt.quantize import quantize_params
from fastertransformer4codefuse_tpu.models import gptneox as model


@pytest.fixture(scope="module")
def setup():
    cfg = GptNeoXConfig.tiny(vocab_size=96)
    params = init_params(cfg, dtype="fp32")
    batches = [[[3, 4, 5, 9, 11], [7, 8, 20]], [[31, 9, 17, 2]]]
    stats = collect_activation_stats(cfg, params, batches)
    return cfg, params, batches, stats


def test_collect_stats_shapes(setup):
    cfg, params, batches, stats = setup
    H, I = cfg.hidden_size, cfg.inter_size
    assert stats["qkv"].shape == (cfg.layer_num, H)
    assert stats["proj"].shape == (cfg.layer_num, H)
    assert stats["up"].shape == (cfg.layer_num, H)
    assert stats["down"].shape == (cfg.layer_num, I)
    assert all((v > 0).any() for v in stats.values())


def test_collect_stats_matches_manual(setup):
    """The recorded qkv amax for layer 0 is the amax of ln1(embeddings)."""
    cfg, params, batches, stats = setup
    ids = jnp.asarray([batches[0][0]], jnp.int32)
    x = jnp.take(params["embed"], ids, axis=0)
    lw = params["layers"]["ln1_w"][0]
    lb = params["layers"]["ln1_b"][0]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    ln = (x - mu) / jnp.sqrt(var + cfg.layernorm_eps) * lw + lb
    manual = np.asarray(jnp.max(jnp.abs(ln), axis=(0, 1)))
    # stats are a running max over MORE data, so stats >= this batch's amax
    assert (stats["qkv"][0] >= manual - 1e-5).all()


def test_awq_fold_is_fp_exact(setup):
    """apply_awq_scaling must not change the fp forward at all (scales fold
    into the layernorm affine exactly)."""
    cfg, params, batches, stats = setup
    scaled = apply_awq_scaling(cfg, params, stats, weight_bits=4)
    eng_a = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))
    eng_b = GptNeoXEngine(cfg, scaled, RuntimeConfig(dtype="fp32", seq_bucket=8))
    ra = eng_a.generate(
        [[3, 4, 5, 9]], output_len=6, top_k=1, return_cum_log_probs=True
    )
    rb = eng_b.generate(
        [[3, 4, 5, 9]], output_len=6, top_k=1, return_cum_log_probs=True
    )
    assert np.asarray(ra.output_ids).tolist() == np.asarray(rb.output_ids).tolist()
    np.testing.assert_allclose(
        np.asarray(ra.cum_log_probs), np.asarray(rb.cum_log_probs), atol=2e-3
    )


def test_awq_beats_rtn_on_outlier_channels():
    """Synthetic AWQ motivation: a few input channels carry 50x-larger
    activations. Activation-weighted int4 reconstruction error must drop."""
    rng = np.random.default_rng(0)
    K, N = 256, 512
    w = rng.standard_normal((K, N)).astype(np.float32)
    amax = np.full((K,), 1.0, np.float32)
    outliers = rng.choice(K, size=8, replace=False)
    amax[outliers] = 50.0

    def weighted_err(s):
        qmax = 7
        ws = w * s[:, None]
        scale = np.abs(ws).max(axis=0, keepdims=True) / qmax
        deq = np.rint(ws / scale).clip(-8, 7) * scale / s[:, None]
        return float(np.sum(((deq - w) * amax[:, None]) ** 2))

    rtn = weighted_err(np.ones(K, np.float32))
    s = awq_search_scales(w, amax, weight_bits=4, group_size=0)
    awq = weighted_err(s)
    assert awq < 0.6 * rtn, (awq, rtn)
    assert (s[outliers] > 1.0).all()  # salient channels were protected


def test_awq_then_quantize_runs(setup):
    """Full flow: calibrate -> fold -> int4 quantize -> engine generates."""
    cfg, params, batches, stats = setup
    scaled = apply_awq_scaling(cfg, params, stats, weight_bits=4)
    q = quantize_params(scaled, weight_bits=4)
    eng = GptNeoXEngine(
        cfg, q, RuntimeConfig(dtype="fp32", int8_mode=1, seq_bucket=8)
    )
    out = eng.generate([[3, 4, 5]], output_len=4, top_k=1)
    assert int(out.sequence_lengths[0, 0]) >= 4
