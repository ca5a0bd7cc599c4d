"""Swin family parity vs HuggingFace — shifted-window 2D attention with
relative-position biases and patch-merging stages. Reference:
/root/reference/src/fastertransformer/models/swin/ + swin_int8 +
tensorrt_plugin/swin."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from fastertransformer4codefuse_tpu.models.swin import (
    config_from_hf_swin,
    encode,
    params_from_hf_swin_state_dict,
)


def make_hf(seed=0, **kw):
    torch.manual_seed(seed)
    base = dict(
        image_size=16, patch_size=2, num_channels=3, embed_dim=16,
        depths=[2, 2], num_heads=[2, 4], window_size=2, mlp_ratio=2.0,
    )
    base.update(kw)
    return transformers.SwinModel(transformers.SwinConfig(**base)).eval()


def run_both(hf, px):
    cfg = config_from_hf_swin(hf.config)
    params = params_from_hf_swin_state_dict(cfg, hf.state_dict())
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(px))
    got_h, got_p = encode(cfg, params, jnp.asarray(px))
    return (np.asarray(got_h), np.asarray(got_p),
            out.last_hidden_state.numpy(), out.pooler_output.numpy())


def test_swin_parity_shifted_windows():
    """2 stages with depth 2 each: the odd blocks run SHIFTED windows with
    the cyclic-wrap region mask; patch merging halves resolution between
    stages."""
    hf = make_hf(seed=0)
    rng = np.random.RandomState(1)
    px = rng.randn(2, 3, 16, 16).astype(np.float32)
    got_h, got_p, want_h, want_p = run_both(hf, px)
    np.testing.assert_allclose(got_h, want_h, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(got_p, want_p, rtol=3e-4, atol=3e-5)


def test_swin_parity_window4():
    """Window covering the whole final stage (shift disabled when the
    resolution <= window)."""
    hf = make_hf(seed=2, window_size=4, image_size=16)
    rng = np.random.RandomState(3)
    px = rng.randn(1, 3, 16, 16).astype(np.float32)
    got_h, got_p, want_h, want_p = run_both(hf, px)
    np.testing.assert_allclose(got_h, want_h, rtol=3e-4, atol=3e-5)


def test_swin_registry():
    from fastertransformer4codefuse_tpu.models import registry

    fam = registry.get("swin")
    hf = make_hf(seed=0)
    cfg = fam.config_from_hf(hf.config)
    params = fam.params_from_hf(cfg, hf.state_dict())
    rng = np.random.RandomState(0)
    px = rng.randn(1, 3, 16, 16).astype(np.float32)
    h, p = fam.encode(cfg, params, jnp.asarray(px))
    assert h.shape[0] == 1 and p.shape == (1, h.shape[-1])
