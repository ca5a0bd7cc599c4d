"""ViT family parity vs HuggingFace — the first non-text family (patch
embeddings, pre-LN blocks). Reference: models/vit + models/vit_int8 +
tensorrt_plugin/vit."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from fastertransformer4codefuse_tpu.models.vit import (
    config_from_hf_vit,
    encode,
    params_from_hf_vit_state_dict,
    patchify,
)


def make_hf(seed=0, **kw):
    torch.manual_seed(seed)
    base = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=16, patch_size=4, num_channels=3,
    )
    base.update(kw)
    return transformers.ViTModel(transformers.ViTConfig(**base)).eval()


def test_vit_parity():
    hf = make_hf(seed=0)
    cfg = config_from_hf_vit(hf.config)
    params = params_from_hf_vit_state_dict(cfg, hf.state_dict())
    rng = np.random.RandomState(1)
    px = rng.randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(px))
    got_h, got_p = encode(cfg, params, jnp.asarray(px))
    np.testing.assert_allclose(
        np.asarray(got_h), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_p), out.pooler_output.numpy(), rtol=2e-4, atol=2e-5
    )


def test_vit_patchify_matches_conv():
    """The reshape+GEMM patch embedding must equal HF's stride-P conv."""
    hf = make_hf(seed=2)
    cfg = config_from_hf_vit(hf.config)
    params = params_from_hf_vit_state_dict(cfg, hf.state_dict())
    rng = np.random.RandomState(3)
    px = rng.randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = hf.embeddings.patch_embeddings(torch.tensor(px)).numpy()
    from fastertransformer4codefuse_tpu.ops.linear import linear

    got = linear(
        patchify(cfg, jnp.asarray(px)), params["patch_w"], params["patch_b"]
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-6)


def test_vit_registry():
    from fastertransformer4codefuse_tpu.models import registry

    fam = registry.get("vit")
    hf = make_hf(seed=0)
    cfg = fam.config_from_hf(hf.config)
    params = fam.params_from_hf(cfg, hf.state_dict())
    rng = np.random.RandomState(0)
    px = rng.randn(1, 3, 16, 16).astype(np.float32)
    h, p = fam.encode(cfg, params, jnp.asarray(px))
    assert h.shape == (1, 17, 32) and p.shape == (1, 32)
