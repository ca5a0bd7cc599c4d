"""Conformer (wenet-class) family parity vs HF Wav2Vec2ConformerModel —
macaron half-FFNs + Transformer-XL relative attention + the conv module,
from raw waveform through the strided feature extractor. Reference:
/root/reference/src/fastertransformer/models/wenet/ + wenet kernels."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from fastertransformer4codefuse_tpu.models.conformer import (
    config_from_hf_conformer,
    encode,
    params_from_hf_conformer_state_dict,
)


def make_hf(seed=0, **kw):
    torch.manual_seed(seed)
    base = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16, 16], conv_stride=[2, 2],
        conv_kernel=[3, 3], num_feat_extract_layers=2,
        conv_depthwise_kernel_size=7,
        position_embeddings_type="relative",
        apply_spec_augment=False,
    )
    base.update(kw)
    return transformers.Wav2Vec2ConformerModel(
        transformers.Wav2Vec2ConformerConfig(**base)
    ).eval()


def test_conformer_parity_waveform_to_hidden():
    hf = make_hf(seed=0)
    cfg = config_from_hf_conformer(hf.config)
    params = params_from_hf_conformer_state_dict(cfg, hf.state_dict())
    rng = np.random.RandomState(1)
    audio = rng.randn(2, 64).astype(np.float32)
    with torch.no_grad():
        want = hf(input_values=torch.tensor(audio)).last_hidden_state.numpy()
    got, _ = encode(cfg, params, jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-5)


def test_conformer_parity_swish():
    """WeNet's own activation (swish) + a longer window."""
    hf = make_hf(seed=2, hidden_act="swish", feat_extract_activation="gelu")
    cfg = config_from_hf_conformer(hf.config)
    params = params_from_hf_conformer_state_dict(cfg, hf.state_dict())
    rng = np.random.RandomState(3)
    audio = rng.randn(1, 128).astype(np.float32)
    with torch.no_grad():
        want = hf(input_values=torch.tensor(audio)).last_hidden_state.numpy()
    got, _ = encode(cfg, params, jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-5)


def test_conformer_registry():
    from fastertransformer4codefuse_tpu.models import registry

    fam = registry.get("conformer")
    hf = make_hf(seed=0)
    cfg = fam.config_from_hf(hf.config)
    params = fam.params_from_hf(cfg, hf.state_dict())
    rng = np.random.RandomState(0)
    audio = rng.randn(1, 64).astype(np.float32)
    h, _ = fam.encode(cfg, params, jnp.asarray(audio))
    assert h.shape[0] == 1 and h.shape[2] == 32
