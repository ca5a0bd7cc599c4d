"""XLNet family parity vs HuggingFace — Transformer-XL relative attention
(content + rel-shifted position + segment terms). Reference:
/root/reference/src/fastertransformer/models/xlnet/ + xlnet kernels."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from fastertransformer4codefuse_tpu.models.xlnet import (
    config_from_hf_xlnet,
    encode,
    params_from_hf_xlnet_state_dict,
)


def make_hf(seed=0, **kw):
    torch.manual_seed(seed)
    base = dict(
        vocab_size=96, d_model=32, n_layer=2, n_head=4, d_inner=64,
        ff_activation="gelu", untie_r=True,
    )
    base.update(kw)
    return transformers.XLNetModel(transformers.XLNetConfig(**base)).eval()


def run_both(hf, ids, lens, token_type=None):
    cfg = config_from_hf_xlnet(hf.config)
    params = params_from_hf_xlnet_state_dict(cfg, hf.state_dict())
    B, S = ids.shape
    am = (np.arange(S)[None, :] < lens[:, None]).astype(np.float32)
    kw = {}
    if token_type is not None:
        kw["token_type_ids"] = torch.tensor(token_type)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(am),
            use_mems=False,
            **kw,
        ).last_hidden_state.numpy()
    got, _ = encode(
        cfg, params, jnp.asarray(ids), jnp.asarray(lens),
        token_type_ids=None if token_type is None else jnp.asarray(token_type),
    )
    return np.asarray(got), want


def test_xlnet_parity():
    hf = make_hf(seed=0)
    rng = np.random.RandomState(1)
    ids = rng.randint(2, 96, size=(2, 12)).astype(np.int64)
    lens = np.array([12, 8], np.int32)
    got, want = run_both(hf, ids, lens)
    for b, n in enumerate(lens):
        np.testing.assert_allclose(got[b, :n], want[b, :n], rtol=3e-4, atol=3e-5)


def test_xlnet_segments_parity():
    """Two token-type segments exercise the r_s_bias/seg_embed term."""
    hf = make_hf(seed=2)
    rng = np.random.RandomState(3)
    ids = rng.randint(2, 96, size=(1, 10)).astype(np.int64)
    tt = np.array([[0, 0, 0, 0, 1, 1, 1, 1, 1, 1]], np.int64)
    lens = np.array([10], np.int32)
    got, want = run_both(hf, ids, lens, token_type=tt)
    np.testing.assert_allclose(got[0], want[0], rtol=3e-4, atol=3e-5)


def test_xlnet_registry():
    from fastertransformer4codefuse_tpu.models import registry

    fam = registry.get("xlnet")
    hf = make_hf(seed=0)
    cfg = fam.config_from_hf(hf.config)
    params = fam.params_from_hf(cfg, hf.state_dict())
    rng = np.random.RandomState(0)
    ids = rng.randint(2, 96, size=(1, 8)).astype(np.int32)
    h, _ = fam.encode(cfg, params, jnp.asarray(ids), jnp.asarray([8]))
    assert h.shape == (1, 8, 32)
