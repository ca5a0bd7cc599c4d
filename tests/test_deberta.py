"""DeBERTa-v2 family parity vs HuggingFace — disentangled attention
(content→content + content→position + position→content under one
sqrt(3·dh) scale, log-bucketed relative embeddings).

Reference: /root/reference/src/fastertransformer/models/deberta/ +
kernels/disentangled_attention_kernels.cu. The second new attention pattern
through the kernel seam (after Longformer's sliding window).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from fastertransformer4codefuse_tpu.models.deberta import (
    config_from_hf_deberta,
    encode,
    params_from_hf_deberta_state_dict,
)


def make_hf(seed=0, **kw):
    torch.manual_seed(seed)
    base = dict(
        vocab_size=96,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        type_vocab_size=0,
        relative_attention=True,
        pos_att_type=["c2p", "p2c"],
        position_buckets=8,
        norm_rel_ebd="layer_norm",
    )
    base.update(kw)
    cfg = transformers.DebertaV2Config(**base)
    return transformers.DebertaV2Model(cfg).eval()


def run_both(hf, ids, lens):
    cfg = config_from_hf_deberta(hf.config)
    params = params_from_hf_deberta_state_dict(cfg, hf.state_dict())
    B, S = ids.shape
    am = np.zeros((B, S), np.int64)
    for b in range(B):
        am[b, : lens[b]] = 1
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(am),
        ).last_hidden_state.numpy()
    got, _ = encode(cfg, params, jnp.asarray(ids), jnp.asarray(lens))
    return np.asarray(got), want


def _check(got, want, lens):
    for b in range(got.shape[0]):
        np.testing.assert_allclose(
            got[b, : lens[b]], want[b, : lens[b]], rtol=2e-4, atol=2e-5
        )


def test_deberta_v2_parity_log_buckets():
    """v2 lineage: dedicated pos projections, log buckets, rel-embedding LN,
    ragged padding."""
    hf = make_hf(seed=0)
    rng = np.random.RandomState(1)
    ids = rng.randint(2, 96, size=(2, 20)).astype(np.int64)
    lens = np.array([20, 13], np.int32)
    got, want = run_both(hf, ids, lens)
    _check(got, want, lens)


def test_deberta_v3_style_shared_attention_key():
    """v3 lineage: share_att_key=True reuses the content q/k projections for
    the position embeddings; position_biased_input=False drops absolute
    positions."""
    hf = make_hf(seed=2, share_att_key=True, position_biased_input=False)
    rng = np.random.RandomState(3)
    ids = rng.randint(2, 96, size=(2, 16)).astype(np.int64)
    lens = np.array([16, 9], np.int32)
    got, want = run_both(hf, ids, lens)
    _check(got, want, lens)


def test_deberta_linear_rel_positions():
    """position_buckets unset -> raw (unbucketed) relative positions capped
    at max_relative_positions."""
    hf = make_hf(seed=4, position_buckets=-1, max_relative_positions=16)
    rng = np.random.RandomState(5)
    ids = rng.randint(2, 96, size=(1, 14)).astype(np.int64)
    lens = np.array([14], np.int32)
    got, want = run_both(hf, ids, lens)
    _check(got, want, lens)


def test_deberta_c2p_only():
    hf = make_hf(seed=6, pos_att_type=["c2p"])
    rng = np.random.RandomState(7)
    ids = rng.randint(2, 96, size=(1, 12)).astype(np.int64)
    lens = np.array([12], np.int32)
    got, want = run_both(hf, ids, lens)
    _check(got, want, lens)


def test_deberta_registry():
    from fastertransformer4codefuse_tpu.models import registry

    fam = registry.get("deberta")
    hf = make_hf(seed=0)
    cfg = fam.config_from_hf(hf.config)
    params = fam.params_from_hf(cfg, hf.state_dict())
    rng = np.random.RandomState(0)
    ids = rng.randint(2, 96, size=(1, 10)).astype(np.int32)
    h, _ = fam.encode(cfg, params, jnp.asarray(ids), jnp.asarray([10]))
    assert h.shape == (1, 10, 32)
