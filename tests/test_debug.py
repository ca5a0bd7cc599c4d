"""Debug/verification mode (FT_DEBUG_LEVEL analog, utils/debug.py): a seeded
NaN in the weights must be caught with a layer-attributed error before any
tokens are produced — the parity target is the reference's forced-sync
checking (utils/cuda_utils.h:129-154), which localizes the first bad kernel."""
import jax.numpy as jnp
import numpy as np
import pytest

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.utils.debug import (
    DebugCheckError,
    checked_forward,
    scan_params,
)


def _poison_layer(params, slot, layer):
    """Return params with layer `layer`'s `slot` weight seeded with a NaN."""
    layers = dict(params["layers"])
    w = np.asarray(layers[slot], np.float32).copy()
    w[layer, 0, 0] = np.nan
    layers[slot] = jnp.asarray(w)
    out = dict(params)
    out["layers"] = layers
    return out


def test_scan_params_attributes_path():
    cfg = GptNeoXConfig.tiny(vocab_size=64)
    params = _poison_layer(init_params(cfg, dtype="fp32"), "up_w", 1)
    bad = scan_params(params)
    assert any("up_w" in path for path, n in bad)
    assert all(n == 1 for _, n in bad)


def test_checked_forward_attributes_layer():
    cfg = GptNeoXConfig.tiny(vocab_size=64)
    params = _poison_layer(init_params(cfg, dtype="fp32"), "up_w", 1)
    ids = np.array([[3, 4, 5, 6]], np.int32)
    with pytest.raises(DebugCheckError) as ei:
        checked_forward(cfg, params, ids, np.array([4], np.int32))
    # NaN enters at layer 1's FFN -> first failing check is layer 1 prefill
    assert "layer 1" in str(ei.value) and "prefill" in str(ei.value)


def test_engine_debug_mode_catches_and_clean_passes():
    cfg = GptNeoXConfig.tiny(vocab_size=64)
    params = init_params(cfg, dtype="fp32")
    rt = RuntimeConfig(dtype="fp32", seq_bucket=4, debug_level="DEBUG")
    eng = GptNeoXEngine(cfg, params, rt)
    # clean params: debug pass succeeds and generation proceeds
    out = eng.generate([[3, 4, 5]], output_len=3, top_k=1)
    assert out.output_ids.shape[2] >= 6

    bad = GptNeoXEngine(cfg, _poison_layer(params, "qkv_w", 0), rt)
    with pytest.raises(DebugCheckError):
        bad.generate([[3, 4, 5]], output_len=3, top_k=1)


def test_debug_off_is_default():
    assert not RuntimeConfig().debug_enabled()
    assert RuntimeConfig(debug_level="DEBUG").debug_enabled()
