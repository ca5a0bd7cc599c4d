"""Tile autotune cache (ops/tile_tuning.py) — the gemm_config.in analog."""
import json
import os

import pytest

from fastertransformer4codefuse_tpu.ops import tile_tuning as tt


@pytest.fixture
def cache_file(tmp_path, monkeypatch):
    path = str(tmp_path / "tile_cache.json")
    monkeypatch.setenv("FTCF_TILE_CACHE", path)
    tt.invalidate()
    yield path
    tt.invalidate()


def test_record_lookup_roundtrip(cache_file):
    assert tt.lookup("stacked_w4", 16, 5120, 20480) is None
    tt.record("stacked_w4", 16, 5120, 20480, 0, bn=2560, bk=2560, us=75.7)
    assert tt.lookup("stacked_w4", 16, 5120, 20480) == (2560, 2560)
    # distinct keys: bm bucket, group, kernel
    assert tt.lookup("stacked_w4", 256, 5120, 20480) is None
    assert tt.lookup("stacked_w4", 16, 5120, 20480, G=128) is None
    assert tt.lookup("stacked_w4g", 16, 5120, 20480) is None
    # file is plain JSON with the measured time recorded
    with open(cache_file) as f:
        data = json.load(f)
    [(k, v)] = data.items()
    assert "stacked_w4" in k and v["us"] == 75.7


def test_extra_fields_for_mega_kernel(cache_file):
    tt.record(
        "fused_upd8", 16, 5120, 20480, 0, us=300.0,
        extra={"bku": 256, "bkp": 640, "bkd": 512},
    )
    e = tt.lookup_entry("fused_upd8", 16, 5120, 20480)
    assert (e["bku"], e["bkp"], e["bkd"]) == (256, 640, 512)


def test_env_kill_switch(cache_file, monkeypatch):
    tt.record("stacked_w4", 16, 5120, 20480, 0, bn=2560, bk=2560, us=75.7)
    monkeypatch.setenv("FTCF_TILE_TUNE", "0")
    assert tt.lookup("stacked_w4", 16, 5120, 20480) is None
    monkeypatch.delenv("FTCF_TILE_TUNE")
    assert tt.lookup("stacked_w4", 16, 5120, 20480) == (2560, 2560)


def test_shipped_cache_is_valid_json():
    """The committed tile_cache.json must parse and hold sane tile values
    (every kernel clamps with _largest_divisor_tile, but a corrupt entry —
    e.g. a negative-time sweep artifact — must never ship)."""
    path = os.path.join(os.path.dirname(tt.__file__), "tile_cache.json")
    with open(path) as f:
        data = json.load(f)
    assert data, "shipped cache should not be empty"
    for key, e in data.items():
        assert e["us"] > 0, (key, e)
        if e.get("bku"):
            # mega-kernel entries carry per-PHASE contraction tiles instead
            # of a single (bn, bk) pair (bn/bk are 0 placeholders)
            for f in ("bku", "bkp", "bkd"):
                assert e[f] % 128 == 0 and e[f] > 0, (key, e)
            continue
        assert e["bn"] % 128 == 0 and e["bn"] > 0, (key, e)
        assert e["bk"] % 128 == 0 and e["bk"] > 0, (key, e)


def test_shipped_cache_covers_pool_widths_and_mixtral():
    """VERDICT r4 item 8 coverage pin: the shipped tile_cache.json must hold
    measured entries for the pool-width bm32 bucket on every codefuse13b
    GEMM (int8 + w4g) and for the Mixtral attention + expert shapes — so a
    cache regression fails loudly instead of silently hitting heuristics."""
    from fastertransformer4codefuse_tpu.ops.tile_tuning import lookup

    # codefuse13b @ pool width 32
    for K, N in ((5120, 15360), (5120, 5120), (5120, 20480), (20480, 5120)):
        assert lookup("stacked_int8", 32, K, N) is not None, (K, N)
        assert lookup("stacked_w4g", 32, K, N, 128) is not None, (K, N)
    # mixtral8x7b attention + expert GEMMs (bm16 decode + bm32 pool)
    for K, N in ((4096, 6144), (4096, 4096), (4096, 14336), (14336, 4096)):
        for bm in (16, 32):
            assert lookup("stacked_int8", bm, K, N) is not None, (bm, K, N)
