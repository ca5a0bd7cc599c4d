"""Kernel tile autotune cache — the analog of the reference's gemm_config.in
(/root/reference/src/fastertransformer/utils/cublasAlgoMap.h:30-94 loads the
per-shape best cuBLAS algo recorded offline by gpt_gemm,
utils/gemm_test/gpt_gemm_func.cc). Here the tunable is the Pallas grid tile
(bn, bk) per (kernel, bm-bucket, K, N, group): ``tools/tile_autotune.py``
sweeps candidates on the real chip and records the winners into
``tile_cache.json`` next to this module; the kernels consult the cache at
trace time and fall back to their hand-measured defaults on a miss.

Env control: ``FTCF_TILE_CACHE=<path>`` points at a different cache file;
``FTCF_TILE_TUNE=0`` disables lookups entirely (defaults only).
"""
from __future__ import annotations

import json
import os
import threading
from typing import Optional, Tuple

_DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "tile_cache.json")
_cache: Optional[dict] = None
_lock = threading.Lock()


def cache_path() -> str:
    return os.environ.get("FTCF_TILE_CACHE") or _DEFAULT_PATH


def _key(kernel: str, bm: int, K: int, N: int, G: int) -> str:
    return f"{kernel}|bm{bm}|k{K}|n{N}|g{G}"


def _load() -> dict:
    global _cache
    if _cache is None:
        with _lock:
            if _cache is None:
                try:
                    with open(cache_path()) as f:
                        _cache = json.load(f)
                except (OSError, ValueError):
                    _cache = {}
    return _cache


def invalidate() -> None:
    """Drop the in-process cache (after record() or an env-path change)."""
    global _cache
    _cache = None


def lookup(
    kernel: str, bm: int, K: int, N: int, G: int = 0
) -> Optional[Tuple[int, int]]:
    """Measured (bn, bk) for this kernel/shape, or None (use defaults).

    ``bm`` is the kernel's already-selected M tile (16-ish at decode widths,
    256 at prefill) — the M bucket of the reference's algo map."""
    e = lookup_entry(kernel, bm, K, N, G)
    if not e:
        return None
    return int(e["bn"]), int(e["bk"])


def lookup_entry(
    kernel: str, bm: int, K: int, N: int, G: int = 0
) -> Optional[dict]:
    """Raw cache entry (kernels with non-(bn,bk) tile sets, e.g. the
    up+proj+down mega-kernel's three phase K-tiles)."""
    if os.environ.get("FTCF_TILE_TUNE", "1") == "0":
        return None
    return _load().get(_key(kernel, bm, K, N, G))


def record(
    kernel: str, bm: int, K: int, N: int, G: int,
    bn: int = 0, bk: int = 0, us: float = 0.0, note: str = "",
    path: Optional[str] = None, extra: Optional[dict] = None,
) -> None:
    """Persist a measured winner (sweep-tool entry point). ``extra`` holds
    kernel-specific tile fields beyond (bn, bk)."""
    path = path or cache_path()
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        data = {}
    e = {"bn": int(bn), "bk": int(bk), "us": round(float(us), 2), "note": note}
    if extra:
        e.update(extra)
    data[_key(kernel, bm, K, N, G)] = e
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    invalidate()
