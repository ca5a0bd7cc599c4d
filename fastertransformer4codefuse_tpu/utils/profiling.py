"""Profiling annotations and trace capture.

≙ the reference's NVTX ranges (PUSH_RANGE/POP_RANGE around every GEMM and
attention call, /root/reference/src/fastertransformer/utils/nvtx_utils.h:37)
viewed in nsys. On TPU the equivalents are jax.profiler named traces viewed in
xprof/tensorboard, plus a parsed flat summary for headless analysis (the same
parsing used to find the per-step KV-cache copies during bring-up).
"""
from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import os
from typing import Dict, List, Tuple

import jax


def annotate(name: str):
    """Named range visible in device traces: ``with annotate("attention"): ...``"""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an xprof trace around a block."""
    with jax.profiler.trace(log_dir):
        yield


def summarize_trace(log_dir: str, top: int = 20) -> List[Tuple[str, float, int, str]]:
    """Flat per-op device-time summary from the newest trace in ``log_dir``.

    Returns [(op_name, total_ms, count, hlo_snippet)] sorted by total time.
    """
    paths = sorted(glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    events = t["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    durs = collections.Counter()
    cnt = collections.Counter()
    example: Dict[str, str] = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e.get("pid"), ""):
            if e["name"].startswith(("while", "cond", "jit_")):
                continue
            durs[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
            example.setdefault(e["name"], (e.get("args", {}) or {}).get("long_name", ""))
    return [
        (name, d / 1000.0, cnt[name], example.get(name, "")[:120])
        for name, d in durs.most_common(top)
    ]
