"""Prompt learning served FROM the continuous-batching pool (retires the r4
static-path fallback): per-slot prefix K/V occupy cache slots
[0, prompt_width) with the one-shot engine's pos_offset scheme
(GptNeoX.cc:443-509 / engine.py _prefill_state). Pooled outputs must equal
engine.generate(prompt_learning_task_name_ids=[t])."""
import numpy as np

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.engine.batcher import ContinuousBatcher

PROMPTS = [[3, 4, 5], [9, 8, 7, 6, 5], [11, 12], [20, 21, 22, 23]]
OUT_LENS = [5, 4, 6, 3]


def mk(kv_dtype=None):
    cfg = GptNeoXConfig.tiny(head_num=4, size_per_head=8, vocab_size=64)
    params = init_params(cfg, dtype="fp32")
    eng = GptNeoXEngine(
        cfg, params,
        RuntimeConfig(dtype="fp32", seq_bucket=8, kv_cache_dtype=kv_dtype),
    )
    rng = np.random.RandomState(0)
    table = {
        7: (rng.randn(cfg.layer_num, 2, cfg.head_num, 5, cfg.size_per_head)
            .astype(np.float32) * 0.3, 5),
        9: (rng.randn(cfg.layer_num, 2, cfg.head_num, 3, cfg.size_per_head)
            .astype(np.float32) * 0.3, 3),
    }
    eng.set_prompt_learning_table(table)
    return cfg, eng, table


def refs(eng, tasks):
    out = []
    for p, ol, t in zip(PROMPTS, OUT_LENS, tasks):
        kw = {} if t is None else dict(prompt_learning_task_name_ids=[t])
        o = eng.generate([p], output_len=ol, top_k=1, **kw)
        n = int(o.sequence_lengths[0, 0])
        out.append([int(x) for x in o.output_ids[0, 0, :n]])
    return out


def run_pool(cfg, eng, table, tasks, **pool_kw):
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=8,
        prompt_table=table, **pool_kw,
    )
    uids = [
        cb.submit(p, ol, top_k=1, prompt_task_id=t)
        for p, ol, t in zip(PROMPTS, OUT_LENS, tasks)
    ]
    done = cb.run(max_ticks=300)
    return [done[u] for u in uids]


def test_pooled_prompt_learning_matches_oneshot():
    """Mixed tasks AND no-task requests sharing slots mid-flight."""
    cfg, eng, table = mk()
    tasks = [7, None, 9, 7]
    want = refs(eng, tasks)
    got = run_pool(cfg, eng, table, tasks)
    for r, ref in zip(got, want):
        assert r.done
        assert r.output_ids == ref, (r.output_ids, ref)


def test_pooled_prompt_learning_int8_kv():
    """Prefix K/V quantize per-vector into the int8 pool cache; parity vs
    the one-shot engine with the same int8 cache."""
    cfg, eng, table = mk(kv_dtype="int8")
    tasks = [9, 7, None, 9]
    want = refs(eng, tasks)
    got = run_pool(cfg, eng, table, tasks)
    for r, ref in zip(got, want):
        assert r.output_ids == ref, (r.output_ids, ref)


def test_pooled_prompt_learning_rejections():
    import pytest

    cfg, eng, table = mk()
    cb = ContinuousBatcher(
        eng, max_slots=2, max_seq_len=32, prompt_bucket=8, prompt_table=table
    )
    with pytest.raises(ValueError, match="unknown prompt task"):
        cb.submit([1, 2], 3, prompt_task_id=42)
    cb2 = ContinuousBatcher(eng, max_slots=2, max_seq_len=32, prompt_bucket=8)
    with pytest.raises(ValueError, match="prompt_table"):
        cb2.submit([1, 2], 3, prompt_task_id=7)
    with pytest.raises(AssertionError, match="paged pools"):
        ContinuousBatcher(
            eng, max_slots=2, max_seq_len=32, prompt_bucket=8,
            prompt_table=table, paged=dict(num_pages=8, page_size=8),
        )
