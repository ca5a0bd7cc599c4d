"""Quality-delta harness sanity: int8 NLL close to fp NLL on a tiny model."""
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.ckpt.quantize import quantize_params
from tools.quality_eval import eval_nll, greedy_agreement


def test_eval_nll_and_agreement():
    cfg = GptNeoXConfig.tiny(head_num=4, size_per_head=8, vocab_size=64)
    params = init_params(cfg, dtype="fp32")
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 64, size=(200,))

    nll_fp = eval_nll(cfg, params, ids, chunk=64)
    nll_q8 = eval_nll(cfg, quantize_params(params), ids, chunk=64)
    assert 0 < nll_fp < 20
    assert abs(nll_q8 - nll_fp) < 0.2, (nll_fp, nll_q8)

    eng_fp = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))
    eng_q = GptNeoXEngine(
        cfg, quantize_params(params), RuntimeConfig(dtype="fp32", int8_mode=1, seq_bucket=8)
    )
    agree = greedy_agreement(eng_fp, eng_q, [[3, 4, 5], [9, 8, 7]], output_len=8)
    assert agree > 0.4  # tiny random model: int8 noise flips some tokens
