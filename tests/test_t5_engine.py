"""T5 engine grade (VERDICT r4 item 3): beam + sampled decoding parity vs
hf.generate, TP4 CPU-mesh parity, int8 weights, registry engine seam.

Beam parity is exact: engine/t5_engine.py replicates transformers 4.57's
vectorized `_beam_search` (2k continuations, running/finished beam sets,
length-penalized finalization, early_stopping heuristics), so every token of
every returned beam must equal ``hf.generate(num_beams=k)``'s. The reference
serves T5 with sampling+beam through T5Decoding.cc.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from fastertransformer4codefuse_tpu.engine.t5_engine import T5Engine
from fastertransformer4codefuse_tpu.models.t5 import (
    config_from_hf_t5,
    params_from_hf_t5_state_dict,
    quantize_t5_params,
)
from fastertransformer4codefuse_tpu.parallel.sharding import build_mesh


def make_hf_t5(seed=0):
    torch.manual_seed(seed)
    cfg = transformers.T5Config(
        vocab_size=96,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
        decoder_start_token_id=0,
        eos_token_id=1,
        pad_token_id=0,
    )
    return transformers.T5ForConditionalGeneration(cfg).eval()


def mk(seed=0):
    hf = make_hf_t5(seed)
    cfg = config_from_hf_t5(hf.config)
    params = params_from_hf_t5_state_dict(cfg, hf.state_dict())
    return hf, cfg, params


def ids_for(cfg, B, S, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(2, cfg.vocab_size, size=(B, S)).astype(np.int32)


def test_t5_engine_greedy_matches_hf():
    hf, cfg, params = mk(seed=2)
    eng = T5Engine(cfg, params)
    ids = ids_for(cfg, 2, 8)
    OUT = 8
    with torch.no_grad():
        want = hf.generate(
            torch.tensor(ids, dtype=torch.long), max_new_tokens=OUT,
            do_sample=False, num_beams=1,
        ).numpy()[:, 1:]
    out = eng.generate([list(r) for r in ids], OUT)
    for b in range(ids.shape[0]):
        for i in range(min(want.shape[1], OUT)):
            assert out.output_ids[b, 0, i] == want[b, i], (b, i)
            if want[b, i] == cfg.end_id:
                break


@pytest.mark.parametrize("bw,lp,seed", [(2, 1.0, 0), (3, 1.0, 1), (2, 0.6, 2), (4, 2.0, 5)])
def test_t5_engine_beam_matches_hf_exactly(bw, lp, seed):
    hf, cfg, params = mk(seed=seed)
    eng = T5Engine(cfg, params)
    ids = ids_for(cfg, 2, 7, seed=seed + 10)
    OUT = 10
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor(ids, dtype=torch.long), max_new_tokens=OUT,
            do_sample=False, num_beams=bw, num_return_sequences=bw,
            length_penalty=lp, early_stopping=False,
            output_scores=True, return_dict_in_generate=True,
        )
    want = hf_out.sequences.numpy()[:, 1:]  # drop decoder_start
    want_scores = hf_out.sequences_scores.numpy()
    out = eng.generate(
        [list(r) for r in ids], OUT, beam_width=bw, length_penalty=lp
    )
    B = ids.shape[0]
    for b in range(B):
        for j in range(bw):
            got = out.output_ids[b, j]
            ref = want[b * bw + j]
            n = int(out.sequence_lengths[b, j])
            # HF pads with pad_token after eos; compare through the generated
            # region (the engine pads with end_id)
            for i in range(min(n, len(ref))):
                assert got[i] == ref[i], (b, j, i, got[: n], ref)
            np.testing.assert_allclose(
                out.scores[b, j], want_scores[b * bw + j], rtol=1e-4
            )


def test_t5_engine_beam_matches_hf_early_stopping_true():
    hf, cfg, params = mk(seed=7)
    eng = T5Engine(cfg, params)
    ids = ids_for(cfg, 2, 6, seed=20)
    OUT = 8
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor(ids, dtype=torch.long), max_new_tokens=OUT,
            do_sample=False, num_beams=2, num_return_sequences=2,
            early_stopping=True, output_scores=True,
            return_dict_in_generate=True,
        )
    want = hf_out.sequences.numpy()[:, 1:]
    out = eng.generate([list(r) for r in ids], OUT, beam_width=2,
                       early_stopping=True)
    for b in range(2):
        for j in range(2):
            n = int(out.sequence_lengths[b, j])
            ref = want[b * 2 + j]
            for i in range(min(n, len(ref))):
                assert out.output_ids[b, j, i] == ref[i], (b, j, i)


def test_t5_engine_sampled_supported_and_deterministic():
    """Sampled decoding: top_k=1 equals greedy; top_k=5 is deterministic per
    seed and every emitted token lies in HF's teacher-forced top-5 at that
    position (distribution-support parity — HF's torch rng cannot be
    bit-matched)."""
    hf, cfg, params = mk(seed=4)
    eng = T5Engine(cfg, params)
    ids = ids_for(cfg, 2, 6, seed=8)
    OUT = 6
    greedy = eng.generate([list(r) for r in ids], OUT)
    k1 = eng.generate([list(r) for r in ids], OUT, top_k=1, random_seed=9)
    np.testing.assert_array_equal(greedy.output_ids, k1.output_ids)

    s1 = eng.generate([list(r) for r in ids], OUT, top_k=5, random_seed=123)
    s2 = eng.generate([list(r) for r in ids], OUT, top_k=5, random_seed=123)
    np.testing.assert_array_equal(s1.output_ids, s2.output_ids)

    # support check: teacher-force our sampled prefix through HF, assert each
    # sampled token is in HF's top-5 of the step distribution
    for b in range(2):
        n = int(s1.sequence_lengths[b, 0])
        toks = [int(t) for t in s1.output_ids[b, 0, :n]]
        dec_in = [cfg.start_id] + toks[:-1]
        with torch.no_grad():
            logits = hf(
                input_ids=torch.tensor(ids[b][None], dtype=torch.long),
                decoder_input_ids=torch.tensor([dec_in], dtype=torch.long),
            ).logits.numpy()[0]
        for i, t in enumerate(toks):
            top5 = np.argsort(-logits[i])[:5]
            assert t in top5, (b, i, t, top5)


def test_t5_engine_int8_matches_dequantized_fp():
    """int8 weights: the engine must produce EXACTLY the outputs of an fp
    engine run on the dequantized weights (q*scale) — the quantization error
    is the only difference, and it is shared."""
    _hf, cfg, params = mk(seed=6)
    qp = quantize_t5_params(params)

    def dequant(stack):
        from fastertransformer4codefuse_tpu.models.params import QuantizedTensor

        out = {}
        for k, v in stack.items():
            if isinstance(v, QuantizedTensor):
                out[k] = (v.q.astype(jnp.float32)
                          * jnp.expand_dims(v.scale, v.k_axis))
            else:
                out[k] = v
        return out

    fp_like = dict(params, enc=dequant(qp["enc"]), dec=dequant(qp["dec"]))
    ids = ids_for(cfg, 2, 6, seed=11)
    OUT = 6
    a = T5Engine(cfg, qp).generate([list(r) for r in ids], OUT)
    b = T5Engine(cfg, fp_like).generate([list(r) for r in ids], OUT)
    np.testing.assert_array_equal(a.output_ids, b.output_ids)
    a2 = T5Engine(cfg, qp).generate([list(r) for r in ids], OUT, beam_width=2)
    b2 = T5Engine(cfg, fp_like).generate([list(r) for r in ids], OUT, beam_width=2)
    np.testing.assert_array_equal(a2.output_ids, b2.output_ids)


def test_t5_engine_tp4_matches_unsharded():
    """TP4 CPU-mesh parity: greedy + beam outputs identical to the unsharded
    engine; head/ffn axes actually sharded."""
    _hf, cfg, params = mk(seed=3)
    ids = ids_for(cfg, 2, 6, seed=5)
    OUT = 8
    ref_g = T5Engine(cfg, params).generate([list(r) for r in ids], OUT)
    ref_b = T5Engine(cfg, params).generate(
        [list(r) for r in ids], OUT, beam_width=2
    )
    mesh = build_mesh(tp=4)
    eng = T5Engine(cfg, params, mesh=mesh)
    assert eng.params["enc"]["q_w"].sharding.spec[2] == "tp"
    assert eng.params["dec"]["wo"].sharding.spec[1] == "tp"
    got_g = eng.generate([list(r) for r in ids], OUT)
    got_b = eng.generate([list(r) for r in ids], OUT, beam_width=2)
    np.testing.assert_array_equal(ref_g.output_ids, got_g.output_ids)
    np.testing.assert_array_equal(ref_b.output_ids, got_b.output_ids)


def test_t5_engine_tp2_int8():
    """Quantized weights under TP: scale pytrees shard with their weights."""
    _hf, cfg, params = mk(seed=9)
    qp = quantize_t5_params(params)
    ids = ids_for(cfg, 2, 6, seed=13)
    ref = T5Engine(cfg, qp).generate([list(r) for r in ids], 6)
    eng = T5Engine(cfg, qp, mesh=build_mesh(tp=2))
    assert eng.params["enc"]["q_w"].q.sharding.spec[2] == "tp"
    assert eng.params["enc"]["q_w"].scale.sharding.spec[1] == "tp"
    got = eng.generate([list(r) for r in ids], 6)
    np.testing.assert_array_equal(ref.output_ids, got.output_ids)


def test_t5_registry_engine_seam():
    """registry.get('t5').make_engine serves generate() end-to-end."""
    from fastertransformer4codefuse_tpu.models import registry

    hf, cfg, params = mk(seed=2)
    fam = registry.get("t5")
    eng = fam.make_engine(cfg, params)
    ids = ids_for(cfg, 1, 6)
    out = eng.generate([list(ids[0])], 5)
    assert out.output_ids.shape[:2] == (1, 1)
    # decoder families expose the same seam
    assert registry.get("gptneox").make_engine is not None
