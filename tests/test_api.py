"""API layer: trie, word-list encoding, streaming detok, handler end-to-end
(the analog of the reference's E2E smoke via input_demo.jsonl, SURVEY §4)."""
import json

import numpy as np
import pytest

from fastertransformer4codefuse_tpu import (
    GptNeoXConfig,
    GptNeoXEngine,
    RuntimeConfig,
    init_params,
)
from fastertransformer4codefuse_tpu.api.detok import TokenStreamDecoder, is_garbage
from fastertransformer4codefuse_tpu.api.handler import CodeFuseHandler, get_data_package
from fastertransformer4codefuse_tpu.api.trie import VocabTrie, optional_last_token_ids
from fastertransformer4codefuse_tpu.api.wordlist import to_word_list_format


class CharTokenizer:
    """Char-level mock tokenizer (+ optional multi-char vocab entries)."""

    def __init__(self, extra_tokens=()):
        chars = "abcdefghijklmnopqrstuvwxyz0123456789 \n#.,"
        self.vocab = {"<s>": 0, "</s>": 1}
        for c in chars:
            self.vocab[c] = len(self.vocab)
        for t in extra_tokens:
            self.vocab.setdefault(t, len(self.vocab))
        self.inv = {v: k for k, v in self.vocab.items()}

    def encode(self, text):
        return [self.vocab[c] for c in text if c in self.vocab]

    def decode(self, ids):
        return "".join(self.inv.get(int(i), "") for i in ids if int(i) > 1)

    def get_vocab(self):
        return dict(self.vocab)


def test_trie():
    vocab = {"vo": 5, "void": 6, "volatile": 7, "x": 8, "va": 9}
    trie = VocabTrie(vocab)
    got = dict(trie.extensions("vo"))
    assert got == {"vo": 5, "void": 6, "volatile": 7}
    # reference-compatible API
    results = []
    assert trie.printAutoSuggestions("v", results) == 1
    assert dict(results) == {"vo": 5, "void": 6, "volatile": 7, "va": 9}
    assert trie.printAutoSuggestions("zz", []) == 0
    assert trie.printAutoSuggestions("x", []) == -1  # leaf
    assert optional_last_token_ids(trie, "nothing", end_id=1) == [1]


def test_word_list_format():
    tok = CharTokenizer()
    out = to_word_list_format([["ab", "c"], ["de"]], tok)
    assert out.shape == (2, 2, 3)
    a, b, c, d, e = (tok.vocab[x] for x in "abcde")
    np.testing.assert_array_equal(out[0, 0], [a, b, c])
    np.testing.assert_array_equal(out[0, 1], [2, 3, -1])  # cumulative offsets
    np.testing.assert_array_equal(out[1, 0], [d, e, 0])
    np.testing.assert_array_equal(out[1, 1], [2, -1, -1])


def test_stream_decoder_word_boundaries():
    tok = CharTokenizer()
    chunks = []
    dec = TokenStreamDecoder(end_id=1, tokenizer=tok, on_text=chunks.append)
    for t in tok.encode("hello wor"):
        dec.append_token(t)
    # flushes only up to the last space so partial words never stream
    assert dec.text == "hello "
    for t in tok.encode("ld\n"):
        dec.append_token(t)
    assert dec.text == "hello world\n"
    dec.append_token(1)  # end
    assert dec.has_stop
    dec.append_token(tok.vocab["x"])  # ignored after stop
    assert dec.text == "hello world\n"


def test_garbage_trim():
    assert is_garbage(0xFFFD)  # replacement char
    assert not is_garbage(ord("a"))
    assert not is_garbage(0x4E2D)  # CJK


def make_handler(extra_tokens=("vo", "void")):
    tok = CharTokenizer(extra_tokens)
    cfg = GptNeoXConfig.tiny(vocab_size=64, end_id=1)
    params = init_params(cfg, dtype="fp32")
    eng = GptNeoXEngine(cfg, params, RuntimeConfig(dtype="fp32", seq_bucket=8))
    trie = VocabTrie(tok.get_vocab())
    return CodeFuseHandler(engine=eng, tokenizer=tok, trie=trie, warmup=False), tok


def test_get_data_package_defaults():
    pkg = get_data_package(
        {
            "prompts": [
                {"prompt": "a", "top_k": 3},
                {"prompt": "b"},
            ],
            "out_seq_length": 16,
        },
        default_random_seed=7,
    )
    assert pkg["top_k"] == [3, 50]
    assert pkg["top_p"] == [0.0, 0.0]
    assert pkg["temperature"] == [1.0, 1.0]
    assert pkg["random_seed"] == [7, 7]
    assert pkg["stop_words_list"] is None
    with pytest.raises(RuntimeError):
        get_data_package(
            {"prompts": [{"prompt": "a", "stop_words": ["x"]}, {"prompt": "b"}],
             "out_seq_length": 4},
            0,
        )


def test_handler_end_to_end_with_streaming():
    handler, tok = make_handler()
    streamed = []
    handler.on_stream_text = lambda b, j, s: streamed.append((b, s))

    # NB: like the reference's gather_batched_parameter, default-less keys
    # (stop_words, last_token) must appear on all prompts or none
    request = {
        "prompts": [
            {
                "prompt": "quick sort\n",
                "last_token": "vo",
                "top_k": 1,
                "repetition_penalty": 1.1,
                "stop_words": ["zz"],
            },
            {"prompt": "hello", "top_k": 1, "last_token": "", "stop_words": []},
        ],
        "out_seq_length": 6,
        "stream": True,
    }
    code, err, result_map = handler.predict(request, "t1")
    assert code == 0, err
    res = json.loads(result_map["res"])
    assert set(res) == {"latency", "random_seed", "generated_code", "length", "cum_log_prob"}
    assert len(res["generated_code"]) == 2
    # first generated token constrained by the trie: must start with "vo"
    assert res["generated_code"][0][0].startswith("vo") or res["length"][0][0] == 0
    # streamed text (batch 0) must equal the final decoded text
    text0 = "".join(s for b, s in streamed if b == 0)
    assert text0 == res["generated_code"][0][0]


def test_handler_error_path():
    handler, _ = make_handler()
    code, err, result_map = handler.predict({"prompts": [{}]}, "t2")
    assert code == 1
    assert result_map["res"] == ""
    assert "KeyError" in err or "out_seq_length" in err


def test_handler_serves_int4_checkpoint(tmp_path, monkeypatch):
    """Serving-path W4 plumbing (reference analog: enable_int8_weights wiring,
    codefuse_example.py:407-418): the handler must load a .q4.bin checkpoint
    dir with weight_bits/group_size/kv_cache_dtype knobs end-to-end — the
    repo's own headline configuration (int8_mode=2 + W4 + int8 KV)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from fastertransformer4codefuse_tpu.ckpt.convert import convert_hf_to_bin
    from fastertransformer4codefuse_tpu.ckpt.loader import load_bin_checkpoint
    from fastertransformer4codefuse_tpu.ckpt.quantize import quant_and_save
    from fastertransformer4codefuse_tpu.models.params import QuantizedTensor

    torch.manual_seed(0)
    hf_cfg = transformers.GPTNeoXConfig(
        vocab_size=64, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256, rotary_pct=0.25,
        max_position_embeddings=128, use_parallel_residual=True,
        bos_token_id=0, eos_token_id=1, hidden_act="gelu",
    )
    hf = transformers.GPTNeoXForCausalLM(hf_cfg).eval()
    ckpt = str(tmp_path / "1-gpu")
    convert_hf_to_bin(hf, ckpt, infer_tp=1, weight_data_type="fp32")
    quant_and_save(ckpt, weight_bits=4, group_size=16)

    tok = CharTokenizer()
    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        staticmethod(lambda path, **kw: tok),
    )
    handler = CodeFuseHandler(
        ckpt_path=ckpt, tokenizer_path="unused", int8_mode=2, dtype="fp32",
        weight_bits=4, group_size=16, kv_cache_dtype="int8", warmup=False,
    )
    # the loaded engine really is the quantized configuration
    lw = handler.engine.params["layers"]["up_w"]
    assert isinstance(lw, QuantizedTensor) and lw.bits == 4 and lw.group_size == 16
    assert isinstance(handler.engine.params["embed"], QuantizedTensor)
    assert isinstance(handler.engine.params["lm_head"], QuantizedTensor)
    assert handler.engine.runtime.kv_cache_dtype == "int8"

    code, err, result_map = handler.predict(
        {"prompts": [{"prompt": "hello", "top_k": 1}], "out_seq_length": 4}, "t3"
    )
    assert code == 0, err
    res = json.loads(result_map["res"])
    assert len(res["generated_code"]) == 1

    # quantize-on-load fallback: an fp-only dir (no .q4.bin) quantizes in
    # memory to the identical config
    ckpt_fp = str(tmp_path / "fp-1-gpu")
    convert_hf_to_bin(hf, ckpt_fp, infer_tp=1, weight_data_type="fp32")
    _, params_mem = load_bin_checkpoint(
        ckpt_fp, dtype="fp32", int8_mode=1, weight_bits=4, group_size=16
    )
    mw = params_mem["layers"]["up_w"]
    assert isinstance(mw, QuantizedTensor) and mw.bits == 4 and mw.group_size == 16
    import numpy as _np

    _np.testing.assert_array_equal(_np.asarray(mw.q), _np.asarray(lw.q))
