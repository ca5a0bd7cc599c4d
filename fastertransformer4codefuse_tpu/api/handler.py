"""Serving handler: request-dict -> batched generation -> JSON response.

Rebuilds the reference's CodeFuseHandler + get_data_package
(codefuse_example.py:779-905) including per-prompt parameter gathering with
the same defaults (top_k=50, top_p=0, temperature=1, repetition_penalty=1),
streaming via per-(batch,beam) incremental detokenizers, and the response
schema {latency, random_seed, generated_code, length, cum_log_prob}.
"""
from __future__ import annotations

import json
import logging
import random
import traceback
from typing import Callable, List, Optional

from .detok import TokenStreamDecoder
from .generate import generate, init_engine_and_tokenizer

logger = logging.getLogger(__name__)


def get_data_package(request_dict: dict, default_random_seed: int) -> dict:
    """Per-prompt parameter gathering with reference defaults
    (codefuse_example.py:779-812)."""
    prompt_dicts = request_dict["prompts"]

    def gather(key, default=None):
        if default is None and all(key not in p for p in prompt_dicts):
            return None
        if default is None and any(key not in p for p in prompt_dicts):
            raise RuntimeError(f"default_value is None while {key} is also None.")
        return [p.get(key, default) for p in prompt_dicts]

    texts = []
    for p in prompt_dicts:
        assert isinstance(p["prompt"], str)
        texts.append(p["prompt"])

    return {
        "texts": texts,
        "output_len": request_dict["out_seq_length"],
        "beam_width": request_dict.get("beam_width", 1),
        "stop_words_list": gather("stop_words"),
        "last_token_list": gather("last_token"),
        "top_k": gather("top_k", 50),
        "top_p": gather("top_p", 0.0),
        "beam_search_diversity_rate": gather("beam_search_diversity_rate", 0.0),
        "temperature": gather("temperature", 1.0),
        "len_penalty": gather("len_penalty", 0.0),
        "repetition_penalty": gather("repetition_penalty", 1.0),
        "random_seed": gather("random_seed", default_random_seed),
    }


class CodeFuseHandler:
    """predict(request_dict, trace_id) -> (resultCode, errorMessage, resultMap)."""

    def __init__(
        self,
        ckpt_path: str = None,
        tokenizer_path: str = None,
        int8_mode: int = 0,
        tensor_parallel: int = 1,
        dtype: str = "bf16",
        end_id: Optional[int] = None,
        on_stream_text: Optional[Callable[[int, int, str], None]] = None,
        engine=None,
        tokenizer=None,
        trie=None,
        warmup: bool = True,
        weight_bits: int = 8,
        group_size: int = 0,
        kv_cache_dtype: Optional[str] = None,
    ):
        """Pass ckpt/tokenizer paths (production) or prebuilt engine/tokenizer/
        trie (tests). ``on_stream_text(batch_idx, beam_idx, text)`` taps
        streamed chunks; default prints batch 0 to stdout like the reference."""
        if engine is None:
            engine, tokenizer, trie = init_engine_and_tokenizer(
                ckpt_path,
                tokenizer_path,
                tensor_parallel=tensor_parallel,
                int8_mode=int8_mode,
                dtype=dtype,
                trie_needed=True,
                end_id=end_id,
                weight_bits=weight_bits,
                group_size=group_size,
                kv_cache_dtype=kv_cache_dtype,
            )
        self.engine = engine
        self.tokenizer = tokenizer
        self.trie = trie
        self.on_stream_text = on_stream_text
        if warmup:
            generate(self.engine, self.tokenizer, ["demo"], 2, 1)

    def _default_stream_sink(self, batch_idx: int, beam_idx: int, text: str):
        if batch_idx == 0 and beam_idx == 0:
            print(text, end="", flush=True)

    def predict(self, request_dict: dict, trace_id: str):
        logger.info("%s request: %s", trace_id, json.dumps(request_dict, ensure_ascii=False))
        try:
            default_random_seed = random.randint(0, 1048576)
            use_callback = bool(request_dict.get("stream"))
            data_package = get_data_package(request_dict, default_random_seed)

            batch_size = len(data_package["texts"])
            beam_width = data_package["beam_width"]
            random_seed = data_package["random_seed"]

            callback = None
            decoders: List[List[TokenStreamDecoder]] = []
            if use_callback:
                sink = self.on_stream_text or self._default_stream_sink
                decoders = [
                    [
                        TokenStreamDecoder(
                            self.engine.config.end_id,
                            self.tokenizer,
                            on_text=(lambda s, b=b, j=j: sink(b, j, s)),
                        )
                        for j in range(beam_width)
                    ]
                    for b in range(batch_size)
                ]

                def callback(message_dict: dict):
                    try:
                        last_tokens = message_dict["last_tokens"]
                        for b in range(batch_size):
                            for j in range(beam_width):
                                decoders[b][j].append_token(last_tokens[b][j])
                    except BaseException as err:  # noqa: BLE001 — parity with reference
                        logger.error("callback error: %s", err)

            result, lengths, cum_log_probs, latency = generate(
                self.engine,
                self.tokenizer,
                trie=self.trie,
                callback=callback,
                **data_package,
            )

            if use_callback:
                for b in range(batch_size):
                    for j in range(beam_width):
                        decoders[b][j].append_token(self.engine.config.end_id)

            response = {
                "latency": latency,
                "random_seed": random_seed,
                "generated_code": result,
                "length": lengths,
                "cum_log_prob": cum_log_probs,
            }
            response_str = json.dumps(response, ensure_ascii=False)
            logger.info("%s response: %s", trace_id, response_str)
            return (0, "ok", {"res": response_str})
        except BaseException:  # noqa: BLE001 — parity with reference handler
            return (1, traceback.format_exc(), {"res": ""})
