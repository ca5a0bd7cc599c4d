"""Beam search (online-softmax style) — the analog of the reference's
OnlineBeamSearchLayer (/root/reference/src/fastertransformer/layers/
beam_search_layers/). Implemented in a later milestone."""
from __future__ import annotations


def beam_search_generate(engine, input_ids, output_len, beam_width, callback=None, **kw):
    raise NotImplementedError("beam search lands in a later milestone; use beam_width=1")
