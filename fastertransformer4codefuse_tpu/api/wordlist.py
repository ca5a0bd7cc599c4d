"""Stop/bad-words encoding.

On-disk/wire format parity target: the ``[batch, 2, L]`` tensor consumed by
the stop-words / ban-bad-words criteria — row 0 holds each batch item's word
token ids back to back, row 1 the cumulative end offset of every word, padded
with -1 (format defined by the reference serving protocol,
/root/reference/examples/pytorch/codefuse/codefuse_example.py:26-53, and the
kernels that read it, stop_criteria_kernels.cu / ban_bad_words.cu).

The implementation here is the repo's own: tokenize once into per-item
(flat ids, word lengths) pairs, then assemble the padded [B, 2, L] array in a
single pass.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def to_word_list_format(words_list: Sequence[Sequence[str]], tokenizer) -> np.ndarray:
    """Encode per-batch word lists into the [B, 2, L] flat-ids+offsets format.

    Empty encodings are dropped; L is the longest flat id run across the
    batch (minimum 1 so the array is never zero-width).
    """
    encoded = [
        [ids for w in (words or []) if len(ids := tokenizer.encode(w)) > 0]
        for words in words_list
    ]
    width = max([1] + [sum(map(len, item)) for item in encoded])

    out = np.full((len(encoded), 2, width), -1, np.int32)
    out[:, 0, :] = 0  # id row padding (never read past the last offset)
    for b, item in enumerate(encoded):
        pos = 0
        for n, ids in enumerate(item):
            out[b, 0, pos : pos + len(ids)] = ids
            pos += len(ids)
            out[b, 1, n] = pos
    return out
