"""Stop/bad-words encoding: [[str]] -> [batch, 2, L] flat-ids + cumulative
offsets, the reference's to_word_list_format (codefuse_example.py:26-53)."""
from __future__ import annotations

from typing import List, Sequence

import numpy as np


def to_word_list_format(words_list: Sequence[Sequence[str]], tokenizer) -> np.ndarray:
    flat_ids = []
    offsets = []
    for words in words_list:
        item_flat: List[int] = []
        item_offs: List[int] = []
        for word in words or []:
            ids = tokenizer.encode(word)
            if len(ids) == 0:
                continue
            item_flat += list(ids)
            item_offs.append(len(ids))
        flat_ids.append(np.array(item_flat, np.int64))
        offsets.append(np.cumsum(np.array(item_offs, np.int64)))

    pad_to = max(1, max((len(ids) for ids in flat_ids), default=1))
    for i, (ids, offs) in enumerate(zip(flat_ids, offsets)):
        flat_ids[i] = np.pad(ids, (0, pad_to - len(ids)), constant_values=0)
        offsets[i] = np.pad(offs, (0, pad_to - len(offs)), constant_values=-1)
    return (
        np.array([flat_ids, offsets], dtype="int32").transpose((1, 0, 2)).copy()
    )
