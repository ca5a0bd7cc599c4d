"""Vocab trie for the partial-last-word feature.

The fork's headline capability #2 (README.md:33: "prompt does not require a
complete word at the end"): given the trailing partial word of a prompt, find
every vocab token whose string *extends* it; the first sampled token is then
constrained to that set (reference: Trie at codefuse_example.py:132-172 feeding
the select_optional_last_tokens kernel).

Iterative implementation (the reference's recursion overflows on deep vocab
strings) with the same observable behavior.
"""
from __future__ import annotations

from typing import Dict, List, Tuple


class _Node:
    __slots__ = ("children", "is_token")

    def __init__(self):
        self.children: Dict[str, "_Node"] = {}
        self.is_token = False


class VocabTrie:
    """Character trie over a tokenizer vocab (token string -> id)."""

    def __init__(self, vocab: Dict[str, int]):
        self.vocab = vocab
        self.root = _Node()
        for key in vocab:
            self._insert(key)

    def _insert(self, key: str) -> None:
        node = self.root
        for ch in key:
            nxt = node.children.get(ch)
            if nxt is None:
                nxt = node.children[ch] = _Node()
            node = nxt
        node.is_token = True

    def extensions(self, prefix: str) -> List[Tuple[str, int]]:
        """All (token_string, token_id) whose string starts with ``prefix``
        (including ``prefix`` itself if it is a token)."""
        node = self.root
        for ch in prefix:
            node = node.children.get(ch)
            if node is None:
                return []
        results: List[Tuple[str, int]] = []
        stack = [(node, prefix)]
        while stack:
            n, word = stack.pop()
            if n.is_token:
                results.append((word, self.vocab[word]))
            for ch, child in n.children.items():
                stack.append((child, word + ch))
        return results

    # ------------------------------------------------------------ reference API
    def printAutoSuggestions(self, key: str, results: list) -> int:
        """Reference-compatible entry point (codefuse_example.py:161-172):
        appends (word, id) pairs into ``results``; returns 0 if the prefix is
        not in the trie, -1 if the prefix is a leaf token, 1 otherwise."""
        node = self.root
        for ch in key:
            node = node.children.get(ch)
            if node is None:
                return 0
        if not node.children:
            return -1
        results.extend(self.extensions(key))
        return 1


# reference-compatible alias
Trie = VocabTrie


def optional_last_token_ids(
    trie: VocabTrie, last_token: str, end_id: int
) -> List[int]:
    """Token-id set allowed as the first generated token. Falls back to
    [end_id] when nothing extends the partial word
    (codefuse_example.py:706-715)."""
    ids = [tid for _, tid in trie.extensions(last_token)]
    return ids if ids else [end_id]
