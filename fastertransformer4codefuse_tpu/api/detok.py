"""Incremental token -> string streaming conversion.

Re-implements the reference's HF-TextStreamer-style converter
(codefuse_example.py:56-130): flush on newline, flush per CJK character, flush
up to the last space otherwise; trim a trailing "garbage" (mojibake) char at
end-of-stream.
"""
from __future__ import annotations

from typing import Callable, List, Optional

_GARBAGE_EXEMPT = {
    0xFF0C, 0x3002, 0xFF1F, 0xFF01, 0x3001, 0xFF1B, 0xFF1A, 0x201C, 0x201D,
    0x2018, 0x2019, 0xFF08, 0xFF09, 0x300A, 0x300B, 0x3010, 0x3011, 0x7B,
    0x7D, 0x5B, 0x5D, 0x3C, 0x3E, 0x7C, 0x2D, 0x3D, 0x5F, 0x2B, 0x2A, 0x26,
    0x5E, 0x25, 0x24, 0x23, 0x40, 0xFFE5, 0x7E, 0xB7, 0x60, 0x2026,
}


def is_chinese_char(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


def is_garbage(cp: int) -> bool:
    """True for non-ASCII, non-CJK, non-CJK-punctuation chars — usually a
    partially-decoded multi-byte token at a flush boundary."""
    if is_chinese_char(cp):
        return False
    if cp < 128:
        return False
    return cp not in _GARBAGE_EXEMPT


def trim_garbage(text: str) -> str:
    if text and is_garbage(ord(text[-1])):
        return text[:-1]
    return text


class TokenStreamDecoder:
    """Per-(batch,beam) incremental detokenizer.

    ``append_token`` feeds one token id; ``on_text`` receives printable chunks;
    ``on_finish`` fires once when end_id arrives (further tokens are ignored).
    """

    def __init__(
        self,
        end_id: int,
        tokenizer,
        on_text: Optional[Callable[[str], None]] = None,
        on_finish: Optional[Callable[[], None]] = None,
    ):
        self.end_id = end_id
        self.tokenizer = tokenizer
        self.on_text = on_text or (lambda s: None)
        self.on_finish = on_finish or (lambda: None)
        self.token_cache: List[int] = []
        self.print_len = 0
        self.has_stop = False
        self.text_parts: List[str] = []  # full emitted text (for inspection)

    def _emit(self, s: str) -> None:
        if s:
            self.text_parts.append(s)
        self.on_text(s)

    def append_token(self, token: int) -> None:
        if self.has_stop:
            return
        if token != self.end_id:
            self.token_cache.append(token)
        text = self.tokenizer.decode(self.token_cache)
        if token == self.end_id:
            printable = text[self.print_len :] if text else ""
            printable = trim_garbage(printable)
            self.token_cache = []
            self.print_len = 0
        elif text.endswith("\n"):
            printable = text[self.print_len :]
            self.token_cache = []
            self.print_len = 0
        elif text and is_chinese_char(ord(text[-1])):
            printable = text[self.print_len :]
            self.print_len += len(printable)
        else:
            printable = text[self.print_len : text.rfind(" ") + 1]
            self.print_len += len(printable)

        self._emit(printable)

        if token == self.end_id:
            self.has_stop = True
            self.on_finish()

    @property
    def text(self) -> str:
        return "".join(self.text_parts)
