"""Deterministic offset-preserving tokenizer.

Stands in for the reference's HuggingFace subword tokenizer
(/root/reference/src/data.py:169-171 uses `tokenizer(text,
add_special_tokens=False)` and consumes `.ids` + `.offsets`). The rebuild's
surrogate "model" only needs token *offsets* (char spans), so the tokenizer is
a compiled-regex word/punct splitter. The interface (tokens + offsets, CLS/SEP
bookkeeping, model_max_length=512) matches what a transformer tokenizer would
provide, so a real subword tokenizer can be dropped in without touching the
window math.
"""

from __future__ import annotations

import re

# entity-marker tokens first so "[s1]" stays one token
# (marker insertion: /root/reference/src/extractor/data.py:123-126)
_TOKEN_RE = re.compile(r"\[[se][12]\]|[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")


def tokenize_with_offsets(text: str) -> list[tuple[int, int]]:
    """Return [(start, end)] char spans of tokens, in order."""
    return [m.span() for m in _TOKEN_RE.finditer(text)]


def tokenize(text: str) -> list[str]:
    """Return token surface strings (for the relation-extractor windowing,
    which needs token identity to locate [s1]/[e1]/[s2]/[e2] markers,
    reference /root/reference/src/extractor/data.py:364-367)."""
    return _TOKEN_RE.findall(text)
