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


def count_tokens(text: str) -> int:
    """Token count without materializing token strings or span tuples
    (hot-path helper: the window-count check and the extractor's fast-path
    bound only need the number)."""
    n = 0
    for _ in _TOKEN_RE.finditer(text):
        n += 1
    return n


def tokenize(text: str) -> list[str]:
    """Return token surface strings (for the relation-extractor windowing,
    which needs token identity to locate [s1]/[e1]/[s2]/[e2] markers,
    reference /root/reference/src/extractor/data.py:364-367)."""
    return _TOKEN_RE.findall(text)


# ---------------------------------------------------------------------------
# hash vocabulary: deterministic token ids so windows carry real
# input_ids/attention_mask columns (reference samples:
# /root/reference/src/data.py:238-249). Uncased, like the reference's
# biomedical BERT vocab; ids are process-independent (keyed blake2b,
# never Python hash()). A real subword tokenizer replaces token_id/encode
# without touching the window math.

# hash-vocab size: a real tokenizer's lookup table has no collisions, but a
# hash vocab does — at 2^30 slots the chance that any of ~30 single-token
# gazetteer surfaces collides with any of ~100k corpus words is ~0.3%,
# versus ~10% at a BERT-sized 32k vocab (a collision makes the ids-only
# backend tag a random word as an entity)
VOCAB_SIZE = 1 << 30
PAD_ID, CLS_ID, SEP_ID = 0, 1, 2
# entity-marker special tokens (reference adds them to the tokenizer,
# /root/reference/src/extractor/data.py:330-340)
S1_ID, E1_ID, S2_ID, E2_ID = 3, 4, 5, 6
MARKER_IDS = {"[s1]": S1_ID, "[e1]": E1_ID, "[s2]": S2_ID, "[e2]": E2_ID}
NUM_SPECIAL = 7

_id_memo: dict[str, int] = {}


def token_id(token: str) -> int:
    """Deterministic uncased vocab id for one token (memoized per process)."""
    t = token.lower()
    cached = _id_memo.get(t)
    if cached is not None:
        return cached
    m = MARKER_IDS.get(t)
    if m is not None:
        tid = m
    else:
        import hashlib
        h = hashlib.blake2b(t.encode("utf-8"), digest_size=4).digest()
        tid = NUM_SPECIAL + int.from_bytes(h, "little") % (
            VOCAB_SIZE - NUM_SPECIAL)
    if len(_id_memo) < 1_000_000:
        _id_memo[t] = tid
    return tid


def encode(text: str) -> list[int]:
    """Token ids of a text (no special tokens), mirroring
    `tokenizer(text, add_special_tokens=False).ids`."""
    return [token_id(t) for t in _TOKEN_RE.findall(text)]


# ---------------------------------------------------------------------------
# toy subword BPE tokenizer: proves the window/decode math is correct when a
# word splits into MULTIPLE subtokens (the reference's real tokenizer is
# subword — it consumes `.ids` + `.offsets`, /root/reference/src/data.py:
# 169-171). Pre-tokenization is the same word/punct/marker split as above;
# each word then goes through greedy merge-table BPE starting from single
# characters. Continuation pieces are id-hashed with a "##" prefix (BERT
# wordpiece convention) so "in" the word piece and "in" the whole word get
# distinct ids. Offsets are char spans of each PIECE in the original text —
# exactly what a HF fast tokenizer's offset mapping provides.

class ToyBPETokenizer:
    """Merge-table byte-pair tokenizer over the standard pre-token split.

    ``merges`` is an ordered list of (left, right) string pairs, highest
    priority first — the classic BPE merge table. Words not covered by any
    merge stay fully character-split (worst-case subwording), so EVERY
    multi-char word is a multi-token word under the default empty table.
    """

    def __init__(self, merges: list[tuple[str, str]] | None = None):
        self.ranks = {tuple(p): i for i, p in enumerate(merges or [])}

    def _bpe_word(self, word: str) -> list[str]:
        pieces = list(word)
        while len(pieces) > 1:
            best_rank, best_i = None, -1
            for i in range(len(pieces) - 1):
                r = self.ranks.get((pieces[i], pieces[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            pieces[best_i:best_i + 2] = [pieces[best_i] + pieces[best_i + 1]]
        return pieces

    def encode_with_offsets(
            self, text: str) -> tuple[list[int], list[tuple[int, int]]]:
        """(ids, char-span offsets), mirroring a HF fast tokenizer's
        ``.ids`` + ``.offsets`` with add_special_tokens=False."""
        ids: list[int] = []
        offs: list[tuple[int, int]] = []
        for m in _TOKEN_RE.finditer(text):
            s, e = m.span()
            surface = text[s:e].lower()
            if surface in MARKER_IDS:
                ids.append(MARKER_IDS[surface])
                offs.append((s, e))
                continue
            pos = s
            for k, piece in enumerate(self._bpe_word(surface)):
                ids.append(token_id(piece if k == 0 else "##" + piece))
                offs.append((pos, pos + len(piece)))
                pos += len(piece)
        return ids, offs


class HashWordTokenizer:
    """The default whole-word hash-vocab tokenizer behind the same
    ``encode_with_offsets`` interface (one token per word)."""

    def encode_with_offsets(
            self, text: str) -> tuple[list[int], list[tuple[int, int]]]:
        offs = tokenize_with_offsets(text)
        return [token_id(text[s:e]) for s, e in offs], offs
