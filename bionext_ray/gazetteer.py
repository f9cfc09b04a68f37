"""Surrogate NER "model": leftmost-longest gazetteer matcher.

Deterministic, CPU-only stand-in for the reference's BioLinkBERT+CRF tagger
(/root/reference/src/tagger/model/modeling_bionexttagger.py). The interface is
the one a transformer would have — per-window BIO label sequences over token
offsets — so a real model slots into the same actor. Matching is
case-insensitive, word-bounded, leftmost-longest (regex alternation sorted by
length, non-overlapping), compiled ONCE per actor.
"""

from __future__ import annotations

import re


class GazetteerMatcher:
    def __init__(self, gazetteer: dict[str, str]):
        """gazetteer: surface -> entity type label. Keys are normalized to
        lowercase here so a mixed-case gazetteer works instead of raising
        KeyError at match time (matching is IGNORECASE, and the label lookup
        uses m.group(0).lower())."""
        self.gazetteer = {k.lower(): v for k, v in gazetteer.items()}
        surfaces = sorted(self.gazetteer, key=len, reverse=True)
        alts = "|".join(re.escape(s) for s in surfaces)
        # IGNORECASE|ASCII instead of text.lower(): identical matches for
        # ASCII surfaces without allocating a lowered copy of every
        # document. ASCII restricts case folding to ASCII letters — without
        # it, Unicode folding lets e.g. U+017F LONG S match 's' and the
        # dict lookup below would KeyError (and the old lowered-text
        # variant was itself unsafe: str.lower() can CHANGE STRING LENGTH
        # for some codepoints, silently shifting every span).
        self._re = re.compile(rf"(?<![a-z0-9])(?:{alts})(?![a-z0-9])",
                              re.IGNORECASE | re.ASCII)

    def find_spans(self, text: str) -> list[tuple[int, int, str]]:
        """All non-overlapping matches as (start, end, lowered surface)
        tuples — the allocation-light form the hot tagger path consumes
        (the full annotation dicts of ``find_mentions`` cost more to build
        than the regex scan itself at corpus scale)."""
        return [(m.start(), m.end(), m.group(0).lower())
                for m in self._re.finditer(text)]

    def find_mentions(self, text: str) -> list[dict]:
        """All non-overlapping matches as annotation dicts with absolute char
        spans — the shape the tagger decoder emits
        (/root/reference/src/tagger/__init__.py:122-135)."""
        out = []
        for i, (s, e, low) in enumerate(self.find_spans(text)):
            out.append({
                "id": str(i),
                "label": self.gazetteer[low],
                "text": text[s:e],
                "start_span": s,
                "end_span": e,
            })
        return out
