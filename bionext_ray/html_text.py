"""HTML -> text extraction with a locked byte-identity rule.

The reference consumes BioC documents whose text is always rebuilt as
`passages[0].text + ' ' + passages[1].text` (title + single space + abstract,
/root/reference/src/data.py:34). For web pages the rebuild maps: title
passage := content of the first <title> element; abstract passage := the
text of every <p> element joined with a single space; extracted text :=
title + ' ' + abstract. This per-url rule is the `input_hint` byte-identity
invariant — it is hash-tested in pytest and exposed in __ray_entry__ with a
SQL oracle.

Pure function over strings/bytes; runs vectorized-per-batch inside
map_batches (no per-row Python in the driver).
"""

from __future__ import annotations

from html.parser import HTMLParser


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.paras: list[str] = []
        self._cur: list[str] | None = None
        self._in_title = False
        self._title_done = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "title" and not self._title_done:
            self._in_title = True
        elif tag == "p":
            self._cur = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "title" and self._in_title:
            self._in_title = False
            self._title_done = True
        elif tag == "p" and self._cur is not None:
            self.paras.append("".join(self._cur))
            self._cur = None

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self.title_parts.append(data)
        elif self._cur is not None:
            self._cur.append(data)


def extract_text(html: bytes | str) -> tuple[str, int]:
    """Return (extracted_text, title_len).

    ``title_len`` is the char offset where the abstract passage starts
    (reference: doc["passages"][1]["offset"], used for passage routing at
    /root/reference/src/tagger/__init__.py:113-118): len(title) + 1 for the
    joining space.
    """
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    title = "".join(p.title_parts)
    abstract = " ".join(p.paras)
    return title + " " + abstract, len(title) + 1


def page_text(html, text) -> tuple[str, int]:
    """Per-row rule for the `pages` table: pass through a pre-extracted
    ``text`` when present, else extract from ``html``. ``title_len`` for
    pass-through rows is 0 (whole text treated as one passage). A row with
    neither (malformed crawl record) yields empty text rather than failing
    the task — at scale one bad row must not kill a block."""
    if text is not None:
        return text, 0
    if html is None:
        return "", 0
    return extract_text(html)
