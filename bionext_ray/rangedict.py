"""Span-interval index with collision detection and envelope merge.

Semantics-equal rebuild of the reference's RangeDict
(/root/reference/src/utils.py:59-116): a dict keyed on every integer offset of
a span. Used per-document only (doc-local state, never crosses a shuffle), so
the O(span-length) footprint is bounded by the document size.
"""

from __future__ import annotations

from typing import Any


class RangeDict:
    def __init__(self) -> None:
        self.length = 0
        self.data: dict[int, Any] = {}

    def __getitem__(self, span: tuple) -> Any:
        return self.data[span[0]]

    def __setitem__(self, span: tuple, val: Any) -> None:
        assert span[0] < span[1]
        for i in range(span[0], span[1]):
            self.data[i] = val
        self.length += 1

    def __len__(self) -> int:
        return self.length

    def span_collision(self, span: tuple) -> tuple[int, list]:
        c = 0
        collided = []
        for i in range(span[0], span[1]):
            if i in self.data:
                c += 1
                collided.append(self.data[i])
        return c, collided

    def maybe_merge_annotations(self, annotation: dict) -> tuple[int, int] | None:
        """If `annotation` overlaps existing ones, return the envelope span
        (min start, max end) covering all of them (reference src/utils.py:88-100)."""
        c, collided = self.span_collision((annotation["start_span"], annotation["end_span"]))
        if c > 0:
            starts = [a["start_span"] for a in collided]
            ends = [a["end_span"] for a in collided]
            return (
                min(starts + [annotation["start_span"]]),
                max(ends + [annotation["end_span"]]),
            )
        return None

    def get_all_annotations(self) -> list:
        """Unique annotations by id, in first-offset insertion order
        (reference src/utils.py:102-111)."""
        seen = set()
        unique = []
        for ann in self.data.values():
            key = ann["id"] if "id" in ann else ann.get("ann_id")
            if key not in seen:
                seen.add(key)
                unique.append(ann)
        return unique

    def __contains__(self, span: tuple) -> bool:
        return (
            span[0] in self.data
            and span[1] - 1 in self.data
            and self.data[span[0]] == self.data[span[1] - 1]
        )


def merge_overlapping(annotations: list[dict], text: str) -> list[dict]:
    """Collision-merge a list of annotations (M1), mirroring the reference's
    training-data loading loop (/root/reference/src/data.py:139-167): each
    annotation that collides with already-indexed ones is replaced by a new
    envelope annotation over the union span.
    """
    rd = RangeDict()
    new_idx = 0
    for ann in annotations:
        new_span = rd.maybe_merge_annotations(ann)
        if new_span:
            new_idx += 1
            ann = {
                "id": f"NT{new_idx}",
                "start_span": new_span[0],
                "end_span": new_span[1],
                "text": text[new_span[0]:new_span[1]],
                "label": ann.get("label"),
            }
        rd[(ann["start_span"], ann["end_span"])] = ann
    return rd.get_all_annotations()
