"""T1 — mention detection + entity linking over interleaved documents.

The reference uses spaCy + a DBpedia-Spotlight REST client loaded once per
process (``src/build_ng/dbpedia_spotlight.py:25-44``). Neither tool is
available here (no network, no models), so the linker is a DETERMINISTIC
dictionary matcher with the same execution shape: a callable class whose
``__init__`` does the expensive setup once per actor (resolve the broadcast
label→IRI map, compile the alternation pattern) and whose ``__call__``
processes one Arrow batch. Swapping in a real model changes only
``__init__``/``_link_text`` — the Ray plumbing (actor pool, batch size,
zero-copy spans) is the deliverable.

Per-row invariant: ``doc_id`` and ``spans`` pass through byte-identical —
the output table reuses the input columns and only APPENDS a ``mentions``
column. Tested by ``tests/test_spans_invariant.py``.
"""
from __future__ import annotations

import re

import pyarrow as pa

MENTION_TYPE = pa.struct(
    [
        ("surface", pa.string()),
        ("entity", pa.string()),
        ("span_idx", pa.int32()),
        ("start", pa.int32()),
    ]
)


class MentionLinker:
    def __init__(self, label_map, confidence: float = 0.7):
        """``label_map``: dict or ``ray.ObjectRef`` of surface form → IRI.

        Longest-first alternation so overlapping surface forms resolve to
        the most specific mention. At 10^12-doc scale the dictionary would
        be sharded into an Aho-Corasick automaton per actor; the actor-pool
        contract is identical.
        """
        import ray

        self.labels: dict[str, str] = (
            label_map if isinstance(label_map, dict) else ray.get(label_map)
        )
        self.confidence = confidence
        if self.labels:
            alternation = "|".join(
                re.escape(s) for s in sorted(self.labels, key=len, reverse=True)
            )
            self.pattern = re.compile(alternation)
        else:
            self.pattern = None

    def _link_text(self, text: str) -> list[tuple[str, str, int]]:
        if not self.pattern or not text:
            return []
        return [
            (m.group(0), self.labels[m.group(0)], m.start())
            for m in self.pattern.finditer(text)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch["spans"]
        mentions_per_doc: list[list[dict]] = []
        for doc_spans in spans_col.to_pylist():
            found: list[dict] = []
            for idx, span in enumerate(doc_spans or []):
                if span["kind"] != "text":
                    continue
                for surface, entity, start in self._link_text(span["text"]):
                    found.append(
                        {
                            "surface": surface,
                            "entity": entity,
                            "span_idx": idx,
                            "start": start,
                        }
                    )
            mentions_per_doc.append(found)
        # input columns are reused untouched (zero-copy) — span invariant
        return batch.append_column(
            "mentions", pa.array(mentions_per_doc, pa.list_(MENTION_TYPE))
        )


def mentions_to_edges(batch: pa.Table) -> pa.Table:
    """Flatten linked docs to ``(doc_id, entity)`` pairs — the input of the
    per-entity mention count (seed scoring) groupby."""
    doc_ids: list[str] = []
    entities: list[str] = []
    for doc_id, mentions in zip(
        batch["doc_id"].to_pylist(), batch["mentions"].to_pylist()
    ):
        for m in mentions or []:
            doc_ids.append(doc_id)
            entities.append(m["entity"])
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.string()), "entity": pa.array(entities, pa.string())}
    )
