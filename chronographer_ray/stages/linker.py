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
        """Works on the FLATTENED span struct children (kind/text arrays +
        list offsets) rather than ``to_pylist`` of the nested column — the
        nested materialization was the allocator-bound hot spot under high
        worker counts. The input columns are reused untouched (zero-copy) —
        span invariant."""
        spans_col = batch["spans"]
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        offs = spans_col.offsets.to_pylist()
        base = offs[0]
        values = spans_col.flatten()
        kinds = values.field("kind").to_pylist()
        texts = values.field("text").to_pylist()

        m_surface: list[str] = []
        m_entity: list[str] = []
        m_span: list[int] = []
        m_start: list[int] = []
        m_offsets: list[int] = [0]
        link = self._link_text  # the ONLY model coupling — adapters
        # override __init__ (model load) + _link_text (model call); the
        # batch walk below is model-agnostic (conformance-tested)
        for i in range(batch.num_rows):
            lo, hi = offs[i] - base, offs[i + 1] - base
            for j in range(lo, hi):
                if kinds[j] != "text":
                    continue
                t = texts[j]
                if not t:
                    continue
                for surface, entity, start in link(t):
                    m_surface.append(surface)
                    m_entity.append(entity)
                    m_span.append(j - lo)
                    m_start.append(start)
            m_offsets.append(len(m_surface))

        struct = pa.StructArray.from_arrays(
            [
                pa.array(m_surface, pa.string()),
                pa.array(m_entity, pa.string()),
                pa.array(m_span, pa.int32()),
                pa.array(m_start, pa.int32()),
            ],
            names=["surface", "entity", "span_idx", "start"],
        )
        mentions = pa.ListArray.from_arrays(pa.array(m_offsets, pa.int32()), struct)
        return batch.append_column("mentions", mentions)


def mentions_to_edges(batch: pa.Table) -> pa.Table:
    """Flatten linked docs to ``(doc_id, entity)`` pairs — the input of the
    per-entity mention count (seed scoring) groupby. Fully vectorized:
    ``list_parent_indices`` + ``take`` instead of a Python row loop."""
    import pyarrow.compute as pc

    m = batch["mentions"]
    if isinstance(m, pa.ChunkedArray):
        m = m.combine_chunks()
    parent = pc.list_parent_indices(m)
    doc_ids = pc.take(batch["doc_id"], parent)
    entities = m.flatten().field("entity")
    return pa.table({"doc_id": doc_ids, "entity": entities})
