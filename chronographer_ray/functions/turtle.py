"""Turtle export (S9) — canonical triples table → .ttl text.

The reference serializes an rdflib Graph (``generic_kb_to_ng.py:293``). We
emit N-Triples-style Turtle lines directly from the Arrow columns — a pure
batch kernel, so big graphs can stream through ``map_batches`` + a text
sink; ``export_turtle`` is the small-graph driver-side convenience.
"""
from __future__ import annotations

import pyarrow as pa


def _term(value: str) -> str:
    if value.startswith("http://") or value.startswith("https://"):
        return f"<{value}>"
    if value.startswith('"'):
        return value  # already a quoted literal form
    return '"' + value.replace("\\", "\\\\").replace('"', '\\"') + '"'


def turtle_lines(batch: pa.Table) -> pa.Table:
    lines = [
        f"{_term(s)} {_term(p)} {_term(o)} ."
        for s, p, o in zip(
            batch["subject"].to_pylist(),
            batch["predicate"].to_pylist(),
            batch["object"].to_pylist(),
        )
    ]
    return pa.table({"line": pa.array(lines, pa.string())})


def export_turtle(table: pa.Table, path: str) -> int:
    lines = turtle_lines(table)["line"].to_pylist()
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return len(lines)
