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


def parse_turtle_line(line: str):
    """Inverse of :func:`turtle_lines` for the N-Triples subset this module
    emits: ``<iri>|"literal"`` terms separated by single spaces, trailing
    ``.``. Returns (s, p, o) with IRIs unwrapped and plain literals unquoted
    (typed/tagged literal forms that arrived quoted stay in their lexical
    form, matching the engine's string data model)."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    if line.endswith("."):
        line = line[:-1].rstrip()

    terms = []
    i = 0
    while i < len(line):
        ch = line[i]
        if ch == "<":
            j = line.index(">", i)
            terms.append(line[i + 1 : j])
            i = j + 1
        elif ch == '"':
            j = i + 1
            buf = []
            while j < len(line):
                if line[j] == "\\" and j + 1 < len(line):
                    buf.append(line[j + 1])
                    j += 2
                    continue
                if line[j] == '"':
                    break
                buf.append(line[j])
                j += 1
            rest = line[j + 1 :]
            if rest[:2] in ("^^", "@e", "@f") or (rest and not rest.startswith(" ")):
                # typed/tagged literal: keep the full lexical form as emitted
                k = rest.find(" ")
                tail = rest if k < 0 else rest[:k]
                terms.append('"' + "".join(buf) + '"' + tail)
                i = j + 1 + len(tail)
            else:
                terms.append("".join(buf))
                i = j + 1
        elif ch == " ":
            i += 1
        else:  # bare token (shouldn't occur in our output; take to next space)
            k = line.find(" ", i)
            k = len(line) if k < 0 else k
            terms.append(line[i:k])
            i = k
    if len(terms) != 3:
        raise ValueError(f"not a triple line: {line!r}")
    return tuple(terms)


def import_turtle(path: str) -> pa.Table:
    """S9 read side — .ttl (N-Triples subset) file → canonical triples
    table; round-trips :func:`export_turtle` exactly."""
    subs, preds, objs = [], [], []
    with open(path, encoding="utf-8") as f:
        for raw in f:
            t = parse_turtle_line(raw)
            if t is None:
                continue
            subs.append(t[0])
            preds.append(t[1])
            objs.append(t[2])
    return pa.table(
        {
            "subject": pa.array(subs, pa.string()),
            "predicate": pa.array(preds, pa.string()),
            "object": pa.array(objs, pa.string()),
        }
    )
