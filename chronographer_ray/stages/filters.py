"""Vectorized Arrow kernels for triple filtering / normalization (M1-M10).

Each kernel is a pure ``pyarrow.Table -> pyarrow.Table`` function so the same
code runs (a) directly on small driver-side tables inside the frontier loop
and (b) inside ``Dataset.map_batches(fn, batch_format="pyarrow")`` at scale —
zero-copy from the Ray object store, no Python-per-row loops.

Semantics follow the reference (cited per function); implementation is new.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TRIPLE_SCHEMA = pa.schema(
    [("subject", pa.string()), ("predicate", pa.string()), ("object", pa.string())]
)

XSD_DATE_MARKERS = (
    "<http://www.w3.org/2001/XMLSchema#date>",
    "<http://www.w3.org/2001/XMLSchema#dateTime>",
)
XSD_INT_MARKER = "<http://www.w3.org/2001/XMLSchema#integer>"


def empty_triples(extra_cols: dict[str, pa.DataType] | None = None) -> pa.Table:
    """An empty (subject, predicate, object [, extra]) table."""
    schema = TRIPLE_SCHEMA
    for name, typ in (extra_cols or {}).items():
        schema = schema.append(pa.field(name, typ))
    return schema.empty_table()


def filter_predicates(t: pa.Table, preds: list[str], keep: bool) -> pa.Table:
    """M1 — keep rows with predicate ∈ preds (keep=True) or ∉ preds.

    Reference semantics: ``src/interface.py:44-50``.
    """
    if not preds:
        return t if not keep else t.slice(0, 0)
    mask = pc.is_in(t["predicate"], value_set=pa.array(preds, pa.string()))
    if not keep:
        mask = pc.invert(mask)
    return t.filter(mask)


def _ns_ok(col: pa.ChunkedArray | pa.Array, start_uri: str) -> pa.ChunkedArray:
    """True where node is in-namespace or is a literal (not http/quote-prefixed).

    Reference semantics: ``src/interface.py:74-84``.
    """
    in_ns = pc.starts_with(col, pattern=start_uri)
    is_uri_or_quoted = pc.or_(
        pc.starts_with(col, pattern="http"), pc.starts_with(col, pattern='"')
    )
    return pc.or_(in_ns, pc.invert(is_uri_or_quoted))


def filter_namespace(t: pa.Table, start_uri: str) -> pa.Table:
    """M2 — keep rows whose subject AND object pass the namespace test."""
    if not start_uri:
        return t
    return t.filter(pc.and_(_ns_ok(t["subject"], start_uri), _ns_ok(t["object"], start_uri)))


def filter_node_patterns(t: pa.Table, filter_out: list[str]) -> pa.Table:
    """M3 — drop rows where subject or object starts with any filtered prefix,
    or object ends with ``.svg``. Reference semantics: ``src/interface.py:100-110``.
    """
    bad = pc.ends_with(t["object"], pattern=".svg")
    for prefix in filter_out:
        bad = pc.or_(bad, pc.starts_with(t["subject"], pattern=prefix))
        bad = pc.or_(bad, pc.starts_with(t["object"], pattern=prefix))
    return t.filter(pc.invert(bad))


def normalize_date_literals(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """M4 — truncate typed literal lexical forms to comparable date strings.

    ``"1789-07-14"^^<...XMLSchema#date>`` / ``#dateTime`` → chars [1:11]
    (``YYYY-MM-DD``); ``"1789"^^<...#integer>`` → chars [1:5] (``YYYY``);
    everything else unchanged. String (lexicographic) date order is the
    engine-wide date semantics — identical to the reference
    (``src/interface.py:86-98``); do NOT convert to timestamps.
    """
    if pa.types.is_null(col.type):  # empty/all-null batches reach kernels too
        col = pc.cast(col, pa.string())
    is_date = pc.match_substring(col, pattern=XSD_DATE_MARKERS[0])
    for m in XSD_DATE_MARKERS[1:]:
        is_date = pc.or_(is_date, pc.match_substring(col, pattern=m))
    is_int = pc.match_substring(col, pattern=XSD_INT_MARKER)
    out = pc.if_else(is_date, pc.utf8_slice_codeunits(col, 1, 11), col)
    out = pc.if_else(is_int, pc.utf8_slice_codeunits(col, 1, 5), out)
    return out


def filter_invalid_literals_and_normalize(t: pa.Table) -> pa.Table:
    """M5 — drop ``"Unknown"@`` objects then normalize date literals (M4).

    Reference semantics: ``src/interface.py:112-117``.
    """
    t = t.filter(pc.invert(pc.equal(t["object"], '"Unknown"@')))
    return t.set_column(
        t.schema.get_field_index("object"), "object", normalize_date_literals(t["object"])
    )


def keep_uri_objects(t: pa.Table) -> pa.Table:
    """M12 — drop rows whose object is a literal (keep ``http://``-prefixed
    objects). Present-but-disabled in the reference
    (``src/ordering.py:176-181``); exposed here as part of the op surface."""
    return t.filter(pc.starts_with(t["object"], "http://"))


def tag_type_df(t: pa.Table, type_df: str) -> pa.Table:
    """M6 (part 1) — append the constant ``type_df`` provenance column."""
    return t.append_column("type_df", pa.array([type_df] * t.num_rows, pa.string()))


def dedup_exact(t: pa.Table, keys: list[str] | None = None) -> pa.Table:
    """M6/D1 — exact dedup on key columns, keeping the FIRST occurrence.

    In-memory variant (one batch / small table). At scale use
    :func:`chronographer_ray.stages.dedup.exact_dedup_dataset` (salted
    two-stage groupby shuffle).
    """
    keys = keys or [c for c in t.column_names]
    if t.num_rows == 0:
        return t
    df = t.to_pandas()
    return pa.Table.from_pandas(df.drop_duplicates(subset=keys), preserve_index=False, schema=t.schema)


def is_in_filter(t: pa.Table, column: str, values: set[str] | list[str], keep: bool) -> pa.Table:
    """Semi/anti join of a table against a broadcast value set (J3/J4 building block)."""
    values = list(values)
    if not values:
        return t if not keep else t.slice(0, 0)
    mask = pc.is_in(t[column], value_set=pa.array(values, pa.string()))
    if not keep:
        mask = pc.invert(mask)
    return t.filter(mask)


def unique_strings(t: pa.Table, column: str) -> list[str]:
    """Distinct values of a string column, order of first appearance."""
    if t.num_rows == 0:
        return []
    seen: dict[str, None] = dict.fromkeys(t[column].to_pylist())
    return [s for s in seen if s is not None]
