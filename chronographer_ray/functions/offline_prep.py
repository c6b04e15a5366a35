"""Offline side-table prep jobs: domain/range maps, YAGO union-of parsing,
redirect referents, Wikidata property-constraint chains.

The reference pre-extracts these as JSON dicts in single-process scripts
(``src/extract_domain_range.py``, ``src/get_equivalent_url.py``); here they
are batch jobs over the triples table — `map_batches` projections plus
chained hash semi-joins — whose small dict outputs are then broadcast with
``ray.put`` into the online stages (SURVEY.md S6, M19, J10, J11).
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_SHORT_TO_PREFIX = {
    "schema": "http://schema.org/",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


def parse_yago_union_of(value: str) -> list[str]:
    """M19 — YAGO encodes multi-class domain/range as ONE blank-node string
    ``_:schema-<id>-rdfs-domain-owl-unionOf-schema-<c1>-...-xsd-<cn>``;
    non-blank values pass through as singletons
    (``src/extract_domain_range.py:63-90``)."""
    if not value.startswith("_:"):
        return [value]
    parts = value.split("owl-unionOf-")[1].split("-")
    return [
        f"{_SHORT_TO_PREFIX[parts[2 * i]]}{parts[2 * i + 1]}"
        for i in range(len(parts) // 2)
    ]


def yago_union_of_batch(batch: pa.Table, column: str = "object") -> pa.Table:
    """Vectorized M19 over a triples batch: replaces ``column`` with a
    ``list<string>`` column of parsed class URIs."""
    parsed = [parse_yago_union_of(v) for v in batch[column].to_pylist()]
    idx = batch.schema.get_field_index(column)
    return batch.set_column(idx, column, pa.array(parsed, pa.list_(pa.string())))


def extract_domain_range(triples: pa.Table, domain_pred: str, range_pred: str,
                         yago: bool = False) -> tuple[dict, dict]:
    """S6/M19 — predicate → [domain classes], predicate → [range classes]
    from ``rdfs:domain`` / ``rdfs:range`` triples. The reference keeps only
    the LAST value per predicate ({x[0]: [x[2]]} dict build,
    ``src/extract_domain_range.py:93-101``); replicated here."""
    def one(pred: str) -> dict[str, list[str]]:
        t = triples.filter(pc.equal(triples["predicate"], pred))
        out: dict[str, list[str]] = {}
        for s, o in zip(t["subject"].to_pylist(), t["object"].to_pylist()):
            out[s] = parse_yago_union_of(o) if yago else [o]
        return out

    return one(domain_pred), one(range_pred)


def build_referents(gold_uris, triples: pa.Table,
                    redirect_pred: str = "http://dbpedia.org/ontology/wikiPageRedirects",
                    ) -> dict[str, str]:
    """J10 — referents map old-URI → canonical gold URI via inverse
    wikiPageRedirects lookup (``src/get_equivalent_url.py:13-40``): every
    gold URI maps to itself, and every subject that redirects TO a gold URI
    maps to that URI. One OPS semi-join instead of a per-URI request loop."""
    gold = list(dict.fromkeys(gold_uris))
    referents = {u: u for u in gold}
    red = triples.filter(
        pc.and_(
            pc.equal(triples["predicate"], redirect_pred),
            pc.is_in(triples["object"], value_set=pa.array(gold, pa.string())),
        )
    )
    for s, o in zip(red["subject"].to_pylist(), red["object"].to_pylist()):
        referents[s] = o
    return referents


def wikidata_constraint_classes(
    triples: pa.Table,
    constraint_direct_pred: str,
    constraint_target: str,
    constraint_prop_pred: str,
    class_qualifier_pred: str,
) -> dict[str, list[str]]:
    """J11 — the 3-step Wikidata property-constraint chain
    (``src/extract_domain_range.py:103-134``):

      1. predicates with ``P2302-direct = <subject|value-type constraint>``
      2. predicate --P2302(prop)--> constraint statement nodes
      3. statement --P2308(qualifier)--> class URIs

    Expressed as chained hash semi-joins; returns pred → sorted class list
    (the reference's set() makes order unspecified — we sort for
    determinism)."""
    preds = triples.filter(
        pc.and_(
            pc.equal(triples["predicate"], constraint_direct_pred),
            pc.equal(triples["object"], constraint_target),
        )
    )["subject"]
    pred_set = pa.array(sorted(set(preds.to_pylist())), pa.string())

    stmts = triples.filter(
        pc.and_(
            pc.equal(triples["predicate"], constraint_prop_pred),
            pc.is_in(triples["subject"], value_set=pred_set),
        )
    )
    pred_to_stmt: dict[str, list[str]] = {}
    for s, o in zip(stmts["subject"].to_pylist(), stmts["object"].to_pylist()):
        pred_to_stmt.setdefault(s, []).append(o)

    all_stmts = pa.array(sorted({o for v in pred_to_stmt.values() for o in v}),
                         pa.string())
    quals = triples.filter(
        pc.and_(
            pc.equal(triples["predicate"], class_qualifier_pred),
            pc.is_in(triples["subject"], value_set=all_stmts),
        )
    )
    stmt_to_cls: dict[str, list[str]] = {}
    for s, o in zip(quals["subject"].to_pylist(), quals["object"].to_pylist()):
        stmt_to_cls.setdefault(s, []).append(o)

    return {
        pred: sorted({c for st in sts for c in stmt_to_cls.get(st, [])})
        for pred, sts in pred_to_stmt.items()
    }


def constraint_chain_dataset(
    triples_ds,
    constraint_direct_pred: str,
    constraint_target: str,
    constraint_prop_pred: str,
    class_qualifier_pred: str,
    num_partitions: int = 8,
):
    """J11 scale path — the same 3-step chain as
    :func:`wikidata_constraint_classes`, expressed as DISTRIBUTED hash joins
    (``Dataset.join``) so no side is collected to the driver. Returns a lazy
    Dataset of distinct ``(pred, class)`` rows."""
    import pyarrow as pa  # noqa: F811 — local for worker serialization

    def pick(pred: str, s_name: str, o_name: str, obj: str | None = None):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.equal(b["predicate"], pred)
            if obj is not None:
                m = pc.and_(m, pc.equal(b["object"], obj))
            t = b.filter(m)
            return pa.table({s_name: t["subject"], o_name: t["object"]})

        return fn

    preds = triples_ds.map_batches(
        pick(constraint_direct_pred, "pred", "_drop", constraint_target),
        batch_format="pyarrow",
    ).select_columns(["pred"])
    stmts = triples_ds.map_batches(
        pick(constraint_prop_pred, "pred_s", "stmt"), batch_format="pyarrow"
    )
    quals = triples_ds.map_batches(
        pick(class_qualifier_pred, "stmt_q", "cls"), batch_format="pyarrow"
    )

    chained = preds.join(
        stmts, join_type="inner", num_partitions=num_partitions,
        on=("pred",), right_on=("pred_s",),
    ).join(
        quals, join_type="inner", num_partitions=num_partitions,
        on=("stmt",), right_on=("stmt_q",),
    )
    out = chained.select_columns(["pred", "cls"])
    from ray.data.aggregate import Count

    return (
        out.groupby(["pred", "cls"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
