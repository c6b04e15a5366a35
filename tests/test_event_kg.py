"""Stage-2 event-KG population semantics: SEM roles, direction swap,
temporal fill rule, inner-label-join drop, canonical output; A10 comparison."""
import pyarrow as pa
import pyarrow.compute as pc

from chronographer_ray.build_ng.compare import compare_graphs
from chronographer_ray.build_ng.event_kg import (
    RoleMapper,
    aggregate_temporal,
    build_event_kg,
    extract_events,
    temporal_candidates,
)
from chronographer_ray.config import (
    SEM_EVENT,
    SEM_HAS_ACTOR,
    SEM_HAS_BEGIN,
    SEM_HAS_END,
    SEM_HAS_PLACE,
    SEM_SUB_EVENT_OF,
)
from chronographer_ray.data.fixtures import make_search
from chronographer_ray.data.synth import E, SEED_EVENT


def _built():
    gs, side = make_search(iterations=8)
    sub = gs.run()
    kg = build_event_kg(
        sub, gs.store, side["domain"], side["range"], side["superclasses"],
        side["dates"][0], side["dates"][1],
    )
    return kg, sub, side


def test_every_event_typed_sem_event():
    kg, sub, _ = _built()
    events = set(extract_events(sub))
    typed = kg.filter(pc.equal(kg["object"], SEM_EVENT))
    assert set(typed["subject"].to_pylist()) == events


def test_role_triples_present():
    kg, _, _ = _built()
    preds = set(kg["predicate"].to_pylist())
    assert {SEM_HAS_ACTOR, SEM_HAS_PLACE, SEM_HAS_BEGIN, SEM_HAS_END, SEM_SUB_EVENT_OF} <= preds
    actors = kg.filter(pc.equal(kg["predicate"], SEM_HAS_ACTOR))
    assert (f"{E}Battle_0", f"{E}Person_0") in list(
        zip(actors["subject"].to_pylist(), actors["object"].to_pylist())
    )


def test_domain_role_swaps_direction():
    # domain(isPartOfMilitaryConflict)=Battle has no role word; construct a
    # synthetic case: pred with domain class named 'person' ⇒ emitted triple
    # must be (object, hasActor, subject)
    mapper = RoleMapper(
        domain_map={"p:hasCombatant": ["http://x/ontology/Person"]},
        range_map={},
        superclasses={},
        pred_labels={},
    )
    t = pa.table(
        {"subject": ["n:someone"], "predicate": ["p:hasCombatant"], "object": ["n:battle"]}
    )
    out = mapper.map_uri_batch(t)
    rows = list(zip(out["subject"].to_pylist(), out["predicate"].to_pylist(), out["object"].to_pylist()))
    assert ("n:battle", SEM_HAS_ACTOR, "n:someone") in rows


def test_label_substring_rule_emits():
    mapper = RoleMapper({}, {}, {}, pred_labels={"p:q": '"start time of event"@en'})
    t = pa.table({"subject": ["e"], "predicate": ["p:q"], "object": ["http://x"]})
    out = mapper.map_uri_batch(t)
    assert SEM_HAS_BEGIN in set(out["predicate"].to_pylist())


def test_temporal_fill_end_equals_begin():
    cands = pa.table(
        {"event": ["e1"], "role": ["bts"], "date": ["1790-01-01"]}
    )
    out = aggregate_temporal(cands, "1789-01-01", "1799-12-31")
    rows = dict(zip(out["predicate"].to_pylist(), out["object"].to_pylist()))
    assert rows[SEM_HAS_BEGIN] == "1790-01-01"
    assert rows[SEM_HAS_END] == "1790-01-01"


def test_temporal_end_without_begin_emits_nothing():
    cands = pa.table({"event": ["e1"], "role": ["ets"], "date": ["1790-01-01"]})
    assert aggregate_temporal(cands, "1789-01-01", "1799-12-31").num_rows == 0


def test_temporal_window_excludes_out_of_range():
    cands = pa.table(
        {"event": ["e1", "e1"], "role": ["bts", "bts"], "date": ["1688-01-01", "1790-05-05"]}
    )
    out = aggregate_temporal(cands, "1789-01-01", "1799-12-31")
    assert out.filter(pc.equal(out["predicate"], SEM_HAS_BEGIN))["object"].to_pylist() == [
        "1790-05-05"
    ]


def test_temporal_candidates_require_xsd_marker():
    t = pa.table(
        {
            "subject": ["e1", "e2"],
            "predicate": ["p:start", "p:start"],
            "object": [
                '"1790-01-01"^^<http://www.w3.org/2001/XMLSchema#date>',
                "1790-01-01",  # already-normalized plain string: not re-parsed
            ],
        }
    )
    out = temporal_candidates(t, {"p:start": '"start time"@en'})
    assert out["event"].to_pylist() == ["e1"]


def test_label_less_predicates_dropped():
    # PRED_SIGNIFICANT has no rdfs:label in the synth KG and its range class
    # name ('battle') is not a role word → contributes nothing (J7 inner join)
    kg, _, _ = _built()
    subs = kg.filter(pc.equal(kg["predicate"], SEM_SUB_EVENT_OF))
    assert all(o == SEED_EVENT for o in subs["object"].to_pylist())


def test_canonical_output_sorted_and_unique():
    kg, _, _ = _built()
    rows = list(zip(kg["subject"].to_pylist(), kg["predicate"].to_pylist(), kg["object"].to_pylist()))
    assert rows == sorted(rows)
    assert len(rows) == len(set(rows))


def test_compare_graphs_self_is_perfect():
    kg, _, _ = _built()
    out = compare_graphs(kg, kg)
    assert out["metrics"]["all"]["precision"] == 100.0
    assert out["metrics"]["all"]["recall"] == 100.0


def test_compare_graphs_counts():
    a = pa.table(
        {
            "subject": ["e", "e"],
            "predicate": [SEM_HAS_ACTOR, SEM_HAS_PLACE],
            "object": ["x", "y"],
        }
    )
    b = pa.table(
        {"subject": ["e"], "predicate": [SEM_HAS_ACTOR], "object": ["x"]}
    )
    out = compare_graphs(a, b)
    nums = out["numbers"]["all"]
    assert nums == {"triples_common": 1, "triples_search_only": 1, "triples_gs_only": 0}


def test_eventkg_gold_seven_projections():
    """S12 — the 7 EventKG CONSTRUCT facets as Arrow projections."""
    import pyarrow as pa

    from chronographer_ray.build_ng.eventkg_gold import gold_event_kg
    from chronographer_ray.config import (
        RDF_TYPE,
        SEM_EVENT,
        SEM_HAS_ACTOR,
        SEM_HAS_BEGIN,
        SEM_HAS_END,
        SEM_HAS_PLACE,
        SEM_SUB_EVENT_OF,
    )

    same_as = pa.table(
        {
            "node": ["ek:e1", "ek:e2", "ek:p1", "ek:a1"],
            "kb_iri": ["ex:Rev", "ex:Battle", "ex:Paris", "ex:Napoleon"],
        }
    )
    facts = pa.table(
        {
            "s": ["ek:e1", "ek:e1", "ek:e1", "ek:e2", "ek:a1",
                  "ek:e1"],
            "p": [SEM_HAS_PLACE, SEM_HAS_BEGIN, SEM_HAS_END,
                  SEM_SUB_EVENT_OF, RDF_TYPE,
                  "http://semanticweb.cs.vu.nl/2009/11/sem/hasSubEvent"],
            "o": ["ek:p1", "1789-01-01", "1799-12-31", "ek:e1",
                  "http://semanticweb.cs.vu.nl/2009/11/sem/Actor", "ek:e2"],
        }
    )
    relations = pa.table({"rel": ["r1"], "subject": ["ek:e1"], "object": ["ek:a1"]})

    out = gold_event_kg(["ex:Rev", "ex:Battle", "ex:Unknown"], same_as, facts, relations)
    triples = set(
        zip(out["subject"].to_pylist(), out["predicate"].to_pylist(),
            out["object"].to_pylist())
    )
    assert ("ex:Rev", RDF_TYPE, SEM_EVENT) in triples
    assert ("ex:Battle", RDF_TYPE, SEM_EVENT) in triples
    assert ("ex:Rev", SEM_HAS_PLACE, "ex:Paris") in triples
    assert ("ex:Rev", SEM_HAS_BEGIN, "1789-01-01") in triples
    assert ("ex:Rev", SEM_HAS_END, "1799-12-31") in triples
    assert ("ex:Rev", SEM_HAS_ACTOR, "ex:Napoleon") in triples
    assert ("ex:Battle", SEM_SUB_EVENT_OF, "ex:Rev") in triples
    # no triples for the unresolvable event
    assert not any(s == "ex:Unknown" for s, _, _ in triples)
    # kb_filter drops non-matching actors/sub-events
    filtered = gold_event_kg(["ex:Rev"], same_as, facts, relations, kb_filter="Nap")
    trip2 = set(zip(filtered["subject"].to_pylist(), filtered["predicate"].to_pylist(),
                    filtered["object"].to_pylist()))
    assert ("ex:Rev", SEM_HAS_ACTOR, "ex:Napoleon") in trip2
    assert not any(p == SEM_SUB_EVENT_OF for _, p, _ in trip2)
