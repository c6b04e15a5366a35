"""Deterministic synthetic corpora (fixed seed, no external data).

Two families, per FIXTURES.md:

1. ``synth_kg()`` — a mini generic KG exercising every stage-1/stage-2
   operator: a seed event with a dominant ingoing predicate, typed
   sub-events/people/places, in/out-of-window dates, year-in-IRI nodes,
   label-carrying and label-less predicates, drop-rule literals
   (``"Unknown"@``, ``.svg``, ``Category:``), and one hub entity with ~100×
   median degree (skew / salting tests).

2. ``synth_documents()`` — the graft's input table: interleaved text+media
   documents ``(doc_id: string, spans: list<struct<kind, text, media_ref,
   offset>>)`` whose text spans embed entity mention surface forms drawn
   from the KG labels. A few hub documents mention the seed entity.

Everything is pure-function deterministic: same seed → byte-identical
tables.
"""
from __future__ import annotations

import random

import pyarrow as pa

E = "http://ex.org/resource/"
O = "http://ex.org/ontology/"
P = "http://ex.org/property/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
XSD_DATE = "<http://www.w3.org/2001/XMLSchema#date>"

SEED_EVENT = E + "Great_Revolution"
CLS_EVENT = O + "Event"
CLS_SOCIETAL = O + "SocietalEvent"
CLS_CONFLICT = O + "MilitaryConflict"
CLS_BATTLE = O + "Battle"
CLS_PLACE = O + "Place"
CLS_PERSON = O + "Person"
CLS_COUNTRY = O + "Country"

PRED_PART_OF = P + "isPartOfMilitaryConflict"
PRED_RELATED = P + "relatedTo"
PRED_COMMANDER = P + "commander"
PRED_PLACE = P + "place"
PRED_START = P + "startDate"
PRED_END = P + "endDate"
PRED_DATE = P + "date"
PRED_BIRTH = P + "birthDate"
PRED_DEATH = P + "deathDate"
PRED_MENTIONS = P + "mentions"
PRED_HAS_PART = P + "hasPart"
PRED_SIGNIFICANT = P + "significantEvent"  # label-less on purpose

WINDOW = ("1789-01-01", "1799-12-31")


def date_lit(d: str) -> str:
    return f'"{d}"^^{XSD_DATE}'


def synth_kg(n_battles: int = 15, n_offwindow: int = 5, hub_degree: int = 100, seed: int = 42):
    """Returns (triples: pa.Table, side: dict of broadcast maps/lists)."""
    rng = random.Random(seed)
    rows: list[tuple[str, str, str]] = []

    def add(s: str, p: str, o: str) -> None:
        rows.append((s, p, o))

    # seed event
    add(SEED_EVENT, RDF_TYPE, CLS_CONFLICT)
    add(SEED_EVENT, PRED_START, date_lit(WINDOW[0]))
    add(SEED_EVENT, PRED_END, date_lit(WINDOW[1]))
    add(SEED_EVENT, RDFS_LABEL, '"Great Revolution"@en')

    battles = [f"{E}Battle_{i}" for i in range(n_battles)]
    people = [f"{E}Person_{i}" for i in range(n_battles)]
    places = [f"{E}Place_{i}" for i in range(max(3, n_battles // 3))]
    gold = [SEED_EVENT]

    for i, b in enumerate(battles):
        add(b, PRED_PART_OF, SEED_EVENT)  # dominant ingoing predicate
        add(b, RDF_TYPE, CLS_BATTLE)
        d0 = f"17{89 + i % 10}-0{1 + i % 9}-0{1 + i % 9}"
        add(b, PRED_START, date_lit(d0))
        add(b, PRED_END, date_lit(f"17{89 + i % 10}-1{i % 2}-28"))
        add(b, PRED_COMMANDER, people[i])
        add(b, PRED_PLACE, places[i % len(places)])
        add(b, RDFS_LABEL, f'"Battle of Site {i}"@en')
        gold.append(b)

    # minority ingoing predicate edges
    for i in range(max(2, n_battles // 5)):
        add(f"{E}Pamphlet_{i}", PRED_RELATED, SEED_EVENT)
        add(f"{E}Pamphlet_{i}", RDF_TYPE, O + "Document")
        add(f"{E}Pamphlet_{i}", PRED_DATE, date_lit(f"1792-0{1 + i % 9}-15"))

    # out-of-window events (WHEN temporal filter)
    for i in range(n_offwindow):
        n = f"{E}Later_Battle_{i}"
        add(n, PRED_PART_OF, SEED_EVENT)
        add(n, RDF_TYPE, CLS_BATTLE)
        add(n, PRED_START, date_lit(f"18{10 + i}-01-01"))
        add(n, PRED_END, date_lit(f"18{10 + i}-06-01"))

    # year-in-IRI nodes outside the window (WHEN regex filter)
    for i in range(3):
        n = f"{E}{1810 + i}_Commemoration"
        add(n, PRED_RELATED, SEED_EVENT)
        add(n, RDF_TYPE, O + "Document")
        add(n, PRED_DATE, date_lit(f"{1810 + i}-07-14"))

    # typed people / places (WHO & WHERE filters)
    for i, ppl in enumerate(people):
        add(ppl, RDF_TYPE, CLS_PERSON)
        add(ppl, PRED_BIRTH, date_lit(f"17{40 + i % 30}-01-01"))
        add(ppl, RDFS_LABEL, f'"General {i}"@en')
    for i, pl in enumerate(places):
        add(pl, RDF_TYPE, CLS_PLACE)
        add(pl, RDFS_LABEL, f'"Site {i}"@en')

    # drop-rule fodder
    add(SEED_EVENT, P + "flag", E + "flag_image.svg")
    add(SEED_EVENT, P + "status", '"Unknown"@')
    add(E + "Category:Revolutions", PRED_RELATED, SEED_EVENT)

    # sub-event structure for part_of role rules
    add(SEED_EVENT, PRED_HAS_PART, battles[0])
    add(battles[0], PRED_SIGNIFICANT, battles[1] if len(battles) > 1 else battles[0])

    # hub entity: ~hub_degree ingoing edges (skew)
    hub = E + "Hub_Entity"
    add(hub, RDF_TYPE, CLS_PERSON)
    for i in range(hub_degree):
        add(f"{E}Misc_{i}", PRED_MENTIONS, hub)

    # predicate labels (some predicates deliberately label-less)
    add(PRED_COMMANDER, RDFS_LABEL, '"commander"@en')
    add(PRED_PLACE, RDFS_LABEL, '"place"@en')
    add(PRED_START, RDFS_LABEL, '"start time"@en')
    add(PRED_END, RDFS_LABEL, '"end time"@en')
    add(PRED_PART_OF, RDFS_LABEL, '"part of"@en')
    add(PRED_HAS_PART, RDFS_LABEL, '"has part"@en')
    add(PRED_DATE, RDFS_LABEL, '"date"@en')

    rng.shuffle(rows)  # storage order must not matter to any operator
    triples = pa.table(
        {
            "subject": [r[0] for r in rows],
            "predicate": [r[1] for r in rows],
            "object": [r[2] for r in rows],
        }
    )

    side = {
        "domain": {
            PRED_PART_OF: [CLS_BATTLE],
            PRED_RELATED: [O + "Document"],
            PRED_MENTIONS: [O + "Document"],
        },
        "range": {
            PRED_COMMANDER: [CLS_PERSON],
            PRED_PLACE: [CLS_PLACE],
            PRED_HAS_PART: [CLS_BATTLE],
            PRED_SIGNIFICANT: [CLS_BATTLE],
        },
        "superclasses": {
            CLS_BATTLE: [CLS_CONFLICT, CLS_SOCIETAL, CLS_EVENT],
            CLS_CONFLICT: [CLS_SOCIETAL, CLS_EVENT],
            CLS_SOCIETAL: [CLS_EVENT],
            CLS_PLACE: [O + "Location"],
            CLS_PERSON: [O + "Agent"],
        },
        "gold_events": gold,
        "referents": {f"{E}Battle_of_Site_{i}": battles[i] for i in range(min(3, n_battles))},
        "dates": list(WINDOW),
        "seed_event": SEED_EVENT,
        "target": [("event", CLS_EVENT)],
        "places": [CLS_PLACE, O + "Location"],
        "person": [CLS_PERSON],
        "point_in_time": [PRED_DATE],
        "start_dates": [PRED_START, PRED_BIRTH],
        "end_dates": [PRED_END, PRED_DEATH],
        "predicate_filter": [RDFS_LABEL, P + "flag", P + "status"],
        "filter_out_prefixes": [E + "Category:"],
        "start_uri": "http://ex.org",
    }
    return triples, side


SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOC_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])

_FILLER = (
    "the assembly gathered at dawn",
    "witnesses described the scene",
    "archives record the proceedings",
    "historians debate the outcome",
    "the council issued a decree",
    "crowds filled the streets",
)


def synth_documents(n_docs: int = 1000, seed: int = 42, hub_every: int = 50) -> pa.Table:
    """Interleaved text+media corpus; every ``hub_every``-th doc mentions the
    seed entity (hub skew). Labels mentioned come from :func:`synth_kg`."""
    rng = random.Random(seed)
    _, side = synth_kg()
    labels = [f"Battle of Site {i}" for i in range(15)] + [f"General {i}" for i in range(15)]

    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    for d in range(n_docs):
        n_spans = rng.randint(1, 16)
        spans: list[dict] = []
        offset = 0
        for s in range(n_spans):
            kind = rng.choices(
                ["text", "image", "audio", "video"], weights=[8, 2, 1, 1], k=1
            )[0]
            if kind == "text":
                words = [rng.choice(_FILLER)]
                if rng.random() < 0.5:
                    words.append(rng.choice(labels))
                if d % hub_every == 0:
                    words.append("Great Revolution")
                text = " ".join(words) + "."
                spans.append(
                    {"kind": "text", "text": text, "media_ref": "", "offset": offset}
                )
                offset += len(text)
            else:
                ref = f"mem://media/{kind}-{d:06d}-{s:02d}"
                spans.append({"kind": kind, "text": "", "media_ref": ref, "offset": offset})
                offset += 1
        doc_ids.append(f"doc-{d:06d}")
        spans_col.append(spans)

    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=DOC_SCHEMA
    )


def entity_label_map() -> dict[str, str]:
    """Mention surface form → entity IRI (the linker's broadcast dictionary)."""
    out = {"Great Revolution": SEED_EVENT}
    for i in range(15):
        out[f"Battle of Site {i}"] = f"{E}Battle_{i}"
        out[f"General {i}"] = f"{E}Person_{i}"
    return out
