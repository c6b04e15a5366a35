"""Stage 2 — event-centric KG population onto the SEM ontology.

Reference semantics: ``src/build_ng/generic_kb_to_ng.py:200-280`` (event
extraction → J6 outgoing fetch → J7 label join → J8 domain/range role
mapping with direction swap → M16 label-substring rules → A8 temporal
min/max → canonical dedup). New implementation, Ray-Data-first:

- J6 is one partition-pruned semi-join of the event-id set against the
  by-subject triples table (the reference loops events one at a time).
- J7 is a broadcast hash join: distinct predicates are few, the label table
  ships once. The reference's INNER merge drops label-less predicates — the
  rebuild replicates that (rows without a predicate label never reach the
  role rules; the URI-tail fallback only applies to rows that survive).
- J8/M16 run inside ``RoleMapper`` — an actor-pool-compatible callable
  holding the broadcast maps and a pred→roles memo cache (the reference's
  ``self.cached``, T3).
- A8 is a grouped min/max on candidate dates; "only a begin found → end :=
  begin"; an end without a begin emits nothing (reference behavior).
- Final canonicalization: percent-encode IRIs (M15), dedup on (s,p,o) —
  rdflib set semantics — sort. At scale the dedup is a salted two-stage
  groupby keyed on the normalized subject IRI (hub-entity skew).
"""
from __future__ import annotations

from typing import Optional
from urllib.parse import quote

import pyarrow as pa
import pyarrow.compute as pc

from ..config import NF_TO_PRED, NF_TO_STR, RDF_TYPE, SEM_EVENT, SEM_HAS_BEGIN, SEM_HAS_END, STR_TO_NF
from ..sources.triple_store import TripleStore
from ..stages import filters as F

STR_XSD = "http://www.w3.org/2001/XMLSchema#"
TEMPORAL_TRIGGERS = NF_TO_STR["when_bts"] + NF_TO_STR["when_ets"]

OUT_SCHEMA = pa.schema(
    [("subject", pa.string()), ("predicate", pa.string()), ("object", pa.string())]
)


def encode_iri(iri: str) -> str:
    """M15 — percent-encode an IRI, preserving URI structure characters."""
    return quote(iri, safe=":/#?&=%~-._@()',!*")


def extract_events(subgraph: pa.Table) -> list[str]:
    """Event ids from a search subgraph: ingoing subjects ∪ outgoing objects
    (order-preserving; ``generic_kb_to_ng.py:116-117``)."""
    if subgraph.num_rows == 0:
        return []
    ing = subgraph.filter(pc.equal(subgraph["type_df"], "ingoing"))
    out = subgraph.filter(pc.equal(subgraph["type_df"], "outgoing"))
    return list(dict.fromkeys(F.unique_strings(ing, "subject") + F.unique_strings(out, "object")))


def predicate_labels(store: TripleStore, predicates: list[str], rdfs_label: str) -> dict[str, str]:
    """J7 lookup side: predicate → first rdfs:label lexical form."""
    t = store.triples_for_subjects(predicates)
    t = t.filter(pc.equal(t["predicate"], rdfs_label))
    out: dict[str, str] = {}
    for s, o in zip(t["subject"].to_pylist(), t["object"].to_pylist()):
        out.setdefault(s, o)
    return out


class RoleMapper:
    """J8 + M16 — map (s, p, o) edges to SEM role triples.

    Stateful stage: broadcast maps resolved once (per actor on the Ray
    path), pred→roles memoized. ``__call__`` is a pure batch kernel:
    ``pa.Table[s,p,o,label] -> pa.Table[s,p,o]`` of emitted role triples for
    URI objects, so it drops straight into
    ``ds.map_batches(RoleMapper, fn_constructor_kwargs=..., concurrency=N)``.
    """

    def __init__(
        self,
        domain_map: dict[str, list[str]],
        range_map: dict[str, list[str]],
        superclasses: dict[str, list[str]],
        pred_labels: Optional[dict[str, str]] = None,
    ):
        import ray

        def _resolve(x):
            return x if isinstance(x, dict) else ray.get(x)

        self.domain = _resolve(domain_map)
        self.range = _resolve(range_map)
        self.superclasses = _resolve(superclasses)
        self.pred_labels = _resolve(pred_labels) if pred_labels is not None else {}
        self._role_cache: dict[str, list[tuple[str, str]]] = {}

    # -- J8: domain/range → (narrative frame, side) ------------------------
    def sem_roles(self, pred: str) -> list[tuple[str, str]]:
        if pred in self._role_cache:
            return self._role_cache[pred]
        roles: list[tuple[str, str]] = []
        seen = set()
        for side_name, lookup in (("range", self.range), ("domain", self.domain)):
            for cls in lookup.get(pred, []):
                for c in [cls] + self.superclasses.get(cls, []):
                    name = c.split("/")[-1].lower()
                    nf = STR_TO_NF.get(name)
                    if nf and (nf, side_name) not in seen:
                        seen.add((nf, side_name))
                        roles.append((nf, side_name))
        self._role_cache[pred] = roles
        return roles

    def label_for(self, pred: str) -> str:
        return self.pred_labels.get(pred, pred.split("/")[-1].lower())

    # -- M16 + J8 emission over one batch of URI-object edges --------------
    def map_uri_batch(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        subs, preds, objs = (
            t["subject"].to_pylist(),
            t["predicate"].to_pylist(),
            t["object"].to_pylist(),
        )
        out_s: list[str] = []
        out_p: list[str] = []
        out_o: list[str] = []
        for s, p, o in zip(subs, preds, objs):
            es, eo = encode_iri(s), encode_iri(o)
            for nf, side_name in self.sem_roles(p):
                if side_name == "range":
                    out_s.append(es); out_p.append(NF_TO_PRED[nf]); out_o.append(eo)
                else:  # domain ⇒ direction swap (generic_kb_to_ng.py:241-243)
                    out_s.append(eo); out_p.append(NF_TO_PRED[nf]); out_o.append(es)
            label = self.label_for(p)
            for trigger, nf in STR_TO_NF.items():
                if trigger in label:
                    out_s.append(es); out_p.append(NF_TO_PRED[nf]); out_o.append(eo)
        return pa.table({"subject": out_s, "predicate": out_p, "object": out_o}, schema=OUT_SCHEMA)

    def __call__(self, t: pa.Table) -> pa.Table:
        return self.map_uri_batch(t)


def temporal_candidates(t: pa.Table, labels: dict[str, str]) -> pa.Table:
    """A8 input — ``(event, role, date)`` rows from XSD-typed literal objects
    whose predicate label contains a begin/end trigger."""
    if t.num_rows == 0:
        return pa.schema(
            [("event", pa.string()), ("role", pa.string()), ("date", pa.string())]
        ).empty_table()
    xsd = t.filter(pc.match_substring(t["object"], pattern=STR_XSD))
    ev: list[str] = []
    role: list[str] = []
    date: list[str] = []
    for s, p, o in zip(
        xsd["subject"].to_pylist(), xsd["predicate"].to_pylist(), xsd["object"].to_pylist()
    ):
        label = labels.get(p, p.split("/")[-1].lower())
        d = o[1:11]
        if any(x in label for x in NF_TO_STR["when_bts"]):
            ev.append(s); role.append("bts"); date.append(d)
        if any(x in label for x in NF_TO_STR["when_ets"]):
            ev.append(s); role.append("ets"); date.append(d)
    return pa.table({"event": ev, "role": role, "date": date})


def aggregate_temporal(cands: pa.Table, start_d: str, end_d: str) -> pa.Table:
    """A8 — per-event begin=min(bts), end=max(ets) within [start_d, end_d];
    end := begin when only begin found; begin-less events emit nothing."""
    if cands.num_rows == 0:
        return OUT_SCHEMA.empty_table()
    inwin = cands.filter(
        pc.and_(
            pc.greater_equal(cands["date"], start_d), pc.less_equal(cands["date"], end_d)
        )
    )
    if inwin.num_rows == 0:
        return OUT_SCHEMA.empty_table()
    bts = inwin.filter(pc.equal(inwin["role"], "bts")).group_by("event").aggregate(
        [("date", "min")]
    )
    ets = inwin.filter(pc.equal(inwin["role"], "ets")).group_by("event").aggregate(
        [("date", "max")]
    )
    ets_map = dict(zip(ets["event"].to_pylist(), ets["date_max"].to_pylist()))
    out_s: list[str] = []
    out_p: list[str] = []
    out_o: list[str] = []
    for event, begin in zip(bts["event"].to_pylist(), bts["date_min"].to_pylist()):
        end = ets_map.get(event, begin)
        e = encode_iri(event)
        out_s += [e, e]
        out_p += [SEM_HAS_BEGIN, SEM_HAS_END]
        out_o += [begin, end]
    return pa.table({"subject": out_s, "predicate": out_p, "object": out_o}, schema=OUT_SCHEMA)


def canonical_dedup_sort(t: pa.Table) -> pa.Table:
    """D7/S9 — set-dedup on (s,p,o) then canonical sort."""
    if t.num_rows == 0:
        return t
    t = F.dedup_exact(t, ["subject", "predicate", "object"])
    return t.sort_by(
        [("subject", "ascending"), ("predicate", "ascending"), ("object", "ascending")]
    )


def build_event_kg(
    subgraph: pa.Table,
    store: TripleStore,
    domain_map: dict[str, list[str]],
    range_map: dict[str, list[str]],
    superclasses: dict[str, list[str]],
    start_d: str,
    end_d: str,
    rdfs_label: str = "http://www.w3.org/2000/01/rdf-schema#label",
) -> pa.Table:
    """Driver-side stage-2 pipeline (small/medium graphs; kernels shared
    with the Ray Dataset variant in ``pipelines/flagship.py``)."""
    events = extract_events(subgraph)
    if not events:
        return OUT_SCHEMA.empty_table()

    outgoing = store.triples_for_subjects(events)  # J6, one semi-join
    edges = pa.concat_tables(
        [subgraph.select(["subject", "predicate", "object"]), outgoing]
    )

    labels = predicate_labels(store, F.unique_strings(edges, "predicate"), rdfs_label)

    # J7 inner-join semantics: only rows whose predicate HAS a label survive
    mask = pc.is_in(
        edges["predicate"], value_set=pa.array(sorted(labels) or [""], pa.string())
    )
    edges = edges.filter(mask)

    typing = pa.table(
        {
            "subject": [encode_iri(e) for e in events],
            "predicate": [RDF_TYPE] * len(events),
            "object": [SEM_EVENT] * len(events),
        },
        schema=OUT_SCHEMA,
    )

    is_uri = pc.starts_with(edges["object"], pattern="http")
    uri_edges = edges.filter(is_uri)
    lit_edges = edges.filter(
        pc.and_(pc.invert(is_uri), pc.invert(pc.equal(edges["object"], "")))
    )

    mapper = RoleMapper(domain_map, range_map, superclasses, labels)
    uri_triples = mapper.map_uri_batch(uri_edges)
    temporal = aggregate_temporal(temporal_candidates(lit_edges, labels), start_d, end_d)

    return canonical_dedup_sort(pa.concat_tables([typing, uri_triples, temporal]))


# ---------------------------------------------------------------- Ray path
class Stage2RoleStage(RoleMapper):
    """Actor-pool stage for the Dataset variant: per batch, apply the J7
    inner label join, split URI objects, emit role triples (J8 + M16)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        if batch.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        labeled = batch.filter(
            pc.is_in(
                batch["predicate"],
                value_set=pa.array(sorted(self.pred_labels) or [""], pa.string()),
            )
        )
        uri = labeled.filter(pc.starts_with(labeled["object"], pattern="http"))
        return self.map_uri_batch(uri)


class Stage2TemporalStage(RoleMapper):
    """Actor-pool stage emitting A8 temporal candidates per batch."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        labeled = batch.filter(
            pc.is_in(
                batch["predicate"],
                value_set=pa.array(sorted(self.pred_labels) or [""], pa.string()),
            )
        )
        lit = labeled.filter(
            pc.and_(
                pc.invert(pc.starts_with(labeled["object"], pattern="http")),
                pc.invert(pc.equal(labeled["object"], "")),
            )
        )
        return temporal_candidates(lit, self.pred_labels)


def build_event_kg_dataset(
    subgraph: pa.Table,
    store,
    domain_map: dict,
    range_map: dict,
    superclasses: dict,
    start_d: str,
    end_d: str,
    rdfs_label: str = "http://www.w3.org/2000/01/rdf-schema#label",
    output_dir: str | None = None,
    concurrency: int = 4,
):
    """Stage 2 as a streaming Ray Dataset pipeline (the scale path).

    - J6: partition-pruned semi-join Dataset over the by-subject triples
      table (``ParquetTripleStore.expand_dataset``)
    - J7/J8/M16: actor-pool ``map_batches`` with the broadcast maps resolved
      once per actor
    - A8: Ray groupby min/max over the (tiny) per-event candidate rows
    - D7/S9: two-stage dedup + sort; optional partitioned-parquet sink with
      a lineage manifest (rows, events, window, fingerprint)

    Returns the canonical triples as ``pa.Table`` (and writes the sink when
    ``output_dir`` is given).
    """
    import ray
    import ray.data as rd

    from ..stages.dedup import dedup_dataset

    events = extract_events(subgraph)
    if not events:
        return OUT_SCHEMA.empty_table()

    edges = rd.from_arrow(subgraph.select(["subject", "predicate", "object"]))
    if hasattr(store, "expand_dataset"):
        edges = edges.union(store.expand_dataset("subject", events))
    else:
        edges = edges.union(rd.from_arrow(store.triples_for_subjects(events)))
    # the event neighborhood is small relative to the corpus: pin it for the
    # two passes (roles + temporal) instead of recomputing the semi-join
    edges = edges.materialize()

    preds = [r["predicate"] for r in edges.groupby("predicate").count().take_all()]
    labels = predicate_labels(store, preds, rdfs_label)

    kwargs = dict(
        domain_map=ray.put(domain_map),
        range_map=ray.put(range_map),
        superclasses=ray.put(superclasses),
        pred_labels=ray.put(labels),
    )
    uri_roles = edges.map_batches(
        Stage2RoleStage, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1,
    )
    cands = edges.map_batches(
        Stage2TemporalStage, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1,
    )
    cands_t = pa.Table.from_pandas(cands.to_pandas(), preserve_index=False)
    if cands_t.num_rows:
        cands_t = cands_t.cast(
            pa.schema([("event", pa.string()), ("role", pa.string()), ("date", pa.string())])
        )
    temporal = aggregate_temporal(cands_t, start_d, end_d)

    typing = pa.table(
        {
            "subject": [encode_iri(e) for e in events],
            "predicate": [RDF_TYPE] * len(events),
            "object": [SEM_EVENT] * len(events),
        },
        schema=OUT_SCHEMA,
    )
    all_triples = uri_roles.union(rd.from_arrow(typing)).union(rd.from_arrow(temporal))
    deduped = dedup_dataset(all_triples, ["subject", "predicate", "object"])
    final = deduped.sort(["subject", "predicate", "object"])

    out = pa.Table.from_pandas(final.to_pandas(), preserve_index=False).cast(OUT_SCHEMA)
    if output_dir:
        from ..state.sink import write_partitioned_triples

        write_partitioned_triples(out, output_dir, meta={
            "events": len(events), "window": [start_d, end_d],
        })
    return out
