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


# characters OUTSIDE quote()'s always-safe set ∪ the safe= argument above
_UNSAFE_RE = "[^A-Za-z0-9:/#?&=%~\\-._@()',!*]"


def encode_iri_array(col) -> pa.ChunkedArray | pa.Array:
    """Vectorized M15: most IRIs contain no character that needs escaping —
    a regex scan finds the rare rows that do and only THOSE go through
    Python ``quote``; clean columns pass through zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    needs = pc.match_substring_regex(col, _UNSAFE_RE)
    if not pc.any(needs).as_py():
        return col
    dirty = pc.indices_nonzero(needs)
    repl = pa.array(
        [encode_iri(v) for v in pc.take(col, dirty).to_pylist()], pa.string()
    )
    return pc.replace_with_mask(col, needs, repl)


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
    def _pred_mapping(self, preds: list[str]) -> pa.Table:
        """Distinct-predicate → emitted-role rows: one row per (pred,
        out_pred, swap) emission. Role emission depends on the PREDICATE
        only, so the per-row work collapses to this small table joined back
        against the batch (the Python loop runs over |distinct preds|, and
        each pred's role set is memoized across batches)."""
        rows_p: list[str] = []
        rows_out: list[str] = []
        rows_swap: list[bool] = []
        for p in preds:
            for nf, side_name in self.sem_roles(p):
                rows_p.append(p)
                rows_out.append(NF_TO_PRED[nf])
                # domain ⇒ direction swap (generic_kb_to_ng.py:241-243)
                rows_swap.append(side_name == "domain")
            label = self.label_for(p)
            for trigger, nf in STR_TO_NF.items():
                if trigger in label:
                    rows_p.append(p)
                    rows_out.append(NF_TO_PRED[nf])
                    rows_swap.append(False)
        return pa.table(
            {
                "predicate": pa.array(rows_p, pa.string()),
                "_out_pred": pa.array(rows_out, pa.string()),
                "_swap": pa.array(rows_swap, pa.bool_()),
            }
        )

    def map_uri_batch(self, t: pa.Table) -> pa.Table:
        """Vectorized emission: encode s/o (regex-gated), build the
        distinct-pred mapping table, inner-join it back (m:n — one output
        row per (edge, role)), direction-swap via ``pc.if_else``. Same
        multiset of triples as the reference's per-row loop; row order is
        join order (downstream canonicalization sorts)."""
        if t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        preds = t["predicate"]
        mapping = self._pred_mapping(pc.unique(preds).to_pylist())
        if mapping.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        enc = pa.table(
            {
                "_es": encode_iri_array(t["subject"]),
                "_eo": encode_iri_array(t["object"]),
                "predicate": preds,
            }
        )
        joined = enc.join(mapping, keys="predicate", join_type="inner")
        sub = pc.if_else(joined["_swap"], joined["_eo"], joined["_es"])
        obj = pc.if_else(joined["_swap"], joined["_es"], joined["_eo"])
        return pa.table(
            {"subject": sub, "predicate": joined["_out_pred"], "object": obj},
            schema=OUT_SCHEMA,
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        return self.map_uri_batch(t)


_CAND_SCHEMA = pa.schema(
    [("event", pa.string()), ("role", pa.string()), ("date", pa.string())]
)


def temporal_candidates(t: pa.Table, labels: dict[str, str]) -> pa.Table:
    """A8 input — ``(event, role, date)`` rows from XSD-typed literal objects
    whose predicate label contains a begin/end trigger. Trigger membership
    is a function of the PREDICATE only: a small distinct-pred → role table
    is joined back against the batch (vectorized; the date slice is a
    ``pc.utf8_slice_codeunits``)."""
    if t.num_rows == 0:
        return _CAND_SCHEMA.empty_table()
    xsd = t.filter(pc.match_substring(t["object"], pattern=STR_XSD))
    if xsd.num_rows == 0:
        return _CAND_SCHEMA.empty_table()
    rows_p: list[str] = []
    rows_r: list[str] = []
    for p in pc.unique(xsd["predicate"]).to_pylist():
        label = labels.get(p, p.split("/")[-1].lower())
        if any(x in label for x in NF_TO_STR["when_bts"]):
            rows_p.append(p)
            rows_r.append("bts")
        if any(x in label for x in NF_TO_STR["when_ets"]):
            rows_p.append(p)
            rows_r.append("ets")
    if not rows_p:
        return _CAND_SCHEMA.empty_table()
    enc = pa.table(
        {
            "event": xsd["subject"],
            "predicate": xsd["predicate"],
            "date": pc.utf8_slice_codeunits(
                xsd["object"].combine_chunks(), start=1, stop=11
            ),
        }
    )
    mapping = pa.table(
        {"predicate": pa.array(rows_p, pa.string()), "role": pa.array(rows_r, pa.string())}
    )
    joined = enc.join(mapping, keys="predicate", join_type="inner")
    return pa.table(
        {"event": joined["event"], "role": joined["role"], "date": joined["date"]},
        schema=_CAND_SCHEMA,
    )


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
    # two passes (roles + temporal) instead of recomputing the semi-join.
    # from_arrow yields ONE block — split so the actor pools actually fan out
    edges = edges.repartition(max(8, concurrency * 4)).materialize()

    # distinct predicates via map-side unique + driver union: a
    # groupby(predicate) here is a full string-key sort shuffle (~2 s at 1M
    # edges) to answer a set question whose per-block answer is tiny
    pred_parts = edges.map_batches(
        lambda b: pa.table({"predicate": pc.unique(b["predicate"])}),
        batch_format="pyarrow",
    )
    preds = sorted(
        {p for b in pred_parts.iter_batches(batch_format="pyarrow") for p in b["predicate"].to_pylist()}
    )
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
