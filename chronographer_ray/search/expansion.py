"""Batched frontier expansion — J1 (edge lookup), J2 (type/date fetch),
J3 (to_keep/to_discard split), M1-M6 edge filtering.

The reference expands frontier nodes one-by-one in a serial Python loop
(``src/framework.py:546-556`` driving ``src/expansion.py:120-129``). Here ONE
hop = three batched, partition-pruned semi-joins against the role-partitioned
triples table + vectorized Arrow filtering — the entire frontier expands as a
set. Per-origin semantics are preserved exactly because for ingoing edges the
origin IS the object column and for outgoing edges the origin IS the subject
column; the only genuinely per-origin rule in the reference — "an origin
whose neighbors have no type/date triples discards its whole expansion"
(``src/expansion.py:97-103``) — is reproduced with a grouped max over the
origin column.

Returned tables:
- ``subgraph_in/out``  — edges whose neighbor is typed with a target class
- ``pending_in/out``   — edges whose neighbor is not discarded (frontier cands)
- ``type_date``        — the J2 'spec. outgoing' triples (provenance tag kept)
- ``to_discard``       — node discard list for this hop
"""
from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DatasetConfig, SearchConfig
from ..sources.triple_store import TripleStore
from ..stages import filters as F
from .filtering import NarrativeFilter


@dataclass
class ExpansionResult:
    subgraph_in: pa.Table
    pending_in: pa.Table
    subgraph_out: pa.Table
    pending_out: pa.Table
    type_date: pa.Table
    to_discard: list[str]


class NodeExpansion:
    def __init__(self, store: TripleStore, dataset: DatasetConfig, search: SearchConfig):
        self.store = store
        self.ds = dataset
        self.cfg = search
        # M10 — the WHAT filter extends the traversal predicate anti-filter
        # with rdf:type, so type edges never enter pending (class nodes are
        # not traversal candidates); J2's type/date fetch is unaffected
        # (src/framework.py:217-219, applied at :224-227)
        self.edge_pred_filter = list(dataset.predicate_filter)
        if getattr(search, "filter_what", True):
            self.edge_pred_filter.append(dataset.rdf_type)
        self.filter = NarrativeFilter(dataset, search)
        # classes counting as "target-typed": the target classes plus every
        # class whose superclass set contains a target (src/expansion.py:104-109)
        self.target_classes: set[str] = set(search.target_class_iris)

    def set_superclasses(self, superclasses: dict[str, list[str]]) -> None:
        targets = set(self.cfg.target_class_iris)
        extra = {
            cls
            for cls, ancestors in superclasses.items()
            if any(a in targets for a in ancestors)
        }
        self.target_classes = targets | extra

    # frontiers above this size expand through the lazy Ray Dataset
    # semi-join (store.expand_dataset) instead of a driver-side lookup —
    # the per-hop map_batches scale path of SURVEY §4/§7.2
    DATASET_PATH_THRESHOLD = 1024

    # ------------------------------------------------------------------ J1
    def _edges(self, frontier: list[str], direction: str) -> pa.Table:
        role = "object" if direction == "ingoing" else "subject"
        if (
            len(frontier) > self.DATASET_PATH_THRESHOLD
            and hasattr(self.store, "expand_dataset")
        ):
            ds = self.store.expand_dataset(role, frontier, self.edge_pred_filter)
            batches = list(ds.iter_batches(batch_format="pyarrow"))
            t = (
                pa.concat_tables(batches)
                if batches
                else F.empty_triples()
            )
        else:
            t = self.store.triples_for(role, frontier)
            t = F.filter_predicates(t, self.edge_pred_filter, keep=False)
        if self.ds.start_uri:
            t = F.filter_namespace(t, self.ds.start_uri)
        t = F.filter_node_patterns(t, self.ds.filter_out_prefixes)
        t = F.dedup_exact(t, ["subject", "predicate", "object"])
        return t

    # ------------------------------------------------------------------ J2
    def _type_date(self, neighbors: list[str]) -> pa.Table:
        t = self.store.triples_for_subjects(neighbors)
        t = F.filter_predicates(t, self.ds.default_preds, keep=True)
        t = F.filter_invalid_literals_and_normalize(t)
        t = F.dedup_exact(t, ["subject", "predicate", "object"])
        return t

    # ------------------------------------------------------------------ hop
    def expand(self, frontier: list[str]) -> ExpansionResult:
        ingoing = self._edges(frontier, "ingoing")
        outgoing = self._edges(frontier, "outgoing")

        in_neighbors = F.unique_strings(ingoing, "subject")
        out_neighbors = F.unique_strings(outgoing, "object")
        neighbors = list(dict.fromkeys(in_neighbors + out_neighbors))
        type_date = self._type_date(neighbors)

        # per-origin "no type/date info → discard whole expansion" rule
        typed = set(F.unique_strings(type_date, "subject"))
        empty_origins = self._origins_without_types(ingoing, outgoing, typed)

        to_discard = self.filter(ingoing, outgoing, type_date, self.cfg.dates)
        # neighbors of type-less origins are discarded wholesale
        for tbl, ncol, ocol in ((ingoing, "subject", "object"), (outgoing, "object", "subject")):
            if tbl.num_rows and empty_origins:
                mask = pc.is_in(
                    tbl[ocol], value_set=pa.array(sorted(empty_origins), pa.string())
                )
                to_discard += F.unique_strings(tbl.filter(mask), ncol)

        discard_set = set(to_discard)
        to_keep = self._to_keep(type_date, discard_set)

        def split(tbl: pa.Table, ncol: str, ocol: str) -> tuple[pa.Table, pa.Table]:
            if tbl.num_rows == 0:
                return tbl, tbl
            if empty_origins:
                ok = pc.invert(
                    pc.is_in(
                        tbl[ocol], value_set=pa.array(sorted(empty_origins), pa.string())
                    )
                )
                tbl = tbl.filter(ok)
            sub = F.is_in_filter(tbl, ncol, to_keep, keep=True)
            pend = F.is_in_filter(tbl, ncol, discard_set, keep=False)
            return sub, pend

        sub_in, pend_in = split(ingoing, "subject", "object")
        sub_out, pend_out = split(outgoing, "object", "subject")
        return ExpansionResult(
            subgraph_in=F.tag_type_df(sub_in, "ingoing"),
            pending_in=pend_in,
            subgraph_out=F.tag_type_df(sub_out, "outgoing"),
            pending_out=pend_out,
            type_date=F.tag_type_df(type_date, "spec. outgoing"),
            to_discard=list(dict.fromkeys(to_discard)),
        )

    @staticmethod
    def _origins_without_types(
        ingoing: pa.Table, outgoing: pa.Table, typed: set[str]
    ) -> set[str]:
        pieces = []
        for tbl, ncol, ocol in ((ingoing, "subject", "object"), (outgoing, "object", "subject")):
            if tbl.num_rows == 0:
                continue
            has = (
                pc.is_in(tbl[ncol], value_set=pa.array(sorted(typed), pa.string()))
                if typed
                else pa.array([False] * tbl.num_rows)
            )
            pieces.append(
                pa.table({"origin": tbl[ocol], "has_type": has})
            )
        if not pieces:
            return set()
        both = pa.concat_tables(pieces)
        agg = both.group_by("origin").aggregate([("has_type", "max")])
        mask = pc.equal(agg["has_type_max"], False)
        return set(agg.filter(mask)["origin"].to_pylist())

    def _to_keep(self, type_date: pa.Table, discard: set[str]) -> set[str]:
        if type_date.num_rows == 0 or not self.target_classes:
            return set()
        typed_ok = type_date.filter(
            pc.is_in(
                type_date["object"],
                value_set=pa.array(sorted(self.target_classes), pa.string()),
            )
        )
        return {s for s in F.unique_strings(typed_ok, "subject") if s not in discard}
