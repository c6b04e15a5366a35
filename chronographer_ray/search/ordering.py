"""Superclass annotation (M11), path-key building (M13), occurrence count (A1).

The domain/range/superclass maps are small broadcast side tables: on the Ray
path they're shipped once via ``ray.put`` and resolved once per actor in
``SuperclassAnnotator.__init__``; the per-batch work is a vectorized
unique-predicate lookup (predicates per batch ≪ rows per batch), never a
Python loop over rows.

Semantics follow the reference's ``src/ordering.py:146-174`` (superclass
column), ``src/framework.py:564-597`` (priority digit + path key), and
``src/framework.py:571-605`` (occurrence accumulation and post-expansion
removal). Deviation (documented): the superclass expansion is uniformly
``{class} ∪ superclasses[class]`` for every dataset; the reference's
non-prefix branch omits the class itself and would KeyError on classes
missing from the map (``src/ordering.py:160-163``) — ours is total.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Iterable, Optional

import pyarrow as pa
import pyarrow.compute as pc


def build_pred_class_map(
    pred_to_classes: dict[str, list[str]],
    superclasses: dict[str, list[str]],
    prefix_rewrite: Optional[tuple[str, str]] = None,
) -> dict[str, list[str]]:
    """Flatten pred → domain/range classes → class + ancestors, once.

    ``prefix_rewrite=(from, to)`` reproduces the wikidata
    ``prop/direct/ → entity/`` IRI rewrite (``src/ordering.py:152``).

    Includes the class ITSELF alongside its ancestors — matching the
    reference's wikidata branch (``superclasses[elt] + [elt]``,
    ``src/ordering.py:154-156``). Its dbpedia branch stores only
    ``superclasses[elt]``, but those offline maps hold the root-ancestor-
    before-owl:Thing (A7), which for a top class IS the class itself —
    so priority-digit outcomes (M13) agree across both branches.
    """
    out: dict[str, list[str]] = {}
    for pred, classes in pred_to_classes.items():
        acc: dict[str, None] = {}
        for cls in classes:
            acc[cls] = None
            for anc in superclasses.get(cls, []):
                acc[anc] = None
        out[pred] = list(acc)
    if prefix_rewrite:
        src, dst = prefix_rewrite
        for pred in list(out):
            if src in pred:
                out[pred.replace(src, dst)] = out[pred]
    return out


class SuperclassAnnotator:
    """M11 — append ``superclass: list<string>`` looked up by predicate.

    Usable directly (driver-side small tables) or as an actor-pool stage:
    ``ds.map_batches(SuperclassAnnotator, fn_constructor_kwargs=...,
    concurrency=N, batch_format="pyarrow")`` — map resolution happens once
    per actor, per-batch work is one unique() + dict lookups per distinct
    predicate.
    """

    def __init__(
        self,
        domain_map: dict[str, list[str]] | "ray.ObjectRef",  # noqa: F821
        range_map: dict[str, list[str]] | "ray.ObjectRef",  # noqa: F821
        direction: str = "ingoing",
    ):
        import ray

        if not isinstance(domain_map, dict):
            domain_map = ray.get(domain_map)
        if not isinstance(range_map, dict):
            range_map = ray.get(range_map)
        self.maps = {"ingoing": domain_map, "outgoing": range_map}
        self.direction = direction

    def annotate(self, t: pa.Table, direction: Optional[str] = None) -> pa.Table:
        lookup = self.maps[direction or self.direction]
        if t.num_rows == 0:
            return t.append_column(
                "superclass", pa.array([], pa.list_(pa.string()))
            )
        preds = t["predicate"].to_pylist()
        col = pa.array([lookup.get(p, []) for p in preds], pa.list_(pa.string()))
        # per-row python list build is over *predicate strings only*; rows
        # carry no other python conversion. For very hot stages the distinct
        # predicates per batch are few — memoization via `lookup` suffices.
        return t.append_column("superclass", col)

    def __call__(self, t: pa.Table) -> pa.Table:
        return self.annotate(t)


def priority_digit(superclass: Iterable[str], targets: set[str]) -> str:
    """'1' if the superclass list hits a target class else '3'.

    ('2' is the reference's reserved manually-selected-predicate class,
    empty in practice — ``src/framework.py:564-569``.)
    """
    return "1" if any(s in targets for s in superclass) else "3"


def path_keys(
    t: pa.Table, direction: str, type_ranking: str, targets: set[str]
) -> list[str]:
    """M13 — ranking key per edge row of an annotated pending table.

    - ``*pred_freq`` family: ``{nb}-{predicate}``
    - ``*pred_object_freq`` family:
      ingoing → ``{nb}-ingoing-{predicate};{object}``;
      outgoing → ``{nb}-outgoing-{subject};{predicate}``
    """
    if t.num_rows == 0:
        return []
    preds = t["predicate"].to_pylist()
    sups = t["superclass"].to_pylist()
    digits = [priority_digit(s or [], targets) for s in sups]
    if "pred_object" in type_ranking:
        if direction == "ingoing":
            objs = t["object"].to_pylist()
            return [f"{d}-ingoing-{p};{o}" for d, p, o in zip(digits, preds, objs)]
        subjs = t["subject"].to_pylist()
        return [f"{d}-outgoing-{s};{p}" for d, s, p in zip(digits, subjs, preds)]
    return [f"{d}-{p}" for d, p in zip(digits, preds)]


class OccurrenceState:
    """A1 — the running path-occurrence counter (driver state).

    Insertion order is first-occurrence order → deterministic ranker
    tie-breaks. ``counts`` values are ints; merging a per-hop Arrow
    ``groupby('path_key').count()`` result preserves the hop's key order.
    """

    def __init__(self) -> None:
        self.counts: dict[str, int] = defaultdict(int)

    def add_keys(self, keys: Iterable[str]) -> None:
        for k in keys:
            self.counts[k] += 1

    def merge_counted(self, keyed_counts: Iterable[tuple[str, int]]) -> None:
        for k, n in keyed_counts:
            self.counts[k] += n

    def after_expansion(self, expanded_key: str, node_selection: str) -> None:
        """Remove (node_selection='all') the expanded path's key.

        The reference's 'random' branch compares count values against the key
        string and is therefore a no-op (``src/framework.py:599-605``); we
        keep the key in that mode to preserve behavior.
        """
        if node_selection == "all" and expanded_key in self.counts:
            del self.counts[expanded_key]

    def as_dict(self) -> dict[str, int]:
        return dict(self.counts)
