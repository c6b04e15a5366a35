"""Superclass closure builders — the offline prep jobs (A6, A7, T5, M19).

The reference pre-extracts domain/range/superclass JSON maps offline
(``src/extract_domain_range.py``) with (a) a single propagation round for
class→subclass expansion (A6, ``:136-152``) and (b) a recursive
root-ancestor walk (A7, ``src/interface.py:52-64``). Both are re-expressed
as iterative self-joins over a ``(child, parent)`` pairs table.
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _pairs_df(pairs: pa.Table) -> pd.DataFrame:
    return pairs.select(["child", "parent"]).to_pandas().drop_duplicates()


def one_round_propagation(pairs: pa.Table) -> dict[str, list[str]]:
    """A6 parity — EXACTLY one propagation round, as the reference does:
    ancestors(c) = parents(c) ∪ parents(parents(c)). Not a fixpoint."""
    df = _pairs_df(pairs)
    two = df.merge(df, left_on="parent", right_on="child", suffixes=("", "_2"))
    out: dict[str, list[str]] = {}
    for child, parent in df.itertuples(index=False):
        out.setdefault(child, [])
        if parent not in out[child]:
            out[child].append(parent)
    for row in two.itertuples(index=False):
        gp = row.parent_2
        out.setdefault(row.child, [])
        if gp not in out[row.child]:
            out[row.child].append(gp)
    return out


def transitive_closure(pairs: pa.Table, max_iters: int = 32) -> dict[str, list[str]]:
    """Full ancestor closure by iterative self-join to fixpoint (the sane
    scale path; each iteration doubles the reachable depth)."""
    df = _pairs_df(pairs)
    closure = df.copy()
    frontier = df.copy()
    for _ in range(max_iters):
        step = frontier.merge(df, left_on="parent", right_on="child", suffixes=("", "_n"))
        step = step[["child", "parent_n"]].rename(columns={"parent_n": "parent"})
        merged = pd.concat([closure, step]).drop_duplicates()
        if len(merged) == len(closure):
            break
        frontier = merged.merge(closure, how="left", indicator=True,
                                on=["child", "parent"])
        frontier = frontier[frontier["_merge"] == "left_only"][["child", "parent"]]
        closure = merged
    out: dict[str, list[str]] = {}
    for child, parent in closure.itertuples(index=False):
        out.setdefault(child, []).append(parent)
    return {k: sorted(v) for k, v in out.items()}


def root_ancestor(
    pairs: pa.Table, owl_thing: str = "http://www.w3.org/2002/07/owl#Thing"
) -> dict[str, str]:
    """A7 parity — per class, the LAST ancestor before owl:Thing along the
    first-parent chain; classes with no parent (or whose first parent is
    owl:Thing) map to themselves (``src/interface.py:52-64``)."""
    df = _pairs_df(pairs)
    first_parent: dict[str, str] = {}
    for child, parent in df.itertuples(index=False):
        first_parent.setdefault(child, parent)

    def walk(node: str) -> str:
        seen = {node}
        while True:
            parent = first_parent.get(node)
            if parent is None or parent == owl_thing:
                return node
            if parent in seen:  # cycle guard (reference would recurse forever)
                return node
            seen.add(parent)
            node = parent

    return {c: walk(c) for c in first_parent}
