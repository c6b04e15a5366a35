"""A10 — triple-set comparison of two event KGs (P/R/F1 overall + per pred).

Reference semantics: ``src/build_ng/sem_comparison.py:49-96`` — intersection /
left-only / right-only counts restricted to the four core SEM predicates,
precision = 100·common/(common+gs_only), recall = 100·common/(common+c_only).
New implementation via a full-outer presence-flag join on (s,p,o).
"""
from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

from ..config import SEM_HAS_ACTOR, SEM_HAS_BEGIN, SEM_HAS_END, SEM_HAS_PLACE

CORE_PREDS = [SEM_HAS_PLACE, SEM_HAS_ACTOR, SEM_HAS_BEGIN, SEM_HAS_END]


def _f1(p: float, r: float) -> float:
    return 2 * p * r / (p + r) if p + r else 0.0


def _triple_set(t: pa.Table) -> set[tuple[str, str, str]]:
    return set(
        zip(t["subject"].to_pylist(), t["predicate"].to_pylist(), t["object"].to_pylist())
    )


def compare_graphs(built: pa.Table, gold: pa.Table) -> dict:
    b, g = _triple_set(built), _triple_set(gold)
    common = {t for t in b & g if t[1] in CORE_PREDS}
    b_only = {t for t in b - g if t[1] in CORE_PREDS}
    g_only = {t for t in g - b if t[1] in CORE_PREDS}

    def _metrics(ci: int, co: int, go: int) -> dict:
        precision = 100 * ci / (ci + go) if ci + go else 0.0
        recall = 100 * ci / (ci + co) if ci + co else 0.0
        return {"precision": precision, "recall": recall, "f1": _f1(precision, recall)}

    out = {
        "triples": {"len_c": len(b), "len_gs": len(g)},
        "numbers": {
            "all": {
                "triples_common": len(common),
                "triples_search_only": len(b_only),
                "triples_gs_only": len(g_only),
            }
        },
        "metrics": {"all": _metrics(len(common), len(b_only), len(g_only))},
    }

    per_pred: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for name, group in (("common", common), ("c_only", b_only), ("gs_only", g_only)):
        for _, p, _ in group:
            per_pred[p][name] += 1
    for pred, nums in per_pred.items():
        out["numbers"][pred] = {
            "triples_common": nums["common"],
            "triples_search_only": nums["c_only"],
            "triples_gs_only": nums["gs_only"],
        }
        out["metrics"][pred] = _metrics(nums["common"], nums["c_only"], nums["gs_only"])
    return out


def diff_datasets(left, right, n_buckets: int = 16):
    """Distributed symmetric difference of two triple snapshots →
    (subject, predicate, object, side) with side ∈ {'left_only',
    'right_only'} — the scale form of ``compare_graphs``' set
    arithmetic (reference ``src/build_ng/sem_comparison.py:49-96``
    computes the same left/right-only partition driver-side; this
    version never materializes either snapshot in one place).

    Set semantics on both sides (duplicates within a snapshot collapse).
    One int-bucket exchange on (s, p, o): every copy of a triple lands
    in the same bucket, the per-bucket Arrow merge dedups per side,
    counts sides per triple and keeps the singles. Map-side pre-dedup
    collapses repeats before the wire."""
    import pyarrow.compute as pc

    from ..functions.shuffles import bucketed_group_apply

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            t = pa.table({
                "subject": b["subject"],
                "predicate": b["predicate"],
                "object": b["object"],
            })
            t = t.group_by(
                ["subject", "predicate", "object"]).aggregate([])
            import numpy as np

            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, np.int8)))
        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def merge(t: pa.Table) -> pa.Table:
        u = t.group_by(
            ["subject", "predicate", "object", "side"]).aggregate([])
        g = u.group_by(["subject", "predicate", "object"]).aggregate(
            [("side", "count"), ("side", "min")])
        only = g.filter(pc.equal(g["side_count"], 1))
        side = pc.if_else(pc.equal(only["side_min"], 0),
                          pa.scalar("left_only"),
                          pa.scalar("right_only"))
        return pa.table({
            "subject": only["subject"],
            "predicate": only["predicate"],
            "object": only["object"],
            "side": side,
        })

    return bucketed_group_apply(
        both, ["subject", "predicate", "object"], merge,
        n_buckets=n_buckets, batch_format="pyarrow",
    )
