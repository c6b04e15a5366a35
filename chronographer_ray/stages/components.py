"""Distributed connected components over near-duplicate candidate pairs,
and the cluster-dedup step built on it (keep one document per component).

This closes the dedup pipeline loop the pair finders open: MinHash-LSH /
SimHash / n-gram Jaccard emit candidate PAIRS (d1, d2), but a corpus dedup
needs CLUSTERS — near-duplication is transitive in practice (A~B, B~C ⇒
drop two of {A,B,C} even when A~C was never emitted), so survivors must be
chosen per connected component of the pair graph, not per pair.

Algorithm: hash-min label propagation (the BSP / Pregel-style connected
components; Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 describe the family). Every node starts labeled with its
own id; each round every node adopts the minimum label among itself and
its neighbors; fixpoint after O(graph diameter) rounds. Near-dup
components are dense and shallow (cliques plus short chains), so rounds
stay in the low single digits on real corpora.

Scale shape (nothing driver-side, two int-bucket exchanges per round):

- Edges are symmetrized and bucket-tagged by ``hash(src)`` ONCE, then
  materialized — the static side of the iteration never re-runs its tag
  stage (Ray's groupby still exchanges the rows each round; pinning edge
  partitions in long-lived actors is the cluster upgrade documented in
  SURVEY §7.4's partition-reuse note).
- Round = (1) co-bucket current labels with edges by ``hash(node)``, merge
  inside each bucket (vectorized pandas), emit label candidates to each
  neighbor WITH a local per-bucket min pre-combine, then (2) min-combine
  per node via a second int-bucket exchange (Arrow group-min).
- Convergence check is an O(|V|) aggregate, not a join: labels only ever
  decrease, so the label SUM strictly decreases exactly when any label
  changed; a round that leaves the sum unchanged is the fixpoint.

Reference anchor: the reference has no clustering step (its dedup is the
exact URI-keyed drop_duplicates, `src/framework.py` subgraph bookkeeping);
this operator is part of the LLM-data-pipeline extension surface.
"""
from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)

_KNUTH = np.uint64(2654435761)


def _int_bucket(a: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic int64 → bucket hash (Knuth multiplicative, top bits)."""
    x = a.astype(np.uint64) * _KNUTH
    return ((x >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int32)


def _empty_components() -> pa.Table:
    return pa.table(
        {"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
    )


def _local_components(kv) -> pa.Table:
    """Vectorized hash-min with pointer jumping over a driver-resident
    bidirectional edge array — converges in O(log diameter) numpy passes."""
    k = kv["key"].to_numpy()
    v = kv["val"].to_numpy()
    nodes = np.unique(np.concatenate([k, v]))
    ik = np.searchsorted(nodes, k)
    iv = np.searchsorted(nodes, v)
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = label.copy()
        np.minimum.at(new, iv, label[ik])  # edges are bidirectional already
        new = np.minimum(new, new[new])  # pointer jump
        if (new == label).all():
            break
        label = new
    # labels are indices into the ASCENDING node array, so min index = min id
    return pa.table(
        {"node": pa.array(nodes), "component": pa.array(nodes[label])}
    )


def connected_components_dataset(
    pairs,
    src: str = "d1",
    dst: str = "d2",
    n_buckets: int = 16,
    max_iter: int = 30,
    local_threshold: int = 100_000,
):
    """Connected components of an undirected pair graph.

    Args:
        pairs: Dataset with two int node-id columns (``src``, ``dst``), one
            row per undirected edge (duplicates are fine).
        local_threshold: edge count at or below which the fixpoint runs as
            ONE vectorized pass on the driver instead of distributed label
            propagation. The distributed loop costs 2 exchanges × diameter
            rounds — paying ~10 shuffle stages to label a few thousand
            edges is the wrong plan; the collect is bounded (≤ threshold ×
            16 B ≈ 1.6 MB) and the big-graph path is unchanged (set 0 to
            force it, as the distributed-path tests do).
    Returns:
        Dataset ``(node, component)`` — every node that appears in any
        pair, labeled with the MINIMUM node id reachable from it.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    def edge_rows(b: pa.Table) -> pa.Table:
        s = b[src].to_numpy(zero_copy_only=False).astype(np.int64)
        t = b[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.concatenate([s, t])
        val = np.concatenate([t, s])
        return pa.table(
            {
                "key": pa.array(key),
                "val": pa.array(val),
                "kind": pa.array(np.zeros(key.size, dtype=np.int8)),
                "bucket": pa.array(_int_bucket(key, n_buckets)),
            }
        )

    edges = pairs.map_batches(edge_rows, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(_empty_components())
    if n_edges <= 2 * local_threshold:  # edge_rows doubled the rows
        kv = edges.select_columns(["key", "val"]).to_pandas()
        return rd.from_arrow(_local_components(kv))
    # the edge stream re-sorts through a groupby EVERY fixpoint round, so
    # block-count overhead multiplies by the diameter: compact when blocks
    # are tiny (pair graphs inherit the band/bucket stage's fragmentation —
    # measured 3× on kg_components at sf0.1). Big edge sets keep their
    # layout: compacting 10^9 rows into n_buckets blocks would be worse.
    if edges.num_blocks() > n_buckets and n_edges / edges.num_blocks() < 65536:
        edges = edges.repartition(n_buckets).materialize()

    # initial labels: every endpoint, labeled with itself (distinct via the
    # same int-bucket exchange the iteration uses)
    def node_rows(t: pa.Table) -> pa.Table:
        u = t.group_by("key").aggregate([])
        return u.rename_columns(["node"])

    from ..functions.shuffles import bucketed_group_apply

    labels = bucketed_group_apply(
        edges.select_columns(["key"]), ["key"], node_rows,
        n_buckets=n_buckets, batch_format="pyarrow",
    ).map_batches(
        lambda t: t.append_column("label", t["node"]), batch_format="pyarrow"
    ).materialize()

    prev_sum = labels.sum(on="label")

    def tag_labels(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(node),
                "val": t["label"],
                "kind": pa.array(np.ones(len(node), dtype=np.int8)),
                "bucket": pa.array(_int_bucket(node, n_buckets)),
            }
        )

    def propagate(g) -> "pa.Table":
        # one hash bucket: label rows (kind=1, key=node, val=label) meet the
        # edge rows (kind=0, key=src, val=dst) of every node hashing here
        import pandas as pd

        lab = g[g["kind"] == 1]
        edge = g[g["kind"] == 0]
        prop = edge.merge(
            lab[["key", "val"]].rename(columns={"val": "label"}), on="key"
        )[["val", "label"]].rename(columns={"val": "node"})
        carry = lab[["key", "val"]].rename(columns={"key": "node", "val": "label"})
        out = pd.concat([prop, carry], ignore_index=True)
        # local min pre-combine: the second exchange only moves ≤1 row per
        # (bucket, node)
        return out.groupby("node", as_index=False)["label"].min()

    def min_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([("label", "min")])
        return g.rename_columns(["node", "label"])

    _ = Min  # Ray aggregate kept for the single-exchange small-graph variant
    for it in range(max_iter):
        cand = (
            edges.union(labels.map_batches(tag_labels, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(propagate, batch_format="pandas")
        )
        labels = bucketed_group_apply(
            cand, ["node"], min_combine, n_buckets=n_buckets,
            batch_format="pyarrow",
        ).materialize()
        new_sum = labels.sum(on="label")
        if new_sum == prev_sum:  # labels are monotone non-increasing
            break
        prev_sum = new_sum
    else:
        logger.warning(
            "connected_components: no fixpoint after %d rounds "
            "(component diameter exceeds max_iter); labels are an "
            "upper-bound clustering", max_iter,
        )
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]), batch_format="pyarrow"
    )


def dedup_survivors_dataset(
    docs,
    pairs,
    id_col: str = "doc_id",
    src: str = "d1",
    dst: str = "d2",
    n_buckets: int = 16,
    num_partitions: int = 16,
):
    """Cluster-level dedup: keep exactly one document per near-dup component.

    ``pairs`` is any candidate-pair Dataset (MinHash-LSH, SimHash, n-gram
    Jaccard); the survivor of each connected component is its minimum
    ``id_col``. Documents in no pair survive untouched. The drop set is a
    Dataset the whole way — removal is a distributed ``left_anti`` join
    (hash-partitioned, ``num_partitions`` ways), never a driver collect.
    """
    comp = connected_components_dataset(
        pairs, src=src, dst=dst, n_buckets=n_buckets
    )

    def losers(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(t["node"], t["component"])
        return t.filter(keep).select(["node"]).rename_columns([id_col])

    # materialize: (a) the convergence check already executed this lineage
    # once — the anti-join must not re-run the whole fixpoint loop; (b) a
    # streaming (non-materialized) right side hands the join scheduler
    # schema-less empty bucket blocks, which break its key-field resolution
    # materialize: the convergence check already executed this lineage once —
    # the anti-join must not re-run the whole fixpoint loop
    drop = comp.map_batches(losers, batch_format="pyarrow").materialize()
    if drop.count() == 0:
        return docs
    # Ray 2.49 hash-shuffle join: a 0-row Arrow block on the join's right
    # side fails key-field resolution inside the aggregator ("No match or
    # multiple matches for FieldRef"); bucket map_groups legitimately emits
    # such blocks. repartition() compacts them away (and balances the
    # small side's blocks for the join).
    drop = drop.repartition(max(1, min(num_partitions, drop.num_blocks())))
    return docs.join(
        drop, join_type="left_anti", num_partitions=num_partitions,
        on=(id_col,),
    )
