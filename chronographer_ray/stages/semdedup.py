"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): k-means-cluster the embedding space, then prune
near-duplicate pairs WITHIN each cluster only — the quadratic pairwise
cosine is bounded to cluster size instead of the corpus, which is what
makes embedding-level dedup feasible at 10^8+ documents.

Composition of existing engine pieces, all distributed:

1. `kmeans_dataset` (stages/ann.py) — deterministic Lloyd iterations,
   broadcast centroids, k×dim partials per batch across the wire.
2. cluster co-location — `Dataset.join` on the int id, then
   `groupby(cluster).map_groups` so each cluster's vectors meet once.
3. within-cluster cosine≥tau candidate pairs — one GEMM per cluster.
4. `dedup_survivors_dataset` (stages/components.py) — hash-min connected
   components over the pair graph, keep min-id per component, distributed
   left_anti removal.

Approximation contract (the paper's): near-dups in DIFFERENT clusters are
not candidates. Recall is governed by n_clusters — production sizing is
n_clusters ∝ corpus/expected-cluster-size so per-cluster pairwise stays
bounded; tests verify exact agreement with brute-force WITHIN-cluster
ground truth plus measured global recall on a planted corpus.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pairs_block(m: np.ndarray, ids: np.ndarray, tau: float):
    sim = m @ m.T
    iu, ju = np.triu_indices(len(ids), k=1)
    hit = sim[iu, ju] >= tau
    a, b = ids[iu[hit]], ids[ju[hit]]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return lo, hi


def _cluster_pairs(tau: float, vec_col: str, id_col: str,
                   max_cluster_size: int | None = None):
    def pairs(df) -> "pa.Table":
        import pandas as pd  # noqa: F401  (map_groups hands us pandas)

        ids = df[id_col].to_numpy().astype(np.int64)
        if len(ids) < 2:
            return pa.table(
                {"d1": pa.array([], pa.int64()), "d2": pa.array([], pa.int64())}
            )
        m = np.array(df[vec_col].tolist(), dtype=np.float64)
        norm = np.linalg.norm(m, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        m = m / norm
        if max_cluster_size is None or len(ids) <= max_cluster_size:
            lo, hi = _pairs_block(m, ids, tau)
            return pa.table({"d1": pa.array(lo), "d2": pa.array(hi)})
        # last-resort strict bound: a cluster the recursive k-means split
        # could not shrink (e.g. all-identical vectors) is chunked by id
        # order and each chunk GEMMed alone — O(n·cap) instead of O(n²).
        # Chunks overlap by one row, so a run of identical vectors that
        # crosses a chunk edge is chained into one component through the
        # shared boundary row (the downstream hash-min components make
        # the chain transitive).
        order = np.argsort(ids, kind="stable")
        m, ids = m[order], ids[order]
        cap = max_cluster_size
        los, his = [], []
        start = 0
        while start < len(ids):
            end = min(len(ids), start + cap)
            # one-row overlap chains components across chunk edges
            sl = slice(start, min(len(ids), end + 1))
            lo, hi = _pairs_block(m[sl], ids[sl], tau)
            los.append(lo)
            his.append(hi)
            start = end
        return pa.table({
            "d1": pa.array(np.concatenate(los) if los else
                           np.array([], np.int64)),
            "d2": pa.array(np.concatenate(his) if his else
                           np.array([], np.int64)),
        })

    return pairs


def _split_oversized_clusters(
    joined,
    cap: int,
    n_clusters: int,
    iters: int,
    vec_col: str,
    id_col: str,
    max_depth: int = 3,
):
    """Recursively re-cluster oversized clusters (the SemDeDup paper's fix
    for skewed web corpora, VERDICT r2 #4): each round counts cluster
    sizes (k-bounded), pulls every cluster above ``cap`` out, runs ONE
    joint `kmeans_dataset` over the oversized rows with enough centroids
    to land under the cap, and relabels those rows into fresh cluster ids.
    Rows of different parents may share a subcluster — that only ADDS
    candidate pairs (recall can't drop). A cluster k-means cannot shrink
    (identical points) falls through to `_cluster_pairs`' chunked GEMM,
    which strictly bounds the quadratic anyway."""
    import math

    import pyarrow.compute as pc

    from .ann import kmeans_dataset

    joined = joined.materialize()
    next_id = n_clusters
    for _ in range(max_depth):
        sizes = joined.groupby("cluster").count().to_pandas()
        cnt_col = [c for c in sizes.columns if c != "cluster"][0]
        big = sizes[sizes[cnt_col] > cap]
        if big.empty:
            break
        big_ids = pa.array(np.sort(big["cluster"].to_numpy()), pa.int64())
        n_big_rows = int(big[cnt_col].sum())
        small = joined.map_batches(
            lambda b, v=big_ids: b.filter(
                pc.invert(pc.is_in(b["cluster"], value_set=v))
            ),
            batch_format="pyarrow",
        )
        big_rows = joined.map_batches(
            lambda b, v=big_ids: b.filter(
                pc.is_in(b["cluster"], value_set=v)
            ).drop_columns(["cluster"]),
            batch_format="pyarrow",
        )
        # 2× centroid slack: Lloyd never balances perfectly
        n_sub = max(2, 2 * math.ceil(n_big_rows / cap))
        sub, _ = kmeans_dataset(
            big_rows, n_clusters=n_sub, iters=iters, vec_col=vec_col,
            id_col=id_col, emit_cols=(vec_col,),
        )
        sub = sub.map_batches(
            lambda b, off=next_id: b.set_column(
                b.schema.get_field_index("cluster"), "cluster",
                pc.add(b["cluster"], pa.scalar(off, pa.int64())),
            ),
            batch_format="pyarrow",
        )
        next_id += n_sub
        joined = small.union(sub).materialize()
    return joined


def semdedup_pairs_dataset(
    emb,
    n_clusters: int = 8,
    iters: int = 3,
    tau: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_partitions: int = 16,
    max_cluster_size: int | None = None,
):
    """Within-cluster cosine≥tau candidate pairs → Dataset (d1, d2), d1<d2.

    ``max_cluster_size`` caps the per-cluster quadratic: clusters above it
    are recursively re-clustered (`_split_oversized_clusters`), and any
    residue k-means cannot separate is chunk-GEMMed with a one-row overlap
    chain — no single task ever runs an unbounded n². ``None`` (default)
    preserves the exact paper semantics at eval scale; production sizing
    at web scale should set it (~10-50k rows depending on dim)."""
    from .ann import kmeans_dataset

    # the vectors ride along in the assignment pass (emit_cols) — Arrow's
    # hash join can't carry list<float> payloads, and a second read of the
    # embedding table would double the I/O anyway
    joined, _ = kmeans_dataset(
        emb, n_clusters=n_clusters, iters=iters, vec_col=vec_col,
        id_col=id_col, emit_cols=(vec_col,),
    )
    if max_cluster_size is not None:
        joined = _split_oversized_clusters(
            joined, max_cluster_size, n_clusters, iters, vec_col, id_col
        )
    return joined.groupby("cluster").map_groups(
        _cluster_pairs(tau, vec_col, id_col, max_cluster_size),
        batch_format="pandas",
    )


def semdedup_dataset(
    emb,
    n_clusters: int = 8,
    iters: int = 3,
    tau: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_size: int | None = None,
):
    """Surviving ids after SemDeDup → Dataset (id_col,): one survivor
    (min id) per within-cluster near-dup component."""
    from .components import dedup_survivors_dataset

    pairs = semdedup_pairs_dataset(
        emb, n_clusters=n_clusters, iters=iters, tau=tau,
        vec_col=vec_col, id_col=id_col, max_cluster_size=max_cluster_size,
    )
    return dedup_survivors_dataset(
        emb.select_columns([id_col]), pairs, id_col=id_col
    )
