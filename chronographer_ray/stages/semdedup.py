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


def _cluster_pairs(tau: float, vec_col: str, id_col: str):
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
        sim = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sim[iu, ju] >= tau
        a, b = ids[iu[hit]], ids[ju[hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"d1": pa.array(lo), "d2": pa.array(hi)})

    return pairs


def semdedup_pairs_dataset(
    emb,
    n_clusters: int = 8,
    iters: int = 3,
    tau: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_partitions: int = 16,
):
    """Within-cluster cosine≥tau candidate pairs → Dataset (d1, d2), d1<d2."""
    from .ann import kmeans_dataset

    # the vectors ride along in the assignment pass (emit_cols) — Arrow's
    # hash join can't carry list<float> payloads, and a second read of the
    # embedding table would double the I/O anyway
    joined, _ = kmeans_dataset(
        emb, n_clusters=n_clusters, iters=iters, vec_col=vec_col,
        id_col=id_col, emit_cols=(vec_col,),
    )
    return joined.groupby("cluster").map_groups(
        _cluster_pairs(tau, vec_col, id_col), batch_format="pandas"
    )


def semdedup_dataset(
    emb,
    n_clusters: int = 8,
    iters: int = 3,
    tau: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Surviving ids after SemDeDup → Dataset (id_col,): one survivor
    (min id) per within-cluster near-dup component."""
    from .components import dedup_survivors_dataset

    pairs = semdedup_pairs_dataset(
        emb, n_clusters=n_clusters, iters=iters, tau=tau,
        vec_col=vec_col, id_col=id_col,
    )
    return dedup_survivors_dataset(
        emb.select_columns([id_col]), pairs, id_col=id_col
    )
