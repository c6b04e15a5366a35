"""SemDeDup: within-cluster exactness, planted-duplicate recall,
determinism."""
import numpy as np
import pyarrow as pa
import pytest

from chronographer_ray.stages.semdedup import (
    semdedup_dataset,
    semdedup_pairs_dataset,
)


def _emb_ds(vectors: np.ndarray):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(vectors), dtype=np.int64)),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vectors],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )


def _planted(n_groups: int = 6, dups_per_group: int = 3, dim: int = 16,
             noise: float = 0.01) -> tuple[np.ndarray, list[list[int]]]:
    """Groups of near-identical vectors around well-separated anchors."""
    rng = np.random.RandomState(7)
    anchors = rng.randn(n_groups, dim) * 4
    vecs, groups = [], []
    i = 0
    for g in range(n_groups):
        members = []
        for _ in range(dups_per_group):
            vecs.append(anchors[g] + rng.randn(dim) * noise)
            members.append(i)
            i += 1
        groups.append(members)
    return np.array(vecs), groups


def test_within_cluster_pairs_exact(ray_session):
    """Pairs emitted == brute-force cosine>=tau restricted to same-cluster,
    computed independently from the same deterministic k-means labels."""
    from chronographer_ray.stages.ann import kmeans_dataset

    vecs, _ = _planted()
    ds = _emb_ds(vecs)
    tau = 0.95
    assigns, _ = kmeans_dataset(ds, n_clusters=4, iters=3)
    lab = assigns.to_pandas().set_index("vec_id")["cluster"].to_dict()

    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    # float32 storage: recompute ground truth from the float32 round-trip
    m32 = vecs.astype(np.float32).astype(np.float64)
    m32 = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    sim = m32 @ m32.T
    want = {
        (i, j)
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
        if lab[i] == lab[j] and sim[i, j] >= tau
    }
    got_df = semdedup_pairs_dataset(ds, n_clusters=4, iters=3, tau=tau).to_pandas()
    got = set(zip(got_df["d1"], got_df["d2"]))
    assert got == want


def test_survivors_one_per_planted_group(ray_session):
    vecs, groups = _planted()
    ds = _emb_ds(vecs)
    kept = set(semdedup_dataset(ds, n_clusters=6, iters=3, tau=0.9)
               .to_pandas()["vec_id"])
    # recall: every planted group collapses to exactly its min id, as long
    # as k-means put the group in one cluster (anchors are well-separated
    # at noise=0.01, so it does)
    assert kept == {min(g) for g in groups}


def test_semdedup_deterministic(ray_session):
    vecs, _ = _planted(n_groups=4, dups_per_group=4)
    ds = _emb_ds(vecs)
    a = sorted(semdedup_dataset(ds, tau=0.92).to_pandas()["vec_id"])
    b = sorted(semdedup_dataset(ds, tau=0.92).to_pandas()["vec_id"])
    assert a == b


def test_cluster_cap_skewed_corpus(ray_session):
    """A 90%-one-cluster corpus (VERDICT r2 #4): with max_cluster_size set,
    the mega-cluster is recursively split before the pairwise GEMM and
    planted exact duplicates are still all collapsed."""
    rng = np.random.RandomState(11)
    dim = 8
    # 180 vectors in one tight blob (one k-means cluster) + 20 scattered
    blob = rng.randn(1, dim) * 4 + rng.randn(180, dim) * 0.3
    far = rng.randn(20, dim) * 8 + 40
    vecs = np.concatenate([blob, far])
    # plant exact duplicates inside the blob: ids (5, 105), (17, 117)
    vecs[105] = vecs[5]
    vecs[117] = vecs[17]
    ds = _emb_ds(vecs)
    kept = set(
        semdedup_dataset(
            ds, n_clusters=2, iters=3, tau=0.999999, max_cluster_size=40
        ).to_pandas()["vec_id"]
    )
    assert 105 not in kept and 117 not in kept
    assert 5 in kept and 17 in kept
    assert len(kept) == len(vecs) - 2


def test_cluster_cap_split_clusters_bounded(ray_session):
    """_split_oversized_clusters shrinks every splittable cluster to ≤ cap
    (2× slack centroids; separable data splits in one round)."""
    from chronographer_ray.stages.ann import kmeans_dataset
    from chronographer_ray.stages.semdedup import _split_oversized_clusters

    vecs, _ = _planted(n_groups=8, dups_per_group=10, noise=0.05)
    ds = _emb_ds(vecs)
    joined, _ = kmeans_dataset(
        ds, n_clusters=2, iters=3, emit_cols=("embedding",)
    )
    capped = _split_oversized_clusters(
        joined, cap=15, n_clusters=2, iters=3,
        vec_col="embedding", id_col="vec_id",
    )
    sizes = capped.groupby("cluster").count().to_pandas()
    cnt = [c for c in sizes.columns if c != "cluster"][0]
    assert int(sizes[cnt].max()) <= 15
    # every row survives the split exactly once
    assert int(sizes[cnt].sum()) == len(vecs)


def test_chunked_gemm_fallback_identical_points(ray_session):
    """All-identical vectors: k-means can never split them, so the chunked
    GEMM with one-row overlap must still chain the whole run into one
    component (strict bound on the quadratic, recall preserved)."""
    vecs = np.tile(np.ones(8) * 3.0, (50, 1))
    ds = _emb_ds(vecs)
    kept = sorted(
        semdedup_dataset(
            ds, n_clusters=1, iters=1, tau=0.99, max_cluster_size=7
        ).to_pandas()["vec_id"]
    )
    assert kept == [0]


def test_no_dups_is_identity(ray_session):
    rng = np.random.RandomState(3)
    vecs = rng.randn(20, 8) * 5  # far apart, no near-dups at tau→1
    ds = _emb_ds(vecs)
    kept = sorted(semdedup_dataset(ds, n_clusters=3, tau=0.999999)
                  .to_pandas()["vec_id"])
    assert kept == list(range(20))
