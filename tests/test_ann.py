"""Similarity search: brute-force == numpy oracle; IVF(full-probe) == exact;
IVF(partial) high recall."""
import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus():
    rs = np.random.RandomState(7)
    mat = rs.randn(200, 16)
    ids = np.arange(200)
    return ids, mat


def _oracle_topk(ids, mat, queries, k):
    qm = np.array([q[1] for q in queries], dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = qn @ mn.T
    out = []
    for qi, (qid, _) in enumerate(queries):
        order = sorted(
            (i for i in ids if i != qid),
            key=lambda i: (-sims[qi, i], i),
        )[:k]
        out.extend((qid, rank + 1, int(v)) for rank, v in enumerate(order))
    return sorted(out)


def _ds(ids, mat):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"vec_id": ids.tolist(), "embedding": [r.tolist() for r in mat]})
    )


def test_brute_force_matches_oracle(ray_session, corpus):
    from chronographer_ray.stages.ann import brute_force_topk

    ids, mat = corpus
    queries = [(int(i), mat[i].tolist()) for i in range(3)]
    got = brute_force_topk(_ds(ids, mat), queries, k=5)
    rows = sorted(
        zip(got["query_id"].to_pylist(), got["rank"].to_pylist(), got["vec_id"].to_pylist())
    )
    assert rows == _oracle_topk(ids, mat, queries, 5)


def test_ivf_full_probe_is_exact(ray_session, corpus):
    from chronographer_ray.stages.ann import ivf_topk

    ids, mat = corpus
    queries = [(int(i), mat[i].tolist()) for i in range(3)]
    got = ivf_topk(_ds(ids, mat), queries, k=5, n_cells=4, nprobe=4)
    rows = sorted(
        zip(got["query_id"].to_pylist(), got["rank"].to_pylist(), got["vec_id"].to_pylist())
    )
    assert rows == _oracle_topk(ids, mat, queries, 5)


def test_ivf_partial_probe_has_high_recall(ray_session, corpus):
    from chronographer_ray.stages.ann import ivf_topk

    ids, mat = corpus
    queries = [(int(i), mat[i].tolist()) for i in range(5)]
    exact = {(q, v) for q, _, v in _oracle_topk(ids, mat, queries, 10)}
    got = ivf_topk(_ds(ids, mat), queries, k=10, n_cells=8, nprobe=4)
    approx = set(zip(got["query_id"].to_pylist(), got["vec_id"].to_pylist()))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5


def test_ivf_partial_probe_recall_on_clustered_corpus(ray_session):
    """The stated IVF recall target: on cluster-structured embeddings (the
    workload IVF is built for), nprobe=2 of n_cells=8 must reach recall@10
    ≥ 0.9 vs brute force. Guards the partial-probe path against silent
    cell-assignment or probing regressions (the exact nprobe=n_cells test
    can't see those)."""
    from chronographer_ray.stages.ann import ivf_topk

    rs = np.random.RandomState(11)
    centers = rs.randn(8, 16) * 6.0
    mat = np.vstack([c + rs.randn(60, 16) for c in centers])  # 480 vecs
    ids = np.arange(len(mat))
    queries = [(int(i), mat[i].tolist()) for i in (0, 75, 140, 210, 300, 430)]
    exact = {(q, v) for q, _, v in _oracle_topk(ids, mat, queries, 10)}
    got = ivf_topk(_ds(ids, mat), queries, k=10, n_cells=8, nprobe=2)
    approx = set(zip(got["query_id"].to_pylist(), got["vec_id"].to_pylist()))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_embedding_lsh_neardup_recall(ray_session):
    """LSH near-dup (scale path) recovers ≥80% of the exact cosine pairs on
    the clustered synthetic embeddings, with zero false positives above τ."""
    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.ann import embedding_lsh_pairs

    rng = np.random.RandomState(7)
    base = rng.normal(size=(8, 16))
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(6):
            v = base[c] + rng.normal(scale=0.05, size=16)
            rows.append({"vec_id": vid, "embedding": v.tolist()})
            vid += 1
    ds = rd.from_items(rows)

    mat = np.array([r["embedding"] for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    iu = np.triu_indices(len(rows), k=1)
    exact = {(int(i), int(j)) for i, j in zip(*[x[sims[iu] > 0.9] for x in iu])}
    exact = {(i, j) for i, j in zip(iu[0][sims[iu] > 0.9], iu[1][sims[iu] > 0.9])}

    got_df = embedding_lsh_pairs(ds, tau=0.9, n_planes=6, n_tables=6).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(got_df["d1"], got_df["d2"])}
    assert got <= exact  # every reported pair is truly above τ
    assert len(got & exact) / max(len(exact), 1) >= 0.8, (len(got), len(exact))


def test_label_centroids_match_numpy():
    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.ann import label_centroids_dataset

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(120, 8)).astype(np.float32)
    labels = (np.arange(120) % 3).astype(np.int64)
    ds = rd.from_items(
        [{"label": int(l), "embedding": v.tolist()}
         for l, v in zip(labels, vecs)],
        override_num_blocks=5,
    )
    out = label_centroids_dataset(ds).to_pandas()
    assert len(out) == 3 * 8
    for lab in range(3):
        expect = vecs[labels == lab].astype(np.float64).mean(axis=0)
        sub = out[out["label"] == lab].sort_values("dim")
        assert (sub["n"] == (labels == lab).sum()).all()
        np.testing.assert_allclose(
            sub["centroid"].to_numpy(), np.round(expect, 6), atol=1.5e-6)


def test_kmeans_recovers_blobs_and_inertia_decreases():
    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.ann import kmeans_dataset

    rng = np.random.default_rng(5)
    centers = np.array([[10.0, 0, 0, 0], [-10.0, 0, 0, 0], [0, 10.0, 0, 0]])
    vecs, labels = [], []
    for li, c in enumerate(centers):
        pts = c + rng.normal(scale=0.5, size=(60, 4))
        vecs.extend(pts.tolist()); labels.extend([li] * 60)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": [float(x) for x in v]}
         for i, v in enumerate(vecs)],
        override_num_blocks=4,
    )
    assigns, inertia = kmeans_dataset(ds, n_clusters=3, iters=4)
    out = assigns.to_pandas().set_index("vec_id").sort_index()
    # inertia never increases across Lloyd iterations
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:]))
    # each true blob maps to exactly one k-means cluster (pure recovery
    # on well-separated blobs)
    import pandas as pd

    df = pd.DataFrame({"label": labels, "cluster": out["cluster"].to_numpy()})
    for _, sub in df.groupby("label"):
        assert sub["cluster"].nunique() == 1
    assert df.groupby("label")["cluster"].first().nunique() == 3


def test_quantize_int8_roundtrip_and_edges(ray_session):
    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.ann import quantize_int8_dataset

    vecs = [
        {"vec_id": 1, "embedding": [1.0, -0.5, 0.25, 0.0]},
        {"vec_id": 2, "embedding": [0.0, 0.0, 0.0, 0.0]},  # zero vector
        {"vec_id": 3, "embedding": [-2.0, 2.0, 1.0, -1.0]},
    ]
    rows = quantize_int8_dataset(rd.from_items(vecs)).take_all()
    by = {}
    for r in rows:
        by.setdefault(r["vec_id"], {})[r["dim"]] = r
    # vec 1: scale 1.0 -> q = floor(x*127 + 0.5)
    assert [by[1][d]["qval"] for d in (1, 2, 3, 4)] == [127, -63, 32, 0]
    assert by[1][1]["scale"] == 1.0
    # zero vector: all-zero qvals, scale 0
    assert all(by[2][d]["qval"] == 0 for d in (1, 2, 3, 4))
    assert by[2][1]["scale"] == 0.0
    # qvals bounded to [-127, 127]; dequantization error <= scale/254 + eps
    for v in vecs:
        scale = max(abs(x) for x in v["embedding"])
        for d, x in enumerate(v["embedding"], start=1):
            q = by[v["vec_id"]][d]["qval"]
            assert -127 <= q <= 127
            if scale:
                assert abs(q * scale / 127.0 - x) <= scale / 254.0 + 1e-12


def test_int8_quantized_ann_recall(ray_session):
    """Recall claim behind quantize_int8: brute-force cosine top-10 over
    DEquantized int8 vectors recovers >= 0.95 of the fp32 top-10 on a
    clustered corpus."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(8, 32) * 3
    vecs = np.vstack([centers[i % 8] + rng.randn(32) * 0.5 for i in range(400)])

    def topk(mat, q, k=10):
        m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        return set(np.argsort(-(m @ qn))[:k])

    scale = np.abs(vecs).max(axis=1, keepdims=True)
    q8 = np.floor(vecs * 127.0 / scale + 0.5)
    deq = q8 * scale / 127.0

    recalls = []
    for qi in range(0, 400, 40):
        exact = topk(vecs, vecs[qi])
        approx = topk(deq, vecs[qi])
        recalls.append(len(exact & approx) / 10)
    assert np.mean(recalls) >= 0.95


# ---------------------------------------------------- product quantization
def test_pq_train_shape_and_dim_check():
    from chronographer_ray.stages.ann import pq_train

    rs = np.random.RandomState(5)
    cb = pq_train(rs.randn(100, 16), m=4, k=8)
    assert cb.shape == (4, 8, 4)
    with pytest.raises(ValueError):
        pq_train(rs.randn(10, 10), m=4, k=2)


def test_pq_encode_layout_and_determinism(ray_session, corpus):
    from chronographer_ray.stages.ann import pq_encode_dataset, pq_train

    ids, mat = corpus
    cb = pq_train(mat, m=4, k=8)
    a = pq_encode_dataset(_ds(ids, mat), cb).to_pandas().sort_values(
        ["vec_id", "sub"]).reset_index(drop=True)
    b = pq_encode_dataset(_ds(ids, mat), cb).to_pandas().sort_values(
        ["vec_id", "sub"]).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) == 200 * 4
    assert set(a["sub"]) == {1, 2, 3, 4}
    assert a["code"].between(0, 7).all()


def test_pq_recall_on_clustered_corpus(ray_session):
    """Clustered embeddings (PQ's intended workload): asymmetric-distance
    top-10 with 4x32 codebooks must stay close to brute-force cosine."""
    from chronographer_ray.stages.ann import pq_topk

    rs = np.random.RandomState(11)
    centers = rs.randn(8, 16) * 6.0
    mat = np.vstack([c + rs.randn(60, 16) for c in centers])
    ids = np.arange(len(mat))
    queries = [(int(i), mat[i].tolist()) for i in (0, 75, 140, 210, 300, 430)]
    exact = {(q, v) for q, _, v in _oracle_topk(ids, mat, queries, 10)}
    got = pq_topk(_ds(ids, mat), queries, k=10, m=4, n_codes=32,
                  train_sample=480)
    approx = set(zip(got["query_id"].to_pylist(), got["vec_id"].to_pylist()))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall  # measured 0.967 (ADC + exact re-rank)


def test_pq_more_codes_reduce_quantization_error(ray_session, corpus):
    """Reconstruction error must fall as the per-subspace codebook grows —
    the monotonicity that makes PQ a tunable recall/size dial."""
    from chronographer_ray.stages.ann import pq_train

    ids, mat = corpus

    def recon_err(k):
        cb = pq_train(mat, m=4, k=k)
        err = 0.0
        for j in range(4):
            sub = mat[:, j * 4:(j + 1) * 4]
            d = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
            err += d.min(axis=1).sum()
        return err

    e2, e8, e32 = recon_err(2), recon_err(8), recon_err(32)
    assert e2 > e8 > e32


def test_mmr_matches_bruteforce_replica(ray_session):
    """Distributed candidate pass + greedy == a single-process MMR."""
    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.ann import mmr_topk

    rng = np.random.RandomState(11)
    mat = rng.randn(200, 16)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": mat[i].astype(np.float32).tolist()}
         for i in range(200)]
    ).repartition(4)
    q = mat[0].astype(np.float32).tolist()
    out = mmr_topk(ds, q, k=8, fetch_k=30, lam=0.5,
                   exclude_id=0).to_pandas()

    # single-process replica over float32-rounded vectors
    m = mat.astype(np.float32).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    qv = m[0]
    ids = np.arange(1, 200)
    rel = m[1:] @ qv
    order = np.lexsort((ids, -rel))[:30]
    ids, rel, mm = ids[order], rel[order], m[1:][order]
    pair = mm @ mm.T
    picked = np.zeros(30, bool)
    max_sel = np.zeros(30)
    expect = []
    for _ in range(8):
        score = 0.5 * rel - 0.5 * max_sel
        score[picked] = -np.inf
        best = np.flatnonzero(score == score[~picked].max())
        j = best[np.argmin(ids[best])]
        picked[j] = True
        max_sel = np.maximum(max_sel, pair[:, j])
        expect.append(int(ids[j]))
    assert out["vec_id"].tolist() == expect
    assert out["rank"].tolist() == list(range(1, 9))


def test_mmr_lambda_extremes(ray_session):
    """λ=1 reduces to pure relevance order; λ=0 after the first pick
    maximizes diversity (picks the candidate least similar to the set)."""
    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.ann import brute_force_topk, mmr_topk

    rng = np.random.RandomState(3)
    mat = rng.randn(100, 8)
    ds = rd.from_items(
        [{"vec_id": i, "embedding": mat[i].astype(np.float32).tolist()}
         for i in range(100)]
    )
    q = mat[0].astype(np.float32).tolist()
    pure = mmr_topk(ds, q, k=5, fetch_k=20, lam=1.0,
                    exclude_id=0).to_pandas()
    bf = brute_force_topk(ds, [(0, q)], k=5).to_pandas()
    assert pure["vec_id"].tolist() == bf["vec_id"].tolist()

    div = mmr_topk(ds, q, k=5, fetch_k=20, lam=0.0,
                   exclude_id=0).to_pandas()
    # λ=0: scores after the first pick are ≤ 0 (pure redundancy penalty)
    assert (div["mmr"].to_numpy()[1:] <= 0).all()
