"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: the exact baseline — the query matrix is broadcast
  once (``ray.put``); every batch computes a float64 GEMM against it and
  emits only its LOCAL top-k candidate rows; the driver merges the tiny
  per-batch candidate sets. Network cost: k·batches rows, not the corpus.
- ``ivf_topk``: the scale path — deterministic k-means (fixed seed, few
  Lloyd iterations) partitions vectors into cells; queries probe the
  ``nprobe`` nearest cells only. With ``nprobe == n_cells`` it is exact and
  must agree with the brute-force baseline (tested).

All similarity math is float64 so results are comparable with the DuckDB
``list_cosine_similarity`` oracle.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix(batch: pa.Table, col: str) -> np.ndarray:
    """Zero-copy list<float> → (n, dim) float64 matrix: flatten the Arrow
    list values and reshape (embeddings are fixed-dim; reshape raises on
    ragged input rather than silently mangling). ~20× the per-row
    ``to_pylist`` conversion it replaced."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64).reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BatchTopK:
    """map_batches kernel: local top-k cosine candidates per query."""

    def __init__(self, queries, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        q = queries if isinstance(queries, (np.ndarray, list)) else ray.get(queries)
        self.qids = np.array([r[0] for r in q])
        self.qmat = _normalize(np.array([r[1] for r in q], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.array(batch[self.id_col].to_pylist())
        mat = _normalize(_matrix(batch, self.vec_col))
        sims = self.qmat @ mat.T  # (n_queries, batch)
        # over-select k+1 locally: the query's own vector may sit in this
        # batch's top-k and is excluded, which must not evict the true k-th
        k = min(self.k + 1, mat.shape[0])
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            idx = np.argpartition(-row, k - 1)[:k] if k < mat.shape[0] else np.arange(mat.shape[0])
            emitted = 0
            for j in idx[np.argsort(-row[idx], kind="stable")]:
                if ids[j] == self.qids[qi]:
                    continue  # exclude self-match
                out_q.append(int(self.qids[qi]))
                out_id.append(int(ids[j]))
                out_sim.append(float(row[j]))
                emitted += 1
                if emitted >= self.k:
                    break
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )


def merge_topk(candidates: pa.Table, k: int = 10) -> pa.Table:
    """Driver-side merge of per-batch candidates → (query_id, rank, vec_id).

    Deterministic ordering: sim desc, then vec_id asc on ties.
    """
    import pandas as pd

    df = candidates.to_pandas()
    if df.empty:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "rank": pa.array([], pa.int64()),
             "vec_id": pa.array([], pa.int64())}
        )
    df = df.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k]
    return pa.Table.from_pandas(
        df[["query_id", "rank", "vec_id"]].reset_index(drop=True), preserve_index=False
    )


_TOPK_CACHE: dict = {}


def _topk_task(batch: pa.Table, qref, k: int) -> pa.Table:
    """Task-pool kernel: BatchTopK's setup (normalize the broadcast query
    matrix) is microseconds, so a task pool on Ray's warm workers beats an
    actor pool whose spawn/import ramp dominated the measured small-input
    runs (~2 s fixed). The normalized matrix is cached per (ref, k) in the
    worker process — same once-per-worker economics as an actor."""
    key = (qref.hex() if hasattr(qref, "hex") else id(qref), k)
    stage = _TOPK_CACHE.get(key)
    if stage is None:
        stage = _TOPK_CACHE[key] = BatchTopK(qref, k=k)
    return stage(batch)


def brute_force_topk(ds, queries: list[tuple[int, list[float]]], k: int = 10) -> pa.Table:
    """Exact cosine top-k of each query against the whole Dataset."""
    import ray

    qref = ray.put(queries)
    cands = ds.map_batches(
        _topk_task,
        fn_kwargs={"qref": qref, "k": k},
        batch_format="pyarrow",
        num_cpus=1,
    )
    merged = pa.concat_tables(
        [b for b in cands.iter_batches(batch_size=None, batch_format="pyarrow")]
    ) if cands.count() else pa.table(
        {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
         "sim": pa.array([], pa.float64())}
    )
    return merge_topk(merged, k)


def kmeans_fit(mat: np.ndarray, n_cells: int, iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd iterations; centroids seeded by evenly-strided rows."""
    idx = np.linspace(0, len(mat) - 1, n_cells).astype(int)
    cent = mat[idx].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_cells):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_topk(
    ds,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    train_sample: int = 2048,
) -> pa.Table:
    """IVF-style ANN: assign vectors to cells, probe nprobe cells per query.

    The cell assignment runs as a map_batches over the corpus with the
    centroids broadcast; probed-cell filtering happens batch-side so only
    vectors in probed cells are scored. nprobe == n_cells ⇒ exact.
    """
    import ray

    sample = ds.limit(train_sample).to_pandas()
    mat = np.array(sample["embedding"].tolist(), dtype=np.float64)
    centroids = kmeans_fit(mat, n_cells)
    cent_ref = ray.put(centroids)
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qd = ((qmat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probed = {int(c) for qi in range(len(queries)) for c in np.argsort(qd[qi])[:nprobe]}
    probed_ref = ray.put(sorted(probed))
    qref = ray.put(queries)

    def cell_filtered_topk(batch: pa.Table) -> pa.Table:
        # task-pool kernel with per-worker state cache (setup is trivial —
        # an actor pool's spawn ramp dominated small runs; see _topk_task)
        key = ("ivf", qref.hex() if hasattr(qref, "hex") else id(qref), k)
        state = _TOPK_CACHE.get(key)
        if state is None:
            state = _TOPK_CACHE[key] = (
                BatchTopK(qref, k=k),
                ray.get(cent_ref),
                np.array(ray.get(probed_ref), dtype=np.int64),
            )
        stage, centroids, probed_arr = state
        mat = _matrix(batch, stage.vec_col)
        d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        cells = d.argmin(axis=1)
        keep = np.isin(cells, probed_arr)
        if not keep.any():
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return stage(batch.filter(pa.array(keep)))

    cands = ds.map_batches(cell_filtered_topk, batch_format="pyarrow", num_cpus=1)
    tables = [b for b in cands.iter_batches(batch_size=None, batch_format="pyarrow")]
    merged = (
        pa.concat_tables(tables)
        if tables
        else pa.table(
            {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())}
        )
    )
    return merge_topk(merged, k)


def embedding_lsh_pairs(
    ds,
    tau: float = 0.4,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Random-hyperplane LSH near-dup pairs — the SCALE path for
    embedding-cosine dedup (the label-blocked exact variant is
    ``__ray_entry__.q_embedding_neardup``).

    Per table t of ``n_tables``: bucket key = sign bits of ``v @ R_t``
    (``n_planes`` hyperplanes, fixed seed). Two vectors with cosine
    similarity s collide in one table with probability
    ``(1 - arccos(s)/π)^n_planes``; multiple tables recover recall. Shape:
    ``map_batches`` (bucket keys) → ``groupby(table, bucket)`` →
    vectorized within-bucket pairwise cosine → global pair dedup. No
    all-pairs pass ever runs; bucket width bounds the quadratic term.
    """
    import pandas as pd

    rs = np.random.RandomState(seed)
    dim = len(ds.take(1)[0][vec_col])
    planes = rs.normal(size=(n_tables, dim, n_planes))
    pows = (1 << np.arange(n_planes)).astype(np.int64)

    def bucket_keys(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mat = _normalize(_matrix(b, vec_col))
        tables, buckets, rows = [], [], []
        n = mat.shape[0]
        for t in range(n_tables):
            bits = (mat @ planes[t]) > 0
            key = bits.astype(np.int64) @ pows
            tables.append(np.full(n, t, dtype=np.int32))
            buckets.append(key)
            rows.append(np.arange(n, dtype=np.int64))
        idx = np.concatenate(rows)
        return pa.table(
            {
                "lsh_table": pa.array(np.concatenate(tables)),
                "bucket": pa.array(np.concatenate(buckets)),
                id_col: pc.take(b[id_col], pa.array(idx)),
                vec_col: pc.take(b[vec_col], pa.array(idx)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = _normalize(np.array(g[vec_col].tolist(), dtype=np.float64)[order])
        sims = mat @ mat.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] > tau
        return pd.DataFrame(
            {
                "d1": pd.Series(ids[iu[0][mask]], dtype="int64"),
                "d2": pd.Series(ids[iu[1][mask]], dtype="int64"),
            }
        )

    pairs = (
        ds.map_batches(bucket_keys, batch_format="pyarrow")
        .groupby(["lsh_table", "bucket"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # a pair found in several tables/buckets reports once — a grouped COUNT
    # (one aggregate pass), not map_groups(head(1)) which schedules one
    # near-empty group per candidate pair
    from ray.data.aggregate import Count

    return (
        pairs.groupby(["d1", "d2"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


def label_centroids_dataset(ds, vec_col: str = "embedding",
                            label_col: str = "label"):
    """Per-label centroid of an embedding column, long format
    (label, dim, n, centroid) with centroids rounded to 6 dp.

    Shape: per-batch partial sums (one ``np.add.at`` scatter per batch →
    (labels-in-batch × dim) rows) → one int-bucket exchange summing
    partials → divide. The exchange carries label-vocabulary × dim rows,
    never the corpus; a million-label vocabulary at dim 1024 is ~8 GB of
    partials spread over the cluster — still shuffle-safe, nothing
    driver-side."""
    from ..functions.shuffles import bucketed_group_apply

    def partial(b: pa.Table) -> pa.Table:
        m = _matrix(b, vec_col)
        if m.shape[0] == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        labels = b[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ul, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(ul), m.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv).astype(np.int64)
        dim = m.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(ul, dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(ul))),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64()),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["label", "dim"]).aggregate([("s", "sum"), ("n", "sum")])
        g = g.rename_columns(["label", "dim", "s", "n"])
        s = g["s"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "label": g["label"], "dim": g["dim"], "n": g["n"],
            "centroid": pa.array(np.round(s / n, 6), pa.float64()),
        })

    return bucketed_group_apply(
        ds.select_columns([label_col, vec_col]).map_batches(
            partial, batch_format="pyarrow"),
        ["label", "dim"], merge, batch_format="pyarrow",
    )


def kmeans_dataset(ds, n_clusters: int = 8, iters: int = 5,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   train_sample: int = 2048, emit_cols: tuple = ()):
    """Distributed Lloyd k-means over an embedding Dataset →
    (id_col, cluster) assignments plus the per-iteration inertia trace.

    Each iteration: broadcast the (k × dim) centroid matrix via
    ``ray.put``, one ``map_batches`` pass computes batch-local
    assignments and scatter-adds (cell, dim, s) / (cell, n) partials —
    k×dim numbers per batch cross the network, never vectors; the driver
    folds the partials (k×dim, bounded) and updates centroids. The final
    pass emits assignments. Deterministic: centroids seeded by
    evenly-strided rows of the first ``train_sample`` vectors (same
    scheme as ``kmeans_fit``); no RNG anywhere.

    Returns ``(assignments_dataset, inertia_list)``."""
    import ray

    sample = ds.limit(train_sample).to_pandas()
    init = np.array(sample[vec_col].tolist(), dtype=np.float64)
    idx = np.linspace(0, len(init) - 1, n_clusters).astype(int)
    cent = init[idx].copy()
    dim = cent.shape[1]
    inertia = []

    def make_partial(cent_ref):
        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _matrix(b, vec_col)
            if m.shape[0] == 0:
                return pa.table({"cell": pa.array([], pa.int64()),
                                 "dim": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.float64()),
                                 "n": pa.array([], pa.int64()),
                                 "sq": pa.array([], pa.float64())})
            # ||x-c||² = ||x||² - 2x·c + ||c||² ; argmin over cells
            d = (m * m).sum(1)[:, None] - 2 * (m @ c.T) + (c * c).sum(1)[None, :]
            assign = d.argmin(axis=1)
            sq = d[np.arange(len(assign)), assign]
            sums = np.zeros((n_clusters, m.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=n_clusters).astype(np.int64)
            sqs = np.bincount(assign, weights=np.maximum(sq, 0),
                              minlength=n_clusters)
            return pa.table({
                "cell": pa.array(np.repeat(np.arange(n_clusters, dtype=np.int64),
                                           m.shape[1])),
                "dim": pa.array(np.tile(np.arange(m.shape[1], dtype=np.int64),
                                        n_clusters)),
                "s": pa.array(sums.ravel(), pa.float64()),
                "n": pa.array(np.repeat(counts, m.shape[1]), pa.int64()),
                "sq": pa.array(np.repeat(sqs, m.shape[1]), pa.float64()),
            })
        return partial

    for _ in range(iters):
        cent_ref = ray.put(cent)
        parts = ds.map_batches(make_partial(cent_ref),
                               batch_format="pyarrow").to_pandas()
        agg = parts.groupby(["cell", "dim"], as_index=False).agg(
            s=("s", "sum"), n=("n", "sum"), sq=("sq", "sum"))
        new = cent.copy()
        sums = np.zeros((n_clusters, dim)); counts = np.zeros(n_clusters)
        sums[agg["cell"], agg["dim"]] = agg["s"]
        # n and sq ride along repeated once per dim — the dim-0 slice is
        # the per-cell total
        cell0 = agg[agg["dim"] == 0]
        counts[cell0["cell"].to_numpy()] = cell0["n"].to_numpy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        cent = new
        inertia.append(float(cell0["sq"].sum()))

    cent_ref = ray.put(cent)

    def assign_final(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _matrix(b, vec_col)
        if m.shape[0] == 0:
            empty = {id_col: pa.array([], pa.int64()),
                     "cluster": pa.array([], pa.int64())}
            for c_name in emit_cols:
                empty[c_name] = b[c_name]
            return pa.table(empty)
        d = (m * m).sum(1)[:, None] - 2 * (m @ c.T) + (c * c).sum(1)[None, :]
        cols = {
            id_col: b[id_col],
            "cluster": pa.array(d.argmin(axis=1).astype(np.int64), pa.int64()),
        }
        # rider columns (e.g. the vectors themselves) so downstream
        # per-cluster stages need no join — Arrow's hash join cannot carry
        # list<float> non-key payloads
        for c_name in emit_cols:
            cols[c_name] = b[c_name]
        return pa.table(cols)

    return ds.map_batches(assign_final, batch_format="pyarrow"), inertia


def quantize_int8_dataset(ds, vec_col: str = "embedding",
                          id_col: str = "vec_id"):
    """Per-vector symmetric int8 quantization — the storage/bandwidth
    reduction pass a 100 TB vector corpus runs before ANN serving
    (4× smaller than float32, recall loss ~nil for cosine search).

    q_i = floor(x_i * 127 / max|x| + 0.5) (round-half-up; zero vectors
    quantize to zeros with scale 0). Map-only, vectorized: zero-copy
    list→matrix via `_matrix`, one abs-max + one fused multiply per batch.
    Output is EXPLODED to (id, dim, qval, scale) rows — dim is 1-based —
    so the DuckDB oracle (list lambdas + generate_series) compares plain
    int/double columns instead of list cells, and downstream Arrow
    consumers can re-pack with list_agg ordered by dim.

    All arithmetic is float64 on both sides (float32 inputs upcast
    exactly), so the oracle is bit-identical including .5 ties.
    """

    def quant(b: pa.Table) -> pa.Table:
        m = _matrix(b, vec_col)
        n, dim = m.shape if m.size else (0, 0)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        scale = np.abs(m).max(axis=1) if n else np.zeros(0)
        safe = np.where(scale == 0.0, 1.0, scale)
        q = np.floor(m * 127.0 / safe[:, None] + 0.5).astype(np.int64) if n \
            else np.zeros((0, 0), np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, dim), pa.int64()),
                "dim": pa.array(np.tile(np.arange(1, dim + 1), n), pa.int64()),
                "qval": pa.array(q.ravel(), pa.int64()),
                "scale": pa.array(np.repeat(scale, dim), pa.float64()),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")


# ------------------------------------------------- product quantization
def pq_train(mat: np.ndarray, m: int = 4, k: int = 16,
             iters: int = 5) -> np.ndarray:
    """(m, k, dim/m) PQ codebooks: deterministic `kmeans_fit` per
    subspace (FAISS-style — train on a bounded sample, encode the
    corpus distributed). dim must divide by m."""
    n, dim = mat.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack([
        kmeans_fit(mat[:, j * dsub:(j + 1) * dsub], k, iters)
        for j in range(m)
    ])


def pq_encode_dataset(ds, codebooks: np.ndarray, id_col: str = "vec_id",
                      vec_col: str = "embedding"):
    """PQ-encode the corpus → exploded (id, sub, code) rows (sub is
    1-based, mirroring `quantize_int8_dataset`'s layout). Map-only:
    codebooks broadcast once via ``ray.put``; per batch one
    (n, k, dsub) distance broadcast + argmin per subspace. Storage:
    m bytes per vector (codes are < 256) vs 4*dim float32 — the
    memory-bandwidth step between int8 and binary hashing."""
    import ray

    cb_ref = ray.put(codebooks)

    def encode(b: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref)
        m_sub, k, dsub = cb.shape
        mat = _matrix(b, vec_col)
        n = mat.shape[0] if mat.size else 0
        ids = b[id_col].to_numpy(zero_copy_only=False)
        codes = np.zeros((n, m_sub), np.int64)
        for j in range(m_sub):
            sub = mat[:, j * dsub:(j + 1) * dsub] if n else mat
            d = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d.argmin(axis=1)
        return pa.table({
            id_col: pa.array(np.repeat(ids, m_sub), pa.int64()),
            "sub": pa.array(np.tile(np.arange(1, m_sub + 1), n), pa.int64()),
            "code": pa.array(codes.ravel(), pa.int64()),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_topk(ds, queries: list[tuple[int, list[float]]], k: int = 10,
            m: int = 4, n_codes: int = 16, train_sample: int = 2048,
            rerank: int = 4) -> pa.Table:
    """PQ asymmetric-distance top-k with exact re-rank: codebooks trained
    on a bounded sample, then ONE map pass over the corpus — each batch
    encodes its vectors and scores every query via the per-query
    (m, n_codes) LUT (``dist ~= sum_j LUT[j, code_j]``), a table GATHER
    instead of a d-dim GEMM; the per-batch top ``rerank*k`` PQ candidates
    (only those rows) get an EXACT cosine score — the standard ADC +
    re-rank serving shape, which recovers the recall the quantization
    residual costs while exact work stays O(rerank*k) per query per
    batch. Same tiny `merge_topk` as brute force. Recall vs
    `brute_force_topk` is the test contract."""
    import ray

    sample = ds.limit(train_sample).to_pandas()
    mat = _normalize(np.array(sample["embedding"].tolist(), dtype=np.float64))
    cb = pq_train(mat, m=m, k=n_codes)
    cb_ref = ray.put(cb)
    qref = ray.put(queries)

    def score(b: pa.Table) -> pa.Table:
        # vectors and queries NORMALIZED so squared L2 is monotonic to
        # cosine (||qn - vn||^2 = 2 - 2 cos) — same ranking space as
        # `brute_force_topk`, which is the recall reference; sim = -dist
        # feeds the shared `merge_topk` (sim desc, vec_id tie-break)
        cbs = ray.get(cb_ref)
        qs = ray.get(qref)
        m_sub, _, dsub = cbs.shape
        mat_b = _matrix(b, "embedding")
        n = mat_b.shape[0] if mat_b.size else 0
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        if not n:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        mat_n = _normalize(mat_b)
        codes = np.zeros((n, m_sub), np.int64)
        for j in range(m_sub):
            sub = mat_n[:, j * dsub:(j + 1) * dsub]
            d = ((sub[:, None, :] - cbs[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d.argmin(axis=1)
        out_q, out_v, out_d = [], [], []
        for qid, qvec in qs:
            qv = np.asarray(qvec, np.float64)
            qv = qv / (np.linalg.norm(qv) or 1.0)
            lut = np.stack([
                ((qv[j * dsub:(j + 1) * dsub][None, :] - cbs[j]) ** 2).sum(axis=1)
                for j in range(m_sub)
            ])  # (m, n_codes)
            dist = lut[np.arange(m_sub)[None, :], codes].sum(axis=1)
            keep = ids != qid  # exclude self-match, like BatchTopK
            order = np.argsort(dist, kind="stable")
            cand = order[keep[order]][: min(rerank * k, int(keep.sum()))]
            exact = mat_n[cand] @ qv  # exact re-rank of the short list
            top = cand[np.argsort(-exact, kind="stable")[:k]]
            out_q.append(np.full(top.size, qid, np.int64))
            out_v.append(ids[top])
            out_d.append(mat_n[top] @ qv)
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "sim": pa.array(np.concatenate(out_d), pa.float64()),
        })

    cands = ds.map_batches(score, batch_format="pyarrow")
    return merge_topk(pa.Table.from_pandas(cands.to_pandas()), k=k)


# ----------------------------------------------------------- MMR re-ranking
def mmr_topk(ds, query: list[float], k: int = 10, fetch_k: int = 50,
             lam: float = 0.5, id_col: str = "vec_id",
             vec_col: str = "embedding", exclude_id: int | None = None):
    """Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    1998) → (rank, vec_id, relevance, mmr): greedily pick the candidate
    maximizing

        lam * cos(q, d) − (1 − lam) * max over selected s of cos(d, s)

    (the max over the empty set is 0, so the first pick is the most
    relevant candidate). Ties break on the smaller id; relevance/mmr are
    rounded to 6 dp.

    Shape: ONE distributed pass collects per-block top-``fetch_k``
    (id, relevance, unit vector) candidates — the block-local prune keeps
    the driver merge fetch_k-bounded per block; the global cut and the
    greedy loop run on the driver over a fetch_k×d matrix (50×64 here —
    MMR is sequential by definition, so the candidate pool, not the
    corpus, is what it may ever touch). The iterative float argmax is not
    SQL-expressible — rows-only, with a brute-force replica test."""
    qv = _normalize(np.asarray([query], dtype=np.float64))[0]

    def local(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(_matrix(b, vec_col))
        if mat.shape[0] == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "rel": pa.array([], pa.float64()),
                "v": pa.array([], pa.list_(pa.float64())),
            })
        if exclude_id is not None:
            keep = ids != exclude_id
            ids, mat = ids[keep], mat[keep]
        rel = mat @ qv
        # tie-deterministic local cut (rel desc, id asc), mirroring the
        # driver-side global cut: argpartition keeps an ARBITRARY subset
        # of candidates tied at the fetch_k boundary, which would make
        # the global pool depend on partition layout for duplicate /
        # tied vectors (common in dedup corpora)
        top = (np.lexsort((ids, -rel))[:fetch_k]
               if fetch_k < len(rel) else np.arange(len(rel)))
        return pa.table({
            id_col: pa.array(ids[top]),
            "rel": pa.array(rel[top], pa.float64()),
            "v": pa.array(list(mat[top]), pa.list_(pa.float64())),
        })

    parts = [b for b in ds.map_batches(local, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")]
    if not parts:
        return pa.table({"rank": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "relevance": pa.array([], pa.float64()),
                         "mmr": pa.array([], pa.float64())})
    cand = pa.concat_tables(parts)
    ids = cand[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    rel = cand["rel"].to_numpy(zero_copy_only=False)
    mat = np.array(cand["v"].to_pylist(), np.float64)
    # global fetch_k cut (deterministic: rel desc, id asc)
    order = np.lexsort((ids, -rel))[:fetch_k]
    ids, rel, mat = ids[order], rel[order], mat[order]

    pair = mat @ mat.T                     # candidate-pool pairwise cosine
    chosen: list[int] = []
    max_sel = np.zeros(len(ids))           # max cos to the selected set
    picked = np.zeros(len(ids), bool)
    out_rank, out_id, out_rel, out_mmr = [], [], [], []
    for r in range(1, min(k, len(ids)) + 1):
        score = lam * rel - (1.0 - lam) * max_sel
        score[picked] = -np.inf
        best = np.flatnonzero(score == score[~picked].max())
        j = best[np.argmin(ids[best])]     # tie → smaller id
        picked[j] = True
        chosen.append(j)
        max_sel = np.maximum(max_sel, pair[:, j])
        out_rank.append(r)
        out_id.append(int(ids[j]))
        out_rel.append(round(float(rel[j]), 6))
        out_mmr.append(round(float(score[j]), 6))
    return pa.table({
        "rank": pa.array(out_rank, pa.int64()),
        id_col: pa.array(out_id, pa.int64()),
        "relevance": pa.array(out_rel, pa.float64()),
        "mmr": pa.array(out_mmr, pa.float64()),
    })
