"""Distributed PCA over an embedding column.

Two map-reduce passes that never shuffle a vector:

1. ``covariance_dataset`` — per-block partials (n, Σx, ΣxxT) fold to the
   d×d covariance on the driver (d²-bounded: 64-dim → 32 KB per block
   partial; the shape holds to d ≈ 1-2k, beyond which a randomized-SVD /
   frequent-directions sketch replaces the exact Gram fold).
2. ``pca_project_dataset`` — eigendecompose the d×d covariance on the
   driver (LAPACK ``eigh``, deterministic for a fixed matrix), broadcast
   the top-k eigenvector panel once via ``ray.put``, and project every
   vector map-only: y = (x − μ) V_k.

The covariance is SQL-expressible (Σ x_i x_j / n − μ_i μ_j over two
parallel unnests) and hash-exact at round-6; the eigenbasis is not
(LAPACK), so the projection query is rows-only with pytest parity vs
single-process numpy PCA. No reference counterpart (LLM-pipeline
extension operator; CCNet-style embedding pipelines run exactly this
before clustering/SemDeDup).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_moments(b: pa.Table, vec_col: str):
    """(n, Σx, X'X) for one Arrow block — the whole covariance partial."""
    col = b[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    if n == 0:
        return 0, None, None
    d = len(flat) // n
    x = flat.reshape(n, d)
    return n, x.sum(axis=0), x.T @ x


def covariance_moments(ds, vec_col: str = "embedding"):
    """Fold (n, Σx, ΣxxT) across the Dataset → (n, mean, cov) on the
    driver. ONE streaming pass; only d²-sized partials leave workers."""
    def partial(b: pa.Table) -> pa.Table:
        n, s, g = _batch_moments(b, vec_col)
        if n == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "g": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "g": pa.array([g.ravel().tolist()], pa.list_(pa.float64())),
        })

    n_tot, s_tot, g_tot = 0, None, None
    # block-count-bounded driver fold: one (1 + d + d²)-double row per block
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for i in range(b.num_rows):
            n_tot += int(b["n"][i].as_py())
            s = np.asarray(b["s"][i].as_py(), np.float64)
            g = np.asarray(b["g"][i].as_py(), np.float64)
            s_tot = s if s_tot is None else s_tot + s
            g_tot = g if g_tot is None else g_tot + g
    if n_tot == 0:
        return 0, np.zeros(0), np.zeros((0, 0))
    d = len(s_tot)
    mean = s_tot / n_tot
    cov = g_tot.reshape(d, d) / n_tot - np.outer(mean, mean)
    return n_tot, mean, cov


def covariance_dataset(ds, vec_col: str = "embedding") -> pa.Table:
    """Upper-triangle covariance table → (i, j, cov) with 1-based indices
    (SQL list indexing) and cov rounded to 6 dp — the oracle-checkable
    face of the PCA fit."""
    n, _, cov = covariance_moments(ds, vec_col)
    if n == 0:
        return pa.table({"i": pa.array([], pa.int64()),
                         "j": pa.array([], pa.int64()),
                         "cov": pa.array([], pa.float64())})
    d = cov.shape[0]
    iu, ju = np.triu_indices(d)
    return pa.table({
        "i": pa.array((iu + 1).astype(np.int64)),
        "j": pa.array((ju + 1).astype(np.int64)),
        "cov": pa.array(np.round(cov[iu, ju], 6), pa.float64()),
    })


def pca_fit(ds, vec_col: str = "embedding", k: int = 8):
    """(mean, components (d×k), explained_var (k,)) from the covariance
    eigendecomposition, eigenvectors sign-fixed (largest-|.| component
    positive) so the basis is deterministic across BLAS builds."""
    n, mean, cov = covariance_moments(ds, vec_col)
    if n == 0:
        return mean, np.zeros((0, k)), np.zeros(k)
    w, v = np.linalg.eigh(cov)           # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    w, v = w[order], v[:, order]
    for c in range(v.shape[1]):          # deterministic sign
        a = np.argmax(np.abs(v[:, c]))
        if v[a, c] < 0:
            v[:, c] = -v[:, c]
    return mean, v, w


def pca_project_dataset(ds, vec_col: str = "embedding", k: int = 8,
                        id_col: str = "vec_id"):
    """Project every vector onto the top-k principal axes, map-only after
    a one-shot ``ray.put`` of (mean, V_k) → (id, pc list<double> round 6)."""
    import ray

    mean, v, _ = pca_fit(ds, vec_col, k)
    ref = ray.put((mean, v))

    def project(b: pa.Table) -> pa.Table:
        m, vk = ray.get(ref)
        col = b[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(col)
        ids = b[id_col]
        if n == 0 or vk.size == 0:
            return pa.table({id_col: ids,
                             "pc": pa.array([[]] * n,
                                            pa.list_(pa.float64()))})
        x = flat.reshape(n, -1)
        y = np.round((x - m) @ vk, 6)
        return pa.table({
            id_col: ids,
            "pc": pa.array(list(y), pa.list_(pa.float64())),
        })

    return ds.map_batches(project, batch_format="pyarrow")
