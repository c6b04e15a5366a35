"""PCA stage: distributed moment fold vs single-process numpy."""
import numpy as np
import pyarrow as pa
import pytest


def _vec_ds(x: np.ndarray, blocks: int = 3):
    import ray.data as rd

    items = [{"vec_id": i, "embedding": row.astype(np.float32).tolist()}
             for i, row in enumerate(x)]
    return rd.from_items(items).repartition(blocks)


@pytest.fixture(scope="module")
def rng_data():
    rng = np.random.RandomState(7)
    # anisotropic cloud so the principal axes are well separated
    base = rng.randn(120, 6) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    rot, _ = np.linalg.qr(rng.randn(6, 6))
    return base @ rot + rng.randn(6)


def test_covariance_matches_numpy(ray_session, rng_data):
    from chronographer_ray.stages.pca import covariance_dataset

    # float32 storage: the kernel sees the same rounded values numpy does
    x = rng_data.astype(np.float32).astype(np.float64)
    out = covariance_dataset(_vec_ds(rng_data)).to_pandas()
    cov = np.cov(x, rowvar=False, bias=True)
    d = x.shape[1]
    assert len(out) == d * (d + 1) // 2
    for _, r in out.iterrows():
        assert r["cov"] == pytest.approx(
            cov[int(r["i"]) - 1, int(r["j"]) - 1], abs=2e-6)


def test_pca_fit_matches_numpy_eigh(ray_session, rng_data):
    from chronographer_ray.stages.pca import pca_fit

    x = rng_data.astype(np.float32).astype(np.float64)
    mean, v, w = pca_fit(_vec_ds(rng_data), k=3)
    cov = np.cov(x, rowvar=False, bias=True)
    we, ve = np.linalg.eigh(cov)
    top = np.argsort(we)[::-1][:3]
    assert np.allclose(w, we[top], rtol=1e-9, atol=1e-9)
    for c, e in enumerate(top):
        col = ve[:, e]
        a = np.argmax(np.abs(col))
        if col[a] < 0:
            col = -col
        assert np.allclose(v[:, c], col, atol=1e-9)


def test_pca_project_variance_is_eigenvalue(ray_session, rng_data):
    """Projected coordinates have per-axis variance ≈ the eigenvalues and
    zero cross-correlation (PCA's defining property)."""
    from chronographer_ray.stages.pca import pca_fit, pca_project_dataset

    ds = _vec_ds(rng_data)
    _, _, w = pca_fit(ds, k=3)
    out = pca_project_dataset(ds, k=3).to_pandas().sort_values("vec_id")
    y = np.array(out["pc"].tolist())
    assert y.shape == (len(rng_data), 3)
    got = np.cov(y, rowvar=False, bias=True)
    assert np.allclose(np.diag(got), w, rtol=1e-4)
    off = got - np.diag(np.diag(got))
    assert np.abs(off).max() < 1e-6


def test_pca_empty_input(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.pca import covariance_dataset

    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }))
    assert covariance_dataset(empty).num_rows == 0
