"""Hash-priority sampling and HLL cardinality sketch."""
import hashlib

import numpy as np
import pyarrow as pa

from chronographer_ray.stages.sampling import (
    splitmix64,
    stratified_sample_dataset,
    uniform_sample_dataset,
)
from chronographer_ray.stages.sketch import (
    _bit_length_u64,
    distinct_count_dataset,
    hll_distinct_dataset,
)


def test_bit_length_matches_python():
    vals = np.array(
        [0, 1, 2, 3, 4, 7, 8, (1 << 40) - 1, 1 << 40, (1 << 63), 2**64 - 1],
        dtype=np.uint64,
    )
    got = _bit_length_u64(vals)
    assert got.tolist() == [int(v).bit_length() for v in vals.tolist()]


def test_uniform_sample_matches_bruteforce(ray_session):
    import ray.data as rd

    n, k = 5000, 100
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    got = uniform_sample_dataset(ds, k=k, key_col="doc_id").to_pandas()
    pri = (splitmix64(np.arange(n, dtype=np.int64)) >> np.uint64(1)).astype(
        np.int64
    )
    expect = set(np.argsort(pri, kind="stable")[:k].tolist())
    assert set(got["doc_id"]) == expect
    assert len(got) == k


def test_uniform_sample_md5_matches_bruteforce(ray_session):
    import ray.data as rd

    n, k = 400, 25
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    got = uniform_sample_dataset(ds, k=k, key_col="doc_id", method="md5")
    got = got.to_pandas()
    pri = sorted(range(n), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    assert sorted(got["doc_id"]) == sorted(pri[:k])


def test_uniform_sample_block_invariant(ray_session):
    """The sample is a pure function of the keys — block layout must not
    change it."""
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
    a = uniform_sample_dataset(rd.from_arrow(t), 50).to_pandas()
    b = uniform_sample_dataset(
        rd.from_arrow(t).repartition(7), 50
    ).to_pandas()
    assert set(a["doc_id"]) == set(b["doc_id"])


def test_stratified_sample_counts(ray_session):
    import ray.data as rd

    strata = ["a"] * 500 + ["b"] * 30 + ["c"] * 5
    t = pa.table(
        {
            "event_id": pa.array(range(len(strata)), pa.int64()),
            "event_type": pa.array(strata),
        }
    )
    got = stratified_sample_dataset(
        rd.from_arrow(t), k=20, stratum_col="event_type", key_col="event_id"
    ).to_pandas()
    sizes = got.groupby("event_type")["event_id"].count().to_dict()
    assert sizes == {"a": 20, "b": 20, "c": 5}  # min(k, stratum size)
    # within-stratum selection = that stratum's k smallest priorities
    a_ids = np.array([i for i, s in enumerate(strata) if s == "a"])
    pri = (splitmix64(a_ids.astype(np.int64)) >> np.uint64(1)).astype(np.int64)
    expect_a = set(a_ids[np.argsort(pri, kind="stable")[:20]].tolist())
    assert set(got[got["event_type"] == "a"]["event_id"]) == expect_a


def test_hll_within_error_bound(ray_session):
    import ray.data as rd

    n = 20000
    # duplicated keys: true cardinality n, row count 2n
    keys = np.concatenate([np.arange(n), np.arange(n)])
    ds = rd.from_arrow(pa.table({"user_id": pa.array(keys, pa.int64())}))
    est = hll_distinct_dataset(ds, "user_id").to_pandas()["n_distinct_est"][0]
    assert abs(est - n) / n < 0.03  # p=14 → σ≈0.8%; 3% ≈ 3.7σ
    exact = distinct_count_dataset(ds, "user_id").to_pandas()["n_distinct"][0]
    assert exact == n


def test_hll_empty(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"user_id": pa.array([], pa.int64())}))
    assert hll_distinct_dataset(ds, "user_id").to_pandas()["n_distinct_est"][0] == 0


def test_weighted_mix_rates_and_determinism(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.sampling import weighted_mix_dataset

    docs = [
        {"doc_id": i, "source": ["keep_all", "half", "none"][i % 3]}
        for i in range(900)
    ]
    rates = {"keep_all": 1.0, "half": 0.5, "none": 0.0}

    for method in ("splitmix64", "md5"):
        ds = rd.from_items(docs)
        rows = weighted_mix_dataset(
            ds, rates.__getitem__, method=method
        ).take_all()
        by_src = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r["doc_id"])
        assert len(by_src.get("keep_all", [])) == 300
        assert "none" not in by_src
        assert 100 < len(by_src["half"]) < 200  # ~150, deterministic

        # layout invariance: same kept set under a different partitioning
        rows2 = weighted_mix_dataset(
            rd.from_items(docs).repartition(7), rates.__getitem__, method=method
        ).take_all()
        assert sorted(r["doc_id"] for r in rows) == sorted(
            r["doc_id"] for r in rows2
        )


def test_deterministic_shuffle_rank_properties(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.sampling import deterministic_shuffle_dataset

    docs = [{"doc_id": i} for i in range(1000)]
    for method in ("splitmix64", "md5"):
        rows = deterministic_shuffle_dataset(
            rd.from_items(docs), n_shards=8, method=method
        ).take_all()
        assert len(rows) == 1000
        # ranks reconstruct to a gap-free permutation of 0..999
        ranks = sorted(r["pos"] * 8 + r["shard"] for r in rows)
        assert ranks == list(range(1000))
        # per-shard positions are 0..len-1 without gaps
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        assert set(by_shard) == set(range(8))
        for ps in by_shard.values():
            assert sorted(ps) == list(range(len(ps)))
        # layout invariance
        rows2 = deterministic_shuffle_dataset(
            rd.from_items(docs).repartition(13), n_shards=8, method=method
        ).take_all()
        key = lambda rs: sorted((r["doc_id"], r["shard"], r["pos"]) for r in rs)
        assert key(rows) == key(rows2)
        # it actually shuffles: doc order within shard 0 is not id order
        s0 = [r["doc_id"] for r in sorted(rows, key=lambda r: r["pos"])
              if r["shard"] == 0]
        assert s0 != sorted(s0)


def test_hash_split_deterministic_and_exact(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.sampling import hash_split_dataset, splitmix64

    import numpy as np

    docs = [{"doc_id": i} for i in range(2000)]
    rows = hash_split_dataset(rd.from_items(docs)).take_all()
    got = {r["doc_id"]: r["split"] for r in rows}
    # exact integer recurrence, independent reimplementation
    ids = np.arange(2000, dtype=np.int64)
    m = splitmix64(ids) % np.uint64(10)
    want = {
        int(i): ("train" if b < 8 else "val" if b < 9 else "test")
        for i, b in zip(ids, m)
    }
    assert got == want
    # roughly 8/1/1 and layout-invariant
    from collections import Counter

    c = Counter(got.values())
    assert 0.7 < c["train"] / 2000 < 0.9
    rows2 = hash_split_dataset(
        rd.from_items(docs).repartition(7)
    ).take_all()
    assert {r["doc_id"]: r["split"] for r in rows2} == got


def test_hash_split_weights_validation(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.sampling import hash_split_dataset

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_split_dataset(rd.from_items([{"doc_id": 1}]), weights=(1, 1),
                           names=("a",))


def test_hll_registers_density_and_estimate(ray_session):
    """The register table is dense (all 2^p rows), matches a single-pass
    numpy computation, and reproduces the estimator's input state."""
    import ray.data as rd

    from chronographer_ray.stages.sketch import (
        _estimate,
        _registers_for_batch,
        hll_registers_dataset,
    )

    keys = np.arange(1, 5001, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"user_id": pa.array(keys)}))
    df = hll_registers_dataset(ds, "user_id", p=8).to_pandas()
    assert len(df) == 256
    assert list(df["register"]) == list(range(256))
    want = _registers_for_batch(keys, 8)
    assert (df["rho"].to_numpy() == want).all()
    est = _estimate(df["rho"].to_numpy(), 8)
    assert abs(est - 5000) / 5000 < 0.25  # p=8 -> sigma ~6.5%


def test_temperature_mix_rates_and_floor(ray_session):
    """alpha<1: the smallest source keeps 100%; larger sources thin with
    keep-rate (p_s/p_min)^(alpha-1); alpha=1 is the identity."""
    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.sampling import (
        splitmix64,
        temperature_mix_dataset,
    )

    rows = ([{"doc_id": i, "source": "big"} for i in range(900)]
            + [{"doc_id": 1000 + i, "source": "small"} for i in range(100)])
    ds = rd.from_items(rows)

    out = temperature_mix_dataset(ds, alpha=0.7).to_pandas()
    # smallest source: rate 1.0 → every row survives
    assert (out["source"] == "small").sum() == 100
    # big source: keep iff splitmix64(id) < r*2^64 with r=(0.9/0.1)^-0.3
    r = (0.9 / 0.1) ** -0.3
    ids = np.arange(900, dtype=np.int64)
    expect = (splitmix64(ids).astype(np.float64) < r * 2.0**64).sum()
    assert (out["source"] == "big").sum() == expect

    full = temperature_mix_dataset(ds, alpha=1.0).to_pandas()
    assert len(full) == 1000
