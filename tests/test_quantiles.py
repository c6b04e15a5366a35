"""Per-group quantile stages: exact interpolation + sampled error bound."""
import numpy as np

import ray.data as rd


def _events(n=4000, groups=4, blocks=6, seed=7):
    rng = np.random.default_rng(seed)
    return rd.from_items(
        [
            {"event_id": i, "event_type": f"g{i % groups}",
             "value": float(v)}
            for i, v in enumerate(rng.normal(100, 15, size=n))
        ],
        override_num_blocks=blocks,
    )


def test_exact_group_quantiles_match_numpy():
    from chronographer_ray.stages.quantiles import group_quantiles_dataset

    ds = _events()
    out = (
        group_quantiles_dataset(ds, "event_type", "value")
        .to_pandas().set_index("event_type").sort_index()
    )
    df = ds.to_pandas()
    for g, sub in df.groupby("event_type"):
        assert out.loc[g, "p50"] == round(
            float(np.quantile(sub["value"], 0.5)), 6)
        assert out.loc[g, "p95"] == round(
            float(np.quantile(sub["value"], 0.95)), 6)


def test_sampled_quantiles_bounded_error_and_deterministic():
    from chronographer_ray.stages.quantiles import (
        group_quantiles_dataset, group_quantiles_sampled_dataset,
    )

    ds = _events(n=8000)
    exact = (
        group_quantiles_dataset(ds, "event_type", "value")
        .to_pandas().set_index("event_type").sort_index()
    )
    kw = dict(m=512)
    s1 = (
        group_quantiles_sampled_dataset(ds, "event_type", "value",
                                        "event_id", **kw)
        .to_pandas().set_index("event_type").sort_index()
    )
    # deterministic: same input, different block layout → same sample
    s2 = (
        group_quantiles_sampled_dataset(
            _events(n=8000).repartition(3), "event_type", "value",
            "event_id", **kw)
        .to_pandas().set_index("event_type").sort_index()
    )
    assert s1.equals(s2)
    # rank error O(1/sqrt(m)): for N(100,15), a few percentile points
    # translate to ~ a couple of value units
    assert (s1["p50"] - exact["p50"]).abs().max() < 3.0
    assert (s1["p95"] - exact["p95"]).abs().max() < 5.0


def test_quantiles_null_values_ignored():
    from chronographer_ray.stages.quantiles import group_quantiles_dataset

    ds = rd.from_items(
        [{"event_type": "a", "value": v} for v in (1.0, None, 3.0)]
    )
    out = group_quantiles_dataset(ds, "event_type", "value").to_pandas()
    assert out.iloc[0]["p50"] == 2.0


def test_group_mad_matches_bruteforce(ray_session):
    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.quantiles import group_mad_dataset

    vals_a = [1.0, 2.0, 3.0, 4.0, 100.0]
    vals_b = [10.0, 10.0, 10.0]
    rows = ([{"k": "a", "v": v} for v in vals_a]
            + [{"k": "b", "v": v} for v in vals_b])
    out = (group_mad_dataset(rd.from_items(rows), "k", "v")
           .to_pandas().set_index("k"))
    for k, vals in (("a", vals_a), ("b", vals_b)):
        med = float(np.quantile(vals, 0.5))
        mad = float(np.quantile(np.abs(np.array(vals) - med), 0.5))
        assert out.loc[k, "median_value"] == round(med, 6)
        assert out.loc[k, "mad"] == round(mad, 6)
    # constant group: MAD 0 (outlier-free witness)
    assert out.loc["b", "mad"] == 0.0


def test_anomalous_days_hampel(ray_session):
    """One planted spike day is flagged; steady days are not; the
    flagged row carries that type's median and MAD."""
    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.quantiles import anomalous_days_dataset

    rows = []
    eid = 0
    for d in range(1, 10):
        n = 200 if d == 5 else 10 + (d % 3)  # spike on day 5
        for _ in range(n):
            rows.append({
                "event_type": "click",
                "ts": np.datetime64(f"2024-01-0{d}T12:00:00", "us"),
            })
            eid += 1
    out = anomalous_days_dataset(rd.from_items(rows)).to_pandas()
    assert list(out["day"]) == ["2024-01-05"]
    assert int(out["n_events"].iloc[0]) == 200
    counts = [200 if d == 5 else 10 + (d % 3) for d in range(1, 10)]
    med = float(np.quantile(counts, 0.5))
    mad = float(np.quantile(np.abs(np.array(counts) - med), 0.5))
    assert out["median_n"].iloc[0] == round(med, 6)
    assert out["mad_n"].iloc[0] == round(mad, 6)
