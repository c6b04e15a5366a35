"""Grouped top-N and z-score stages."""
import numpy as np

import ray.data as rd


def _ds(n=300, groups=3, blocks=5):
    rng = np.random.default_rng(11)
    return rd.from_items(
        [{"event_id": i, "event_type": f"t{i % groups}",
          "value": float(v)}
         for i, v in enumerate(rng.normal(50, 10, n))],
        override_num_blocks=blocks,
    )


def test_grouped_topn_matches_pandas_window():
    from chronographer_ray.stages.ranking import grouped_topn_dataset

    ds = _ds()
    out = grouped_topn_dataset(
        ds, group_col="event_type", order_col="value", n=4,
        tiebreak_col="event_id",
    ).to_pandas().sort_values(["event_type", "rank"])
    df = ds.to_pandas().sort_values(
        ["value", "event_id"], ascending=[False, True])
    expect = df.groupby("event_type", sort=False).head(4)
    for g, sub in out.groupby("event_type"):
        want = expect[expect["event_type"] == g].sort_values(
            ["value", "event_id"], ascending=[False, True])
        assert list(sub["event_id"]) == list(want["event_id"])
        assert list(sub["rank"]) == [1, 2, 3, 4]


def test_grouped_topn_ties_break_by_id():
    from chronographer_ray.stages.ranking import grouped_topn_dataset

    ds = rd.from_items(
        [{"event_id": i, "event_type": "a", "value": 1.0} for i in range(10)],
        override_num_blocks=4,
    )
    out = grouped_topn_dataset(
        ds, group_col="event_type", order_col="value", n=3,
        tiebreak_col="event_id",
    ).to_pandas().sort_values("rank")
    assert list(out["event_id"]) == [0, 1, 2]


def test_zscore_matches_numpy_population():
    from chronographer_ray.stages.ranking import zscore_dataset

    ds = _ds(n=400)
    out = zscore_dataset(
        ds, group_col="event_type", val_col="value", id_cols=["event_id"]
    ).to_pandas().set_index("event_id").sort_index()
    df = ds.to_pandas()
    for g, sub in df.groupby("event_type"):
        v = sub["value"].to_numpy()
        z = (v - v.mean()) / v.std()  # numpy default ddof=0 == population
        got = out.loc[sub["event_id"], "z"].to_numpy()
        np.testing.assert_allclose(got, np.round(z, 6), atol=1.5e-6)


def test_zscore_zero_variance_group():
    from chronographer_ray.stages.ranking import zscore_dataset

    ds = rd.from_items(
        [{"event_id": i, "event_type": "c", "value": 7.0} for i in range(5)]
    )
    out = zscore_dataset(
        ds, group_col="event_type", val_col="value", id_cols=["event_id"]
    ).to_pandas()
    assert (out["z"] == 0.0).all()


def test_ntile_matches_sql_semantics(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from chronographer_ray.stages.ranking import ntile_dataset

    rng = __import__("numpy").random.RandomState(11)
    n = 103  # deliberately not divisible by 8: first 103%8 tiles get +1
    df = pd.DataFrame({
        "event_id": range(n),
        "value": [None if i % 17 == 0 else float(v)
                  for i, v in enumerate(rng.randint(0, 20, n))],  # heavy ties
    })
    got = ntile_dataset(rd.from_pandas(df), n_tiles=8, n_ranges=4).to_pandas()
    want = duckdb.sql(
        "SELECT event_id, CAST(NTILE(8) OVER "
        "(ORDER BY COALESCE(value, 0), event_id) AS BIGINT) AS tile FROM df"
    ).df()
    merged = got.merge(want, on="event_id", suffixes=("_ray", "_sql"))
    assert len(merged) == n
    assert (merged["tile_ray"] == merged["tile_sql"]).all()


def test_ntile_fewer_rows_than_tiles(ray_session):
    import pandas as pd
    import ray.data as rd

    from chronographer_ray.stages.ranking import ntile_dataset

    df = pd.DataFrame({"event_id": [3, 1, 2], "value": [5.0, 1.0, 9.0]})
    got = ntile_dataset(rd.from_pandas(df), n_tiles=8).to_pandas()
    # each row its own tile, in value order
    assert dict(zip(got["event_id"], got["tile"])) == {1: 1, 3: 2, 2: 3}


def test_ntile_empty_input(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from chronographer_ray.stages.ranking import ntile_dataset

    empty = rd.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "value": pa.array([], pa.float64()),
    }))
    assert len(ntile_dataset(empty).to_pandas()) == 0


def test_rrf_fuse_matches_bruteforce():
    """RRF = Σ 1/(60+rank) over legs that retrieved the doc; rank 0 =
    missed leg; ties on rounded rrf break by doc_id."""
    import pandas as pd

    from chronographer_ray.stages.ranking import rrf_fuse

    lex = pd.DataFrame({"doc_id": [10, 20, 30], "score": [3.0, 2.0, 1.0]})
    vec = pd.DataFrame({"doc_id": [20, 40], "sim": [0.9, 0.8]})
    out = rrf_fuse(lex, vec, k=10).to_pandas().set_index("doc_id")
    # doc 20: lex rank 2, vec rank 1
    assert out.loc[20, "lex_rank"] == 2 and out.loc[20, "vec_rank"] == 1
    assert out.loc[20, "rrf"] == round(1 / 62 + 1 / 61, 6)
    # doc 10: lex only, rank 1
    assert out.loc[10, "vec_rank"] == 0
    assert out.loc[10, "rrf"] == round(1 / 61, 6)
    # doc 40: vec only, rank 2
    assert out.loc[40, "lex_rank"] == 0
    assert out.loc[40, "rrf"] == round(1 / 62, 6)
    # ordering: 20 (two legs) first, then 10, then 40, then 30
    assert list(out.index) == [20, 10, 40, 30]


def test_rrf_fuse_pre_ranked_leg_and_score_ties():
    """A leg may arrive pre-ranked (rank column); equal scores in the
    other leg rank by doc_id asc."""
    import pandas as pd

    from chronographer_ray.stages.ranking import rrf_fuse

    lex = pd.DataFrame({"doc_id": [5, 3, 9], "score": [1.0, 1.0, 1.0]})
    vec = pd.DataFrame({"doc_id": [9, 3], "rank": [1, 2]})
    out = rrf_fuse(lex, vec, k=2).to_pandas()
    # lex ties → rank by doc_id: 3→1, 5→2, 9→3
    by_id = out.set_index("doc_id")
    assert by_id.loc[9, "lex_rank"] == 3 and by_id.loc[9, "vec_rank"] == 1
    assert by_id.loc[3, "lex_rank"] == 1 and by_id.loc[3, "vec_rank"] == 2
    assert len(out) == 2  # k honored
