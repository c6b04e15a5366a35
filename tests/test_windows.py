"""Session windows: gap-based sessionization, bucketed user co-location."""
import pandas as pd
import pyarrow as pa


def _events(rows):
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([pd.Timestamp(r[1]) for r in rows], pa.timestamp("us")),
        }
    )


def test_sessionize_splits_on_gap(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.windows import session_windows

    t = _events(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:10:00"),  # same session (10 min)
            (1, "2024-01-01 11:00:00"),  # 50-min gap → new session
            (2, "2024-01-01 10:05:00"),  # other user, own session
        ]
    )
    out = (
        session_windows(rd.from_arrow(t), gap_minutes=30)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert out.to_dict("records") == [
        {"user_id": 1, "session_start": "2024-01-01 10:00:00", "n_events": 2},
        {"user_id": 1, "session_start": "2024-01-01 11:00:00", "n_events": 1},
        {"user_id": 2, "session_start": "2024-01-01 10:05:00", "n_events": 1},
    ]


def test_asof_join_backward_match(ray_session):
    """Each left row matches the greatest right ts ≤ its ts within its key;
    keys with no earlier right row drop (inner)."""
    import ray.data as rd

    from chronographer_ray.stages.windows import asof_join_dataset

    left = pa.table(
        {
            "event_id": pa.array([10, 11, 12, 13], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                [pd.Timestamp(t) for t in
                 ("2024-01-01 10:00", "2024-01-01 12:00",
                  "2024-01-01 09:00", "2024-01-01 10:00")],
                pa.timestamp("us"),
            ),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array([1, 1], pa.int64()),
            "ts": pa.array(
                [pd.Timestamp("2024-01-01 09:30"), pd.Timestamp("2024-01-01 11:00")],
                pa.timestamp("us"),
            ),
            "ref": pa.array([100, 200], pa.int64()),
        }
    )
    out = (
        asof_join_dataset(rd.from_arrow(left), rd.from_arrow(right),
                          by="user_id", on="ts")
        .to_pandas()
        .sort_values("event_id")
    )
    got = dict(zip(out["event_id"], out["ref"]))
    # 10:00 → 09:30 ref=100; 12:00 → 11:00 ref=200; 09:00 → nothing (drop);
    # user 2 has no right rows (drop)
    assert got == {10: 100, 11: 200}
    assert out["ref"].dtype == "int64"


def test_range_join_overlapping_bands(ray_session):
    """A value inside two overlapping intervals emits two rows; a value in
    none emits nothing."""
    import ray.data as rd

    from chronographer_ray.stages.windows import range_join_broadcast

    rows = pa.table(
        {"event_id": pa.array([1, 2, 3], pa.int64()),
         "value": pa.array([5.0, 45.0, 999.0], pa.float64())}
    )
    bands = pa.table(
        {"band_id": pa.array([0, 1], pa.int64()),
         "lo": pa.array([-10.0, 40.0], pa.float64()),
         "hi": pa.array([60.0, 110.0], pa.float64())}
    )
    out = range_join_broadcast(rd.from_arrow(rows), bands, "value").to_pandas()
    got = sorted(zip(out["event_id"], out["band_id"]))
    assert got == [(1, 0), (2, 0), (2, 1)]


def test_sessionize_user_colocation_across_blocks(ray_session):
    """A user whose events land in DIFFERENT input blocks still gets one
    session — the bucket exchange co-locates by user hash."""
    import ray.data as rd

    from chronographer_ray.stages.windows import session_windows

    rows = [(7, f"2024-01-01 10:{m:02d}:00") for m in range(0, 40, 5)]
    ds = rd.from_arrow(_events(rows)).repartition(4)  # scatter across blocks
    out = session_windows(ds, gap_minutes=30).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n_events"] == 8


def test_hopping_windows_membership_and_sums():
    import pandas as pd
    import ray.data as rd

    from chronographer_ray.stages.windows import hopping_windows

    # one event at 12:34 → exactly four 60-min windows hopping by 15 min:
    # 12:30, 12:15, 12:00, 11:45
    ds = rd.from_items([
        {"ts": pd.Timestamp("2024-01-01 12:34:00"), "event_type": "c",
         "value": 1.25},
        {"ts": pd.Timestamp("2024-01-01 12:36:00"), "event_type": "c",
         "value": 2.00},
    ])
    out = hopping_windows(ds).to_pandas().sort_values("window_start")
    assert list(out["window_start"]) == [
        "2024-01-01 11:45:00", "2024-01-01 12:00:00",
        "2024-01-01 12:15:00", "2024-01-01 12:30:00",
    ]
    assert (out["n_events"] == 2).all()
    assert (out["sum_value_c"] == 325).all()


def test_user_running_aggregates():
    import pandas as pd
    import ray.data as rd

    from chronographer_ray.stages.windows import user_running_aggregates

    rows = [
        {"event_id": 1, "user_id": 7,
         "ts": pd.Timestamp("2024-01-01 10:00:00"), "value": 1.10},
        {"event_id": 2, "user_id": 7,
         "ts": pd.Timestamp("2024-01-01 10:05:00"), "value": 2.00},
        {"event_id": 3, "user_id": 7,
         "ts": pd.Timestamp("2024-01-01 10:05:00"), "value": 0.50},
        {"event_id": 4, "user_id": 9,
         "ts": pd.Timestamp("2024-01-01 10:01:00"), "value": 5.00},
    ]
    out = (
        user_running_aggregates(rd.from_items(rows, override_num_blocks=3))
        .to_pandas().set_index("event_id").sort_index()
    )
    # user 7: 110 → 310 (ts tie → event_id order) → 360; user 9: 500
    assert list(out["cum_value_c"]) == [110, 310, 360, 500]
    assert list(out["delta_us"]) == [-1, 300_000_000, 0, -1]


def test_rollup_levels_consistent():
    import pandas as pd
    import ray.data as rd

    from chronographer_ray.stages.windows import rollup_events_dataset

    ds = rd.from_items([
        {"ts": pd.Timestamp("2024-01-01 10:00"), "event_type": "a", "value": 1.00},
        {"ts": pd.Timestamp("2024-01-01 11:00"), "event_type": "a", "value": 2.50},
        {"ts": pd.Timestamp("2024-01-02 10:00"), "event_type": "a", "value": 0.25},
        {"ts": pd.Timestamp("2024-01-01 10:00"), "event_type": "b", "value": 4.00},
        {"ts": pd.Timestamp("2024-01-03 10:00"), "event_type": "b", "value": None},
    ])
    out = rollup_events_dataset(ds).to_pandas()
    fine = out[(out["event_type"] != "(all)") & (out["day"] != "(all)")]
    sub = out[(out["event_type"] != "(all)") & (out["day"] == "(all)")]
    total = out[out["event_type"] == "(all)"]
    # finest level
    got = {(r.event_type, r.day): (r.n_events, r.sum_value_c)
           for r in fine.itertuples()}
    assert got == {
        ("a", "2024-01-01"): (2, 350), ("a", "2024-01-02"): (1, 25),
        ("b", "2024-01-01"): (1, 400), ("b", "2024-01-03"): (1, 0),
    }
    # subtotal level folds the finest level exactly
    subs = {r.event_type: (r.n_events, r.sum_value_c) for r in sub.itertuples()}
    assert subs == {"a": (3, 375), "b": (2, 400)}
    # grand total row
    assert len(total) == 1
    assert (int(total["n_events"].iloc[0]), int(total["sum_value_c"].iloc[0])) \
        == (5, 775)


def test_asof_join_forward_match(ray_session):
    """direction='forward': each left row gains the smallest right ts >= its
    ts; rows with no later right row drop (inner)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from chronographer_ray.stages.windows import asof_join_dataset

    ts = lambda vals: pa.array(pd.to_datetime(vals)).cast(pa.timestamp("us"))
    left = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array(["u1", "u1", "u2", "u2"], pa.string()),
        "ts": ts(["2024-01-01 10:00", "2024-01-01 12:00",
                  "2024-01-01 09:00", "2024-01-01 23:00"]),
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array(["u1", "u1", "u2"], pa.string()),
        "ts": ts(["2024-01-01 11:00", "2024-01-01 12:00",
                  "2024-01-01 09:30"]),
        "next_id": pa.array([100, 200, 300], pa.int64()),
    }))
    out = asof_join_dataset(left, right, by="user_id", on="ts",
                            direction="forward").to_pandas()
    got = dict(zip(out["event_id"], out["next_id"]))
    # event 1 (10:00) -> 11:00 match; event 2 (12:00) -> exact 12:00;
    # event 3 (09:00) -> 09:30; event 4 (23:00) -> no later row, drops
    assert got == {1: 100, 2: 200, 3: 300}
    assert out["next_id"].dtype == "int64"


def test_burst_dedup_keeps_first_of_burst(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from chronographer_ray.stages.windows import burst_dedup

    ts = lambda vals: pa.array(pd.to_datetime(vals)).cast(pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array(["u1"] * 5 + ["u2"], pa.string()),
        "event_type": pa.array(["click"] * 4 + ["view", "click"], pa.string()),
        # u1/click: 10:00, 10:02 (burst), 10:04 (burst of the 10:02? no —
        # lag is vs the PREVIOUS RAW event: 10:04-10:02=2min <= 5 -> drop),
        # 10:20 (kept); u1/view and u2/click always kept (first of key)
        "ts": ts(["2024-01-01 10:00", "2024-01-01 10:02",
                  "2024-01-01 10:04", "2024-01-01 10:20",
                  "2024-01-01 10:01", "2024-01-01 10:03"]),
    }))
    out = burst_dedup(ds, gap_minutes=5).to_pandas()
    assert sorted(out["event_id"]) == [1, 4, 5, 6]
    # tie on ts within a key: smaller event_id wins deterministically
    ds2 = rd.from_arrow(pa.table({
        "event_id": pa.array([9, 8], pa.int64()),
        "user_id": pa.array(["u", "u"], pa.string()),
        "event_type": pa.array(["t", "t"], pa.string()),
        "ts": ts(["2024-01-01 10:00", "2024-01-01 10:00"]),
    }))
    out2 = burst_dedup(ds2, gap_minutes=5).to_pandas()
    assert sorted(out2["event_id"]) == [8]


def test_cube_all_grouping_sets():
    import pandas as pd
    import ray.data as rd

    from chronographer_ray.stages.windows import cube_events_dataset

    ds = rd.from_items([
        {"ts": pd.Timestamp("2024-01-01 10:00"), "event_type": "a", "value": 1.00},
        {"ts": pd.Timestamp("2024-01-01 11:00"), "event_type": "a", "value": 2.50},
        {"ts": pd.Timestamp("2024-01-02 10:00"), "event_type": "a", "value": 0.25},
        {"ts": pd.Timestamp("2024-01-01 10:00"), "event_type": "b", "value": 4.00},
        {"ts": pd.Timestamp("2024-01-03 10:00"), "event_type": "b", "value": None},
    ])
    out = cube_events_dataset(ds).to_pandas()
    key = lambda df: {(r.event_type, r.day): (r.n_events, r.sum_value_c)
                      for r in df.itertuples()}
    fine = key(out[(out["event_type"] != "(all)") & (out["day"] != "(all)")])
    by_t = key(out[(out["event_type"] != "(all)") & (out["day"] == "(all)")])
    by_d = key(out[(out["event_type"] == "(all)") & (out["day"] != "(all)")])
    total = key(out[(out["event_type"] == "(all)") & (out["day"] == "(all)")])
    assert fine == {
        ("a", "2024-01-01"): (2, 350), ("a", "2024-01-02"): (1, 25),
        ("b", "2024-01-01"): (1, 400), ("b", "2024-01-03"): (1, 0),
    }
    assert by_t == {("a", "(all)"): (3, 375), ("b", "(all)"): (2, 400)}
    assert by_d == {("(all)", "2024-01-01"): (3, 750),
                    ("(all)", "2024-01-02"): (1, 25),
                    ("(all)", "2024-01-03"): (1, 0)}
    assert total == {("(all)", "(all)"): (5, 775)}


def test_attribution_last_touch(ray_session):
    import pandas as pd
    import ray.data as rd

    from chronographer_ray.stages.windows import attribution_dataset

    T = pd.Timestamp
    rows = [
        # user 1: click 10:00, view 11:00, purchase 11:30 → view
        {"event_id": 1, "user_id": 1, "ts": T("2024-01-01 10:00"),
         "event_type": "click", "value": 0.0},
        {"event_id": 2, "user_id": 1, "ts": T("2024-01-01 11:00"),
         "event_type": "view", "value": 0.0},
        {"event_id": 3, "user_id": 1, "ts": T("2024-01-01 11:30"),
         "event_type": "purchase", "value": 10.00},
        # user 2: click 25h before purchase → outside window → (none)
        {"event_id": 4, "user_id": 2, "ts": T("2024-01-01 00:00"),
         "event_type": "click", "value": 0.0},
        {"event_id": 5, "user_id": 2, "ts": T("2024-01-02 01:00"),
         "event_type": "purchase", "value": 5.00},
        # user 3: tie at identical ts → higher event_id (view) wins
        {"event_id": 6, "user_id": 3, "ts": T("2024-01-01 09:00"),
         "event_type": "click", "value": 0.0},
        {"event_id": 7, "user_id": 3, "ts": T("2024-01-01 09:00"),
         "event_type": "view", "value": 0.0},
        {"event_id": 8, "user_id": 3, "ts": T("2024-01-01 09:00"),
         "event_type": "purchase", "value": 2.50},
        # an error event must never attract attribution
        {"event_id": 9, "user_id": 1, "ts": T("2024-01-01 11:29"),
         "event_type": "error", "value": 0.0},
    ]
    out = attribution_dataset(
        rd.from_items(rows, override_num_blocks=3)).to_pandas()
    got = {r.event_type: (r.n_purchases, r.sum_value_c)
           for r in out.itertuples()}
    assert got == {"view": (2, 1250), "(none)": (1, 500)}


def test_skyline(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.ranking import skyline_dataset

    rows = [
        {"id": 1, "x": 5.0, "y": 1},   # frontier (max x)
        {"id": 2, "x": 3.0, "y": 3},   # frontier
        {"id": 3, "x": 3.0, "y": 3},   # exact duplicate — both kept
        {"id": 4, "x": 3.0, "y": 2},   # beaten within x-group by y=3
        {"id": 5, "x": 1.0, "y": 4},   # frontier (max y)
        {"id": 6, "x": 1.0, "y": 3},   # dominated by (3,3)
        {"id": 7, "x": 4.0, "y": 1},   # dominated by (5,1)
        {"id": 8, "x": 5.0, "y": 1},   # duplicate of id 1 — kept
    ]
    out = skyline_dataset(rd.from_items(rows, override_num_blocks=4),
                          "x", "y").to_pandas()
    assert sorted(out["id"]) == [1, 2, 3, 5, 8]


def test_session_paths(ray_session):
    import pandas as pd
    import ray.data as rd

    from chronographer_ray.stages.windows import session_paths_dataset

    T = pd.Timestamp
    rows = [
        # user 1, session 1: a>b>c (+ a 4th event beyond depth)
        {"event_id": 1, "user_id": 1, "ts": T("2024-01-01 10:00"),
         "event_type": "a"},
        {"event_id": 2, "user_id": 1, "ts": T("2024-01-01 10:05"),
         "event_type": "b"},
        {"event_id": 3, "user_id": 1, "ts": T("2024-01-01 10:10"),
         "event_type": "c"},
        {"event_id": 4, "user_id": 1, "ts": T("2024-01-01 10:15"),
         "event_type": "d"},
        # user 1, session 2 (gap > 30 min): single event
        {"event_id": 5, "user_id": 1, "ts": T("2024-01-01 12:00"),
         "event_type": "a"},
        # user 2: two events, same path as user 1's session 2 + one
        {"event_id": 6, "user_id": 2, "ts": T("2024-01-01 09:00"),
         "event_type": "a"},
        {"event_id": 7, "user_id": 2, "ts": T("2024-01-01 09:20"),
         "event_type": "b"},
        # tie at identical ts → event_id order
        {"event_id": 9, "user_id": 3, "ts": T("2024-01-01 08:00"),
         "event_type": "y"},
        {"event_id": 8, "user_id": 3, "ts": T("2024-01-01 08:00"),
         "event_type": "x"},
    ]
    out = session_paths_dataset(
        rd.from_items(rows, override_num_blocks=3)).to_pandas()
    got = dict(zip(out["path"], out["n_sessions"]))
    assert got == {"a>b>c": 1, "a": 1, "a>b": 1, "x>y": 1}


def test_watermark_late_matches_pandas_scan(ray_session):
    """Distributed range-partitioned prefix == a single-process replay:
    wm = running max(ts) − delay; late iff ts < (strictly-preceding
    running max) − delay; first arrival never late."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from chronographer_ray.stages.windows import watermark_late_dataset

    rng = np.random.RandomState(5)
    n = 500
    ts = np.cumsum(rng.randint(1, 100, n)).astype(np.int64) * 1_000_000
    order = rng.permutation(n)            # out-of-order arrival
    arrival = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "event_id": pa.array(arrival),
        "ts": pa.array(ts[order]).cast(pa.timestamp("us")),
    })
    ds = rd.from_arrow(tbl).repartition(5)
    delay = 50 * 1_000_000
    out = (watermark_late_dataset(ds, delay_us=delay, n_ranges=8)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    t = ts[order]
    runmax = np.maximum.accumulate(t)
    prev = np.concatenate(([np.iinfo(np.int64).min], runmax[:-1]))
    assert (out["wm_us"].to_numpy() == runmax - delay).all()
    expect_late = np.zeros(n, np.int64)
    expect_late[1:] = (t[1:] < prev[1:] - delay).astype(np.int64)
    assert (out["is_late"].to_numpy() == expect_late).all()
    assert out["is_late"].sum() > 0       # the permutation creates lates
