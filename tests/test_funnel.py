"""Windowed conversion funnel: boundary semantics (strictly-after,
inclusive window edge), missing-step users, depth chain."""
import pandas as pd
import pyarrow as pa

from chronographer_ray.stages.windows import funnel_dataset


def _events(rows):
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([pd.Timestamp(r[2]) for r in rows],
                       pa.timestamp("us")),
    })


def _depths(rows, **kw):
    import ray.data as rd

    out = funnel_dataset(rd.from_arrow(_events(rows)), **kw).to_pandas()
    if "user_id" not in out.columns:
        return {}
    return dict(zip(out["user_id"], out["depth"]))


def test_depth_chain_and_boundaries(ray_session):
    rows = [
        # u1: full funnel, each step well inside the window
        (1, "signup", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 10:00:00"),
        (1, "purchase", "2024-01-02 00:00:00"),
        # u2: click exactly AT the 24h edge (inclusive -> counts),
        # purchase 1us past its edge (exclusive -> depth 2)
        (2, "signup", "2024-01-01 00:00:00"),
        (2, "click", "2024-01-02 00:00:00"),
        (2, "purchase", "2024-01-03 00:00:00.000001"),
        # u3: click AT signup time (strictly-after -> does not count)
        (3, "signup", "2024-01-01 00:00:00"),
        (3, "click", "2024-01-01 00:00:00"),
        # u4: no signup at all -> not in the funnel
        (4, "click", "2024-01-01 00:00:00"),
        (4, "purchase", "2024-01-01 01:00:00"),
        # u5: steps in the wrong order (purchase before click)
        (5, "signup", "2024-01-01 00:00:00"),
        (5, "purchase", "2024-01-01 01:00:00"),
        (5, "click", "2024-01-01 02:00:00"),
    ]
    d = _depths(rows, steps=("signup", "click", "purchase"), window_s=86400.0)
    assert d == {1: 3, 2: 2, 3: 1, 5: 2}


def test_earliest_step_anchors_the_window(ray_session):
    # the SECOND signup is closer to the click, but the funnel anchors on
    # the EARLIEST signup — the click lands outside its window
    rows = [
        (7, "signup", "2024-01-01 00:00:00"),
        (7, "signup", "2024-01-05 00:00:00"),
        (7, "click", "2024-01-05 01:00:00"),
    ]
    assert _depths(rows, window_s=86400.0) == {7: 1}


def test_window_widening_monotone(ray_session):
    rows = [
        (9, "signup", "2024-01-01 00:00:00"),
        (9, "click", "2024-01-03 00:00:00"),
    ]
    assert _depths(rows, window_s=3600.0) == {9: 1}
    assert _depths(rows, window_s=3 * 86400.0) == {9: 2}


def test_cohort_retention_planted(ray_session):
    from chronographer_ray.stages.windows import cohort_retention_dataset
    import ray.data as rd

    wk = 7 * 86400
    base = pd.Timestamp("1970-01-01")  # epoch-week 0 by construction

    def at(weeks, seconds=0):
        return base + pd.Timedelta(seconds=weeks * wk + seconds)

    rows = [
        # u1: signs up week 1, active weeks 1,2,4
        (1, "signup", at(1)), (1, "click", at(2)), (1, "view", at(4)),
        # u2: signs up week 1, active week 1 only (signup itself counts)
        (2, "signup", at(1, 60)),
        # u3: active week 0 BEFORE signing up week 2 -> pre-cohort activity
        # excluded; active week 3
        (3, "click", at(0)), (3, "signup", at(2)), (3, "view", at(3)),
        # u4: never signs up -> not in any cohort
        (4, "click", at(1)),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })
    out = cohort_retention_dataset(rd.from_arrow(t)).to_pandas()
    got = {
        (r.cohort_wk, r.week_offset): r.n_users for r in out.itertuples()
    }
    assert got == {
        (1, 0): 2,  # u1+u2 active in signup week
        (1, 1): 1,  # u1
        (1, 3): 1,  # u1 week 4
        (2, 0): 1,  # u3 signup week
        (2, 1): 1,  # u3 week 3
    }


def test_event_transitions_planted(ray_session):
    from chronographer_ray.stages.windows import event_transitions_dataset
    import ray.data as rd

    rows = [
        # u1: a -> b -> a ; u2: a -> b ; user boundary must NOT pair
        (1, 10, "a", "2024-01-01 00:00:00"),
        (1, 11, "b", "2024-01-01 01:00:00"),
        (1, 12, "a", "2024-01-01 02:00:00"),
        (2, 13, "a", "2024-01-02 00:00:00"),
        (2, 14, "b", "2024-01-02 01:00:00"),
        # u3: equal ts -> event_id breaks the tie (20 before 21)
        (3, 21, "y", "2024-01-03 00:00:00"),
        (3, 20, "x", "2024-01-03 00:00:00"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([pd.Timestamp(r[3]) for r in rows],
                       pa.timestamp("us")),
    })
    out = event_transitions_dataset(rd.from_arrow(t)).to_pandas()
    got = {(r.from_type, r.to_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("x", "y"): 1}


def test_windowed_distinct(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from chronographer_ray.stages.windows import windowed_distinct_dataset

    # two windows; user 1 repeats within a window (counted once), user 2
    # spans both windows (counted in each)
    ts = pa.array(np.array([10, 20, 30, 3700, 3710], np.int64) * 1_000_000
                  ).cast(pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({
        "ts": ts,
        "event_type": pa.array(["click", "click", "click", "click", "buy"]),
        "user_id": pa.array([1, 1, 2, 2, 2], pa.int64()),
    }))
    df = windowed_distinct_dataset(ds).to_pandas()
    got = {(r["window_start_s"], r["event_type"]): r["n_distinct"]
           for _, r in df.iterrows()}
    assert got == {(0, "click"): 2, (3600, "click"): 1, (3600, "buy"): 1}
