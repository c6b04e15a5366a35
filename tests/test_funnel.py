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
