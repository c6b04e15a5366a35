"""Windowed aggregates over event streams.

Tumbling windows live in ``__ray_entry__.q_events_window`` (bucketed partial
counts). This module adds SESSION windows — the gap-based grouping a
training-data pipeline needs for user activity segmentation — in the
scale-correct Ray shape:

    map_batches (project) → int-bucket exchange on hash(user_id) →
    per-bucket vectorized pandas sessionization (sort, lag, cumsum)

One bucket holds ALL events of its users (hash co-location), so the lag is
correct; buckets are uniform by hash and the per-bucket kernel is fully
vectorized (no per-user Python loop, no one-group-per-user scheduling).
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.shuffles import bucketed_group_apply


def _sessionize(df: pd.DataFrame, gap: pd.Timedelta) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts"], kind="mergesort")
    prev = df.groupby("user_id")["ts"].shift()
    brk = prev.isna() | ((df["ts"] - prev) > gap)
    sid = brk.cumsum()  # global monotone id; unique per (user, session)
    g = df.groupby(sid, sort=False)
    out = pd.DataFrame(
        {
            "user_id": g["user_id"].first(),
            "session_start": g["ts"].min().dt.strftime("%Y-%m-%d %H:%M:%S"),
            "n_events": g["ts"].count().astype("int64"),
        }
    )
    return out.reset_index(drop=True)


def asof_join_dataset(
    left,
    right,
    by: str,
    on: str,
    right_on: str | None = None,
    n_buckets: int = 16,
    direction: str = "backward",
):
    """Distributed AS-OF join: each left row gains the right row with the
    greatest ``right_on`` ≤ its ``on`` (``direction="backward"``, default)
    or the smallest ``right_on`` ≥ its ``on`` (``"forward"``), within the
    same ``by`` key (inner — left rows with no match drop).

    Shape: both sides are tagged with a ``_side`` flag, unioned, exchanged
    on ``hash(by)`` int buckets (ALL rows of a key share a bucket), and each
    bucket runs ONE vectorized ``pandas.merge_asof`` — no per-key groups, no
    broadcast of either side, both inputs stream. The right side must be
    unique per (by, right_on); pre-aggregate if it is not (deterministic
    output requires it on any engine).

    Tag/conform are zero-copy Arrow (``append_column`` of a null/constant
    array + ``select``) — the old per-batch ``to_pandas`` round-trips cost
    three full copy-convert passes over both scans before the exchange.
    The single pandas conversion happens inside the per-bucket
    ``merge_asof``; the payload dtypes (float-upcast by merge_asof's
    unmatched-row NaNs) are restored by an Arrow ``cast`` against the
    original right-side schema, so every output block carries the exact
    input types regardless of bucket content.
    """
    right_on = right_on or on

    lcols = list(left.schema().names)
    ltypes = dict(zip(left.schema().names, left.schema().types))
    rschema = right.schema()  # ray Schema: parallel .names / .types lists
    rcols = [(on if c == right_on else c) for c in rschema.names]
    rtypes = {
        (on if c == right_on else c): t
        for c, t in zip(rschema.names, rschema.types)
    }
    all_cols = list(dict.fromkeys(lcols + rcols + ["_side"]))
    col_types = {**rtypes, **ltypes, "_side": pa.int8()}

    def conform(own_cols, side):
        """Zero-copy: rename right_on→on, add missing columns as typed
        nulls + the constant _side flag, put columns in union order."""

        def fn(b: pa.Table) -> pa.Table:
            if side == 1 and right_on != on:
                b = b.rename_columns(
                    [(on if c == right_on else c) for c in b.column_names]
                )
            n = b.num_rows
            for c in all_cols:
                if c == "_side":
                    b = b.append_column(
                        c, pa.array([side] * n, pa.int8())
                    )
                elif c not in own_cols:
                    b = b.append_column(c, pa.nulls(n, col_types[c]))
            return b.select(all_cols)

        return fn

    lt = left.map_batches(conform(lcols, 0), batch_format="pyarrow")
    rt = right.map_batches(conform(rcols, 1), batch_format="pyarrow")
    both = lt.union(rt)

    rpayload = [c for c in rcols if c not in (by, on)]
    out_schema = pa.schema(
        [(c, col_types[c]) for c in [*lcols, *rpayload]]
    )

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()  # ONE conversion per bucket, for merge_asof
        lf = df[df["_side"] == 0][lcols].sort_values(on, kind="mergesort")
        rf = df[df["_side"] == 1][[by, on, *rpayload]].sort_values(
            on, kind="mergesort"
        )
        if lf.empty or rf.empty:
            return out_schema.empty_table()
        out = pd.merge_asof(
            lf, rf, on=on, by=by, direction=direction, allow_exact_matches=True
        )
        out = out.dropna(subset=rpayload)  # inner semantics
        # merge_asof's unmatched-row NaNs upcast int payloads to float —
        # the Arrow cast restores the exact input schema on every block
        return pa.Table.from_pandas(out, preserve_index=False).select(
            out_schema.names
        ).cast(out_schema)

    return bucketed_group_apply(
        both, [by], merge, n_buckets=n_buckets, batch_format="pyarrow"
    )


def range_join_broadcast(ds, intervals: pa.Table, value_col: str,
                         lo_col: str = "lo", hi_col: str = "hi"):
    """Range (interval-overlap) join of a big Dataset against a SMALL
    intervals table: each row joins every interval with
    ``lo ≤ value < hi`` (intervals may overlap → a row can emit several
    matches).

    Partitioning assumption (documented per the custom-operator contract):
    the intervals side fits in one broadcast — it ships to the object store
    once (``ray.put``) and every batch runs a vectorized (rows × intervals)
    comparison; rows never shuffle. For a large intervals side, exchange
    both sides on a coarse value-bucket key instead (same kernel per
    bucket) — not needed while intervals ≪ memory.
    """
    import numpy as np
    import ray

    ref = ray.put(
        {
            "lo": intervals[lo_col].to_numpy(zero_copy_only=False).astype(np.float64),
            "hi": intervals[hi_col].to_numpy(zero_copy_only=False).astype(np.float64),
            "table": intervals,
        }
    )

    def match(b: pa.Table) -> pa.Table:
        iv = ray.get(ref)
        vals = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # (rows × intervals) overlap mask — intervals side is tiny
        hit = (vals[:, None] >= iv["lo"][None, :]) & (vals[:, None] < iv["hi"][None, :])
        row_idx, int_idx = np.nonzero(hit)
        left = b.take(pa.array(row_idx, pa.int64()))
        right = iv["table"].take(pa.array(int_idx, pa.int64()))
        for name in right.column_names:
            if name not in (lo_col, hi_col):
                left = left.append_column(name, right[name])
        return left

    return ds.map_batches(match, batch_format="pyarrow")


def burst_dedup(ds, gap_minutes: int = 5, n_buckets: int = 16):
    """Event-stream burst deduplication: drop an event when the SAME
    (user_id, event_type) fired within the previous ``gap_minutes``
    (lag over raw order — double-click / retry / at-least-once-delivery
    cleanup before sessionization). Keeps the first event of every burst.

    Semantics are the SQL window form ``lag(ts) OVER (PARTITION BY
    user_id, event_type ORDER BY ts, event_id)`` — exactly oracle-able.
    Ties on ts within a key order by event_id, so the kept row is
    deterministic on any engine.

    Scale shape: same hash co-location exchange as sessionization (all
    rows of a (user, type) key share an int bucket), one vectorized
    sort + grouped shift per bucket. Returns (event_id, user_id,
    event_type, ts_us) — microsecond epoch ints, the engine-neutral
    timestamp form (oracle: ``epoch_us(ts)``)."""
    gap_us = gap_minutes * 60_000_000

    def project(b: pa.Table) -> pa.Table:
        ts_col = b["ts"]
        if isinstance(ts_col, pa.ChunkedArray):
            ts_col = ts_col.combine_chunks()
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "event_type": b["event_type"],
            "ts_us": ts_col.cast(pa.timestamp("us")).cast(pa.int64()),
        })

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts_us", "event_id"],
                          kind="mergesort")
        prev = g.groupby(["user_id", "event_type"], sort=False)["ts_us"].shift()
        keep = prev.isna() | ((g["ts_us"] - prev) > gap_us)
        return g[keep]

    return bucketed_group_apply(
        ds.map_batches(project, batch_format="pyarrow"),
        ["user_id", "event_type"], keep_first, n_buckets=n_buckets,
    )


def session_windows(ds, gap_minutes: int = 30, n_buckets: int = 16):
    """Dataset[(user_id, ts, ...)] → Dataset[(user_id, session_start,
    n_events)] — sessions split when a user is idle longer than
    ``gap_minutes``."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def project(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "ts"])

    return bucketed_group_apply(
        ds.map_batches(project, batch_format="pyarrow"),
        ["user_id"],
        lambda df: _sessionize(df, gap),
        n_buckets=n_buckets,
    )


def hopping_windows(ds, size_minutes: int = 60, hop_minutes: int = 15,
                    n_buckets: int = 16):
    """HOPPING (sliding) window aggregate: every event lands in
    ``size/hop`` overlapping windows; counts and integer-cent value sums
    per (event_type, window_start).

    Scale shape: the explode (×size/hop) happens inside ``map_batches``
    and is IMMEDIATELY collapsed by an in-batch Arrow group-aggregate, so
    the exchange carries (event_type × windows-per-batch) partial rows,
    never the exploded stream; one int-bucket exchange sums partials.
    Value sums use integer cents (``floor(v·100+0.5)``) — distributed
    float summation order would drift vs any serial oracle.
    Returns (event_type, window_start, n_events, sum_value_c)."""
    import numpy as np
    import pyarrow.compute as pc

    size_us = size_minutes * 60_000_000
    hop_us = hop_minutes * 60_000_000
    if size_us % hop_us:
        raise ValueError("size must be a multiple of hop")
    r = size_us // hop_us

    def partial(b: pa.Table) -> pa.Table:
        ts_col = b["ts"]
        if isinstance(ts_col, pa.ChunkedArray):
            ts_col = ts_col.combine_chunks()
        ts = ts_col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = pc.fill_null(b["value"], 0.0).to_numpy(zero_copy_only=False)
        v_c = np.floor(v * 100 + 0.5).astype(np.int64)
        base = ts // hop_us * hop_us
        ws = (base[:, None] - np.arange(r, dtype=np.int64)[None, :] * hop_us).ravel()
        t = pa.table({
            "event_type": pa.array(np.repeat(
                b["event_type"].to_numpy(zero_copy_only=False), r)),
            "ws_us": pa.array(ws, pa.int64()),
            "n": pa.array(np.ones(len(ws), dtype=np.int64)),
            "v_c": pa.array(np.repeat(v_c, r), pa.int64()),
        })
        g = t.group_by(["event_type", "ws_us"]).aggregate(
            [("n", "sum"), ("v_c", "sum")]
        )
        return g.rename_columns(["event_type", "ws_us", "n", "v_c"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "ws_us"]).aggregate(
            [("n", "sum"), ("v_c", "sum")]
        )
        return g.rename_columns(["event_type", "ws_us", "n", "v_c"])

    def finish(b: pa.Table) -> pa.Table:
        ws = pd.to_datetime(b["ws_us"].to_numpy(zero_copy_only=False), unit="us")
        return pa.table({
            "event_type": b["event_type"],
            "window_start": pa.array(
                ws.strftime("%Y-%m-%d %H:%M:%S").to_numpy(), pa.string()),
            "n_events": b["n"],
            "sum_value_c": b["v_c"],
        })

    return bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "ws_us"], merge, n_buckets=n_buckets,
        batch_format="pyarrow",
    ).map_batches(finish, batch_format="pyarrow")


def user_running_aggregates(ds, n_buckets: int = 16):
    """Ordered-window aggregates per user: running integer-cent value sum
    and microsecond gap to the previous event (−1 for the first) — the
    ``sum() OVER (PARTITION BY u ORDER BY ts ROWS UNBOUNDED PRECEDING)``
    / ``lag()`` shape.

    Scale shape: hash co-locate each user's events into one int bucket
    (same exchange as sessionization), then ONE vectorized sort + grouped
    cumsum/shift per bucket — no per-user groups, no driver state.
    Integer cents keep the running sum exact regardless of accumulation
    order. Returns (event_id, user_id, cum_value_c, delta_us)."""
    import numpy as np
    import pyarrow.compute as pc

    def project(b: pa.Table) -> pa.Table:
        ts_col = b["ts"]
        if isinstance(ts_col, pa.ChunkedArray):
            ts_col = ts_col.combine_chunks()
        v = pc.fill_null(b["value"], 0.0).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts_us": ts_col.cast(pa.timestamp("us")).cast(pa.int64()),
            "v_c": pa.array(
                np.floor(v * 100 + 0.5).astype(np.int64), pa.int64()),
        })

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        g["cum_value_c"] = grp["v_c"].cumsum()
        g["delta_us"] = (
            (g["ts_us"] - grp["ts_us"].shift()).fillna(-1).astype("int64")
        )
        return g[["event_id", "user_id", "cum_value_c", "delta_us"]]

    return bucketed_group_apply(
        ds.map_batches(project, batch_format="pyarrow"),
        ["user_id"], running, n_buckets=n_buckets, batch_format="pandas",
    )


def rollup_events_dataset(ds, n_buckets: int = 16):
    """ROLLUP aggregate: (event_type, day) totals plus the (event_type)
    subtotal level and the grand total, from ONE scan.

    Scale shape: the input is scanned once into per-batch partials at the
    FINEST level (event_type, day); one int-bucket exchange merges them.
    Every coarser level re-aggregates the already-tiny finest aggregate —
    a rollup never costs a second pass or a second big shuffle, no matter
    how many levels. Subtotal rows use the ``'(all)'`` sentinel instead of
    SQL NULL (NULL→NaN→'nan' vs None→'None' string-canonicalization drift
    between DuckDB and Arrow). Value sums are integer cents
    (``floor(v·100+0.5)``) for summation-order independence.
    Returns (event_type, day, n_events, sum_value_c)."""
    import numpy as np
    import pyarrow.compute as pc

    ALL = "(all)"

    def partial(b: pa.Table) -> pa.Table:
        # cast first: an all-null block (from_items test substrate) types the
        # column null, and fill_null can't scalar-cast 0.0 into null type
        v = pc.fill_null(
            pc.cast(b["value"], pa.float64()), 0.0
        ).to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": b["event_type"],
            "day": pc.strftime(b["ts"].cast(pa.timestamp("us")), format="%Y-%m-%d"),
            "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "v_c": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })
        g = t.group_by(["event_type", "day"]).aggregate(
            [("n", "sum"), ("v_c", "sum")]
        )
        return g.rename_columns(["event_type", "day", "n", "v_c"])

    def merge(keys):
        def fn(t: pa.Table) -> pa.Table:
            g = t.group_by(keys).aggregate([("n", "sum"), ("v_c", "sum")])
            return g.rename_columns(keys + ["n", "v_c"])
        return fn

    fine = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"], merge(["event_type", "day"]),
        n_buckets=n_buckets, batch_format="pyarrow",
    ).materialize()

    def day_to_all(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.schema.get_field_index("day"),
            "day", pa.array([ALL] * b.num_rows, pa.string()),
        )

    lvl1 = bucketed_group_apply(
        fine.map_batches(day_to_all, batch_format="pyarrow"),
        ["event_type"], merge(["event_type", "day"]),
        n_buckets=n_buckets, batch_format="pyarrow",
    ).materialize()

    # grand total: lvl1 is ≤ |event_type| rows — a bounded driver fold,
    # same contract as kmeans centroid partials
    total_n = lvl1.sum(on="n")
    total_v = lvl1.sum(on="v_c")
    import ray.data as rd

    total = rd.from_arrow(pa.table({
        "event_type": pa.array([ALL], pa.string()),
        "day": pa.array([ALL], pa.string()),
        "n": pa.array([total_n], pa.int64()),
        "v_c": pa.array([total_v], pa.int64()),
    }))

    def finish(b: pa.Table) -> pa.Table:
        return b.rename_columns(["event_type", "day", "n_events", "sum_value_c"])

    return fine.union(lvl1).union(total).map_batches(
        finish, batch_format="pyarrow"
    )


def cube_events_dataset(ds, n_buckets: int = 16):
    """CUBE aggregate: all four grouping sets of (event_type, day) —
    (t, d), (t, ·), (·, d), (·, ·) — from ONE scan of the input.

    Same shape as ``rollup_events_dataset`` plus the one grouping set a
    rollup lacks: the input is scanned once into finest-level partials,
    one int-bucket exchange merges them, and every coarser set
    re-aggregates the already-tiny finest aggregate (|types|·|days|
    rows), so a cube with 2^k sets still costs a single big exchange.
    ``'(all)'`` sentinel and integer-cents sums as in rollup (NULL/NaN
    canonicalization drift + summation-order independence).
    Returns (event_type, day, n_events, sum_value_c)."""
    import numpy as np
    import pyarrow.compute as pc

    ALL = "(all)"

    def partial(b: pa.Table) -> pa.Table:
        v = pc.fill_null(
            pc.cast(b["value"], pa.float64()), 0.0
        ).to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": b["event_type"],
            "day": pc.strftime(b["ts"].cast(pa.timestamp("us")),
                               format="%Y-%m-%d"),
            "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "v_c": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })
        g = t.group_by(["event_type", "day"]).aggregate(
            [("n", "sum"), ("v_c", "sum")]
        )
        return g.rename_columns(["event_type", "day", "n", "v_c"])

    def merge(keys):
        def fn(t: pa.Table) -> pa.Table:
            g = t.group_by(keys).aggregate([("n", "sum"), ("v_c", "sum")])
            return g.rename_columns(keys + ["n", "v_c"])
        return fn

    fine = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"], merge(["event_type", "day"]),
        n_buckets=n_buckets, batch_format="pyarrow",
    ).materialize()

    def col_to_all(col):
        def fn(b: pa.Table) -> pa.Table:
            return b.set_column(
                b.schema.get_field_index(col),
                col, pa.array([ALL] * b.num_rows, pa.string()),
            )
        return fn

    lvl_t = bucketed_group_apply(
        fine.map_batches(col_to_all("day"), batch_format="pyarrow"),
        ["event_type"], merge(["event_type", "day"]),
        n_buckets=n_buckets, batch_format="pyarrow",
    ).materialize()

    lvl_d = bucketed_group_apply(
        fine.map_batches(col_to_all("event_type"), batch_format="pyarrow"),
        ["day"], merge(["event_type", "day"]),
        n_buckets=n_buckets, batch_format="pyarrow",
    )

    # grand total: lvl_t is ≤ |event_type| rows — bounded driver fold,
    # same contract as rollup's. Empty input: GROUP BY CUBE still emits the
    # empty-grouping-set row with COUNT(*)=0 but SUM(...)=NULL, while
    # Dataset.sum returns None for both — coalesce only the count
    total_n = lvl_t.sum(on="n") or 0
    total_v = lvl_t.sum(on="v_c")
    import ray.data as rd

    total = rd.from_arrow(pa.table({
        "event_type": pa.array([ALL], pa.string()),
        "day": pa.array([ALL], pa.string()),
        "n": pa.array([total_n], pa.int64()),
        "v_c": pa.array([total_v], pa.int64()),
    }))

    def finish(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["event_type", "day", "n_events", "sum_value_c"])

    return fine.union(lvl_t).union(lvl_d).union(total).map_batches(
        finish, batch_format="pyarrow"
    )


# ---------------------------------------------------------------- funnel
def funnel_dataset(events, steps: tuple[str, ...] = ("signup", "click",
                                                     "purchase"),
                   window_s: float = 86400.0, user_col: str = "user_id",
                   type_col: str = "event_type", ts_col: str = "ts",
                   n_buckets: int = 16):
    """Ordered conversion funnel → (user_id, depth): depth = furthest step
    completed, where step i+1 must occur STRICTLY AFTER the user's
    earliest step-i completion and within ``window_s`` of it (the
    standard windowed-funnel semantics of event analytics engines).

    Shape: a map-side type filter drops every non-step event before the
    ONE int-bucket exchange on the user, then the whole chain runs as
    vectorized grouped mins + merges inside each bucket — no per-user
    Python, no second exchange. Timestamps stay microsecond-exact
    (pandas Timedelta == the oracle's INTERVAL arithmetic)."""
    step_set = sorted(set(steps))

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = b.filter(pc.is_in(b[type_col], value_set=pa.array(step_set)))
        return t.select([user_col, type_col, ts_col])

    delta = pd.Timedelta(seconds=window_s)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        cur = (
            g[g[type_col] == steps[0]]
            .groupby(user_col)[ts_col].min()
        )
        depth = pd.Series(1, index=cur.index, dtype="int64")
        for s in steps[1:]:
            ev = g[g[type_col] == s].merge(
                cur.rename("t").reset_index(), on=user_col
            )
            ok = ev[(ev[ts_col] > ev["t"]) & (ev[ts_col] <= ev["t"] + delta)]
            cur = ok.groupby(user_col)[ts_col].min()
            if cur.empty:
                break
            depth.loc[cur.index] += 1
        out = depth.reset_index()
        out.columns = [user_col, "depth"]
        return out

    return bucketed_group_apply(
        events.map_batches(keep, batch_format="pyarrow"),
        [user_col], merge, n_buckets=n_buckets,
    )


# ------------------------------------------------------- cohort retention
def cohort_retention_dataset(events, cohort_type: str = "signup",
                             user_col: str = "user_id",
                             type_col: str = "event_type",
                             ts_col: str = "ts", n_buckets: int = 16):
    """Weekly cohort retention → (cohort_wk, week_offset, n_users): users
    grouped by the epoch-week of their FIRST ``cohort_type`` event, and
    for every later epoch-week in which they produced ANY event, how many
    of the cohort were active. Week index is integer
    ``epoch_us // (7*86400*10^6)`` — no calendar/timezone semantics to
    drift between engines, the oracle is bit-exact integer arithmetic.

    Shape: map-side per-batch distinct (user, week, kind) rows (activity
    collapses to <= |weeks| rows per user per block), ONE user-keyed
    int-bucket exchange computing per-user cohort + offsets vectorized,
    then a tiny (cohort, offset)-keyed exchange summing counts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    week_us = 7 * 86400 * 1_000_000

    def weeks(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts_col], pa.int64())
        wk = pc.divide(us, week_us)
        users = b[user_col]
        is_sign = pc.equal(b[type_col], cohort_type)
        t = pa.table({
            user_col: users, "wk": wk,
            "kind": pc.cast(is_sign, pa.int8()),
        })
        # distinct within batch: activity rows (kind 0 = any event) from
        # ALL events, cohort-candidate rows (kind 1) from signup events
        act = pa.table({
            user_col: users, "wk": wk,
            "kind": pa.array(np.zeros(len(users), np.int8)),
        })
        sig = t.filter(is_sign)
        both = pa.concat_tables([act, sig])
        g = both.group_by([user_col, "wk", "kind"]).aggregate([])
        return g

    def per_user(g: "pd.DataFrame") -> "pd.DataFrame":
        sig = g[g["kind"] == 1].groupby(user_col)["wk"].min().rename("cw")
        act = g[g["kind"] == 0][[user_col, "wk"]].drop_duplicates()
        j = act.merge(sig.reset_index(), on=user_col)
        j = j[j["wk"] >= j["cw"]]
        j["week_offset"] = j["wk"] - j["cw"]
        out = (
            j.groupby(["cw", "week_offset"], as_index=False)[user_col]
            .count().rename(columns={"cw": "cohort_wk", user_col: "n_users"})
        )
        return out

    partial = bucketed_group_apply(
        events.map_batches(weeks, batch_format="pyarrow"),
        [user_col], per_user, n_buckets=n_buckets,
    )

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.groupby(["cohort_wk", "week_offset"], as_index=False)[
            "n_users"
        ].sum()

    return bucketed_group_apply(
        partial, ["cohort_wk", "week_offset"], fold, n_buckets=n_buckets,
    )


# ------------------------------------------------------ event transitions
def event_transitions_dataset(events, user_col: str = "user_id",
                              type_col: str = "event_type",
                              ts_col: str = "ts", id_col: str = "event_id",
                              n_buckets: int = 16):
    """User-journey transition matrix → (from_type, to_type, n): counts of
    consecutive event-type bigrams per user, ordered by (ts, event_id) —
    the Markov-chain estimate behind funnel design and anomaly detection.

    ONE user-keyed int-bucket exchange; inside each bucket the whole
    bucket sorts once and every user's consecutive pairs fall out of a
    single shifted comparison (no per-user loop), pre-aggregated to
    <= |types|^2 rows before the tiny matrix fold."""
    import numpy as np

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col, id_col], kind="mergesort")
        u = g[user_col].to_numpy()
        t = g[type_col].to_numpy()
        same = u[1:] == u[:-1]
        out = pd.DataFrame({
            "from_type": t[:-1][same],
            "to_type": t[1:][same],
        })
        return out.groupby(["from_type", "to_type"], as_index=False).size() \
            .rename(columns={"size": "n"})

    partial = bucketed_group_apply(
        events, [user_col], per_user, n_buckets=n_buckets,
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["from_type", "to_type"], as_index=False)["n"].sum()

    return bucketed_group_apply(
        partial, ["from_type", "to_type"], fold, n_buckets=n_buckets,
    )


def windowed_distinct_dataset(events, every_s: int = 3600,
                              type_col: str = "event_type",
                              key_col: str = "user_id",
                              n_buckets: int = 16):
    """EXACT distinct-key count per tumbling window per type →
    (window_start_s, event_type, n_distinct).

    The pre-aggregation story for COUNT(DISTINCT) at scale: each batch
    dedups (window, type, key) locally — a key active in a window
    collapses to ≤1 row per block BEFORE the exchange — then one
    int-bucket exchange (hashed on the (window, type) pair, so one
    window-type group never straddles buckets) finishes the dedup and
    counts. The exchange moves at most one row per (window, type,
    distinct key), not per event. For sketch-sized state instead of an
    exact exchange, see ``sketch.hll_registers_dataset``."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.shuffles import bucketed_group_apply

    us = every_s * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        t = pa.table({
            "w": pa.array((ts // us) * every_s),
            "event_type": b[type_col],
            "k": b[key_col],
        })
        return t.group_by(["w", "event_type", "k"]).aggregate([])

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["w", "event_type", "k"])
        out = d.groupby(["w", "event_type"], as_index=False).size()
        out = out.rename(columns={"w": "window_start_s",
                                  "size": "n_distinct"})
        out["n_distinct"] = out["n_distinct"].astype(np.int64)
        return out[["window_start_s", "event_type", "n_distinct"]]

    return bucketed_group_apply(
        events.map_batches(partial, batch_format="pyarrow"),
        ["w", "event_type"], count_distinct, n_buckets=n_buckets,
    )


def attribution_dataset(ds, touch_types: tuple[str, ...] = ("click", "view"),
                        convert_type: str = "purchase",
                        window_hours: int = 24, n_buckets: int = 16):
    """Last-touch attribution: each conversion is credited to the user's most
    recent touch event (``touch_types``) within ``window_hours`` before
    it → (event_type, n_purchases, sum_value_c) totals per touch type,
    with ``'(none)'`` for conversions that had no touch in window.

    Tie rule (mirrored by the oracle's row_number ORDER BY ts DESC,
    event_id DESC): equal-timestamp touches break by highest event_id.
    Integer-cent value sums for summation-order independence.

    Scale shape: one scan splits conversions/touches map-side (rows of
    other types never reach the wire); one int-bucket exchange on
    user_id co-locates each user's rows; the per-bucket match is a
    single vectorized ``merge_asof`` with by=user — no per-user Python
    loop; the attribution totals are a |touch_types|-bounded second
    exchange of per-bucket partials."""
    import numpy as np
    import pyarrow.compute as pc

    tset = sorted(set(touch_types))

    def split(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"],
                        value_set=pa.array(tset + [convert_type]))
        t = b.filter(keep)
        v = pc.fill_null(pc.cast(t["value"], pa.float64()),
                         0.0).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "ts": t["ts"].cast(pa.timestamp("us")),
            "event_type": t["event_type"],
            "event_id": t["event_id"],
            "v_c": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })

    rows = ds.map_batches(split, batch_format="pyarrow")

    def match(g: pd.DataFrame) -> pd.DataFrame:
        conv = g[g["event_type"] == convert_type]
        if conv.empty:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "v_c": pd.Series([], dtype=np.int64),
            })
        touch = g[g["event_type"] != convert_type]
        # stable ts sort with event_id secondary: merge_asof takes the
        # LAST eligible row, which is then max (ts, event_id) — the tie
        # rule of the oracle's row_number
        conv = conv.sort_values(["ts", "event_id"], kind="mergesort")
        touch = touch.sort_values(["ts", "event_id"], kind="mergesort")
        m = pd.merge_asof(
            conv[["user_id", "ts", "v_c"]],
            touch[["user_id", "ts", "event_type"]],
            on="ts", by="user_id",
            tolerance=pd.Timedelta(hours=window_hours),
            direction="backward",
        )
        m["event_type"] = m["event_type"].fillna("(none)")
        out = m.groupby("event_type", as_index=False).agg(
            n=("v_c", "size"), v_c=("v_c", "sum"))
        out["n"] = out["n"].astype(np.int64)
        out["v_c"] = out["v_c"].astype(np.int64)
        return out

    partials = bucketed_group_apply(rows, ["user_id"], match,
                                    n_buckets=n_buckets)

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([("n", "sum"),
                                                ("v_c", "sum")])
        return g.rename_columns(["event_type", "n_purchases",
                                 "sum_value_c"])

    return bucketed_group_apply(partials, ["event_type"], combine,
                                n_buckets=n_buckets,
                                batch_format="pyarrow")


def session_paths_dataset(ds, gap_minutes: int = 30, depth: int = 3,
                          n_buckets: int = 16):
    """Top-of-session journey paths: sessionize per user (gap rule),
    take each session's first ``depth`` event types joined with '>'
    ('click>view>purchase'), count sessions per path →
    (path, n_sessions).

    One user-bucket exchange; sessionization, ranking and the path
    concat are all vectorized (sorted cumsum breaks, searchsorted
    alignment of rank-1/rank-2 rows onto the rank-0 session row — no
    per-session Python). Second exchange is path-vocabulary-bounded
    (≤ |types|^depth). Tie rule everywhere: (ts, event_id). Oracle:
    lag/sum window sessionization + string_agg(ORDER BY) FILTER rn ≤
    depth."""
    import numpy as np
    import pyarrow.compute as pc

    gap_us = gap_minutes * 60 * 1_000_000

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "event_id": b["event_id"],
            "us": pc.cast(b["ts"].cast(pa.timestamp("us")), pa.int64()),
            "event_type": b["event_type"],
        })

    rows = ds.map_batches(project, batch_format="pyarrow")

    def paths(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        g = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        us = g["us"].to_numpy()
        uid = g["user_id"].to_numpy()
        prev_us = np.roll(us, 1)
        new_user = np.ones(len(g), bool)
        new_user[1:] = uid[1:] != uid[:-1]
        brk = new_user | ((us - prev_us) > gap_us)
        sid = np.cumsum(brk) - 1          # monotone over the sorted frame
        rank = np.arange(len(g)) - np.maximum.accumulate(
            np.where(brk, np.arange(len(g)), 0))
        types = g["event_type"].to_numpy()
        head = rank == 0
        path = types[head].astype(object)
        sids0 = sid[head]                  # sorted unique session ids
        for r in range(1, depth):
            m = rank == r
            if not m.any():
                break
            idx = np.searchsorted(sids0, sid[m])
            path[idx] = path[idx] + ">" + types[m]
        u, c = np.unique(path.astype(str), return_counts=True)
        return pd.DataFrame({"path": u, "n": c.astype(np.int64)})

    partials = bucketed_group_apply(rows, ["user_id"], paths,
                                    n_buckets=n_buckets)

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("path").aggregate([("n", "sum")])
        return g.rename_columns(["path", "n_sessions"])

    return bucketed_group_apply(partials, ["path"], combine,
                                n_buckets=n_buckets,
                                batch_format="pyarrow")


def watermark_late_dataset(ds, delay_us: int = 3_600_000_000,
                           id_col: str = "event_id", ts_col: str = "ts",
                           n_ranges: int = 64):
    """Streaming watermark semantics replayed over the at-rest log →
    (event_id, wm_us, is_late): arrival order is ``id_col``; the
    watermark after an event arrives is ``max(ts so far) − delay``; an
    event is LATE iff its ts is below the watermark the PREVIOUS arrival
    left (strictly-preceding running max − delay; the first arrival is
    never late). The classifier every windowed-aggregation pipeline runs
    before dropping/again-firing late data (Ray Data has no watermark
    notion; this is the batch-replay equivalent).

    Distributed global running max WITHOUT a global sort — the
    `ntile_dataset` range-partitioned prefix shape: sampled id-quantile
    range bounds (balance-only), one map pass tags range_id, per-range
    max-ts partials fold into exclusive carry-in maxima on the driver
    (n_ranges scalars), and an int-keyed ``map_groups`` sorts each range
    locally and scans ``np.maximum.accumulate`` seeded by the carry-in.
    Rows cross exactly one int-keyed exchange."""
    import numpy as np
    import pyarrow.compute as pc

    sample = ds.limit(4096).to_pandas()
    sv = (sample[id_col].to_numpy(dtype=np.int64)
          if id_col in sample.columns else np.array([], np.int64))
    bounds = (np.quantile(sv, np.linspace(0, 1, n_ranges + 1)[1:-1])
              if len(sv) else np.array([], np.float64))

    def tag(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(b[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        rng = np.searchsorted(bounds, ids, side="left").astype(np.int64)
        return pa.table({
            id_col: pa.array(ids), "ts_us": pa.array(ts),
            "range_id": pa.array(rng),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def mx(b: pa.Table) -> pa.Table:
        import pandas as pd

        g = b.to_pandas().groupby("range_id")["ts_us"].max()
        return pa.table({"range_id": pa.array(g.index.to_numpy(np.int64)),
                         "m": pa.array(g.to_numpy(np.int64))})

    SENT = np.int64(-(2**62))
    range_max = np.full(n_ranges, SENT, np.int64)
    # n_ranges scalars to the driver (bounded fold, like ntile's counts)
    for row in tagged.map_batches(mx, batch_format="pyarrow").take_all():
        range_max[row["range_id"]] = max(range_max[row["range_id"]],
                                         row["m"])
    carry = np.full(n_ranges, SENT, np.int64)
    np.maximum.accumulate(range_max[:-1], out=carry[1:])

    def scan(g: pa.Table) -> pa.Table:
        g = g.sort_by([(id_col, "ascending")])
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        r0 = int(g["range_id"][0].as_py())
        prev = np.maximum.accumulate(
            np.concatenate(([carry[r0]], ts)))[:-1]
        wm = np.maximum(prev, ts) - np.int64(delay_us)
        late = ((prev != SENT) & (ts < prev - np.int64(delay_us)))
        return pa.table({
            id_col: g[id_col],
            "wm_us": pa.array(wm, pa.int64()),
            "is_late": pa.array(late.astype(np.int64)),
        })

    return tagged.groupby("range_id").map_groups(
        scan, batch_format="pyarrow")
