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
