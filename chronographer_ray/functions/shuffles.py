"""Bucketed shuffle helpers — the engine's answer to Ray's sort-based
aggregate cost on wide string keys.

Pattern (used by edge dedup D1/D7, temporal min/max A8, window aggregates):
map-side partial combine → hash the key tuple to a small INT bucket →
``groupby(bucket).map_groups`` with a vectorized pandas merge inside each
bucket. Sorting 16 ints costs a fraction of sorting millions of long
strings (measured 12× on edge dedup at sf0.1), buckets are uniform by
construction (hash), and a hub key lands in exactly one bucket AFTER the
map-side combine has already collapsed it to ≤1 row per block — the salting
story of SURVEY §7.4 realized as local pre-aggregation + int-keyed exchange.
"""
from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa


def add_hash_bucket(
    df: pd.DataFrame, key_cols: list[str], n_buckets: int = 16,
    bucket_col: str = "bucket",
) -> pd.DataFrame:
    """Append an int32 hash bucket of the key tuple (deterministic,
    pandas siphash — stable across processes)."""
    key = df[key_cols[0]].astype(str)
    for c in key_cols[1:]:
        key = key + "\x00" + df[c].astype(str)
    bucket = (pd.util.hash_pandas_object(key, index=False) % n_buckets).astype(
        "int32"
    )
    return df.assign(**{bucket_col: bucket})


def bucketed_group_apply(
    ds,
    key_cols: list[str],
    merge: Callable[[pd.DataFrame], pd.DataFrame],
    n_buckets: int = 16,
):
    """Bucket rows by the hash of ``key_cols`` and apply ``merge`` once per
    bucket (vectorized pandas inside; all rows of a key share a bucket).
    ``merge`` receives a bucket's frame WITHOUT the bucket column."""

    def tag(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        return pa.Table.from_pandas(
            add_hash_bucket(df, key_cols, n_buckets), preserve_index=False
        )

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        return merge(g.drop(columns=["bucket"]))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(apply, batch_format="pandas")
    )
