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
    merge: Callable,
    n_buckets: int = 16,
    batch_format: str = "pandas",
):
    """Bucket rows by the hash of ``key_cols`` and apply ``merge`` once per
    bucket (vectorized inside; all rows of a key share a bucket). ``merge``
    receives a bucket WITHOUT the bucket column, as a ``pd.DataFrame``
    (``batch_format="pandas"``) or ``pa.Table`` (``"pyarrow"``).

    Prefer ``"pyarrow"`` when the merge is expressible as Arrow kernels:
    the pandas path pays a to_pandas conversion per bucket AND pandas'
    object-dtype string groupby — measured 5.5× slower on the sf0.1 edge
    dedup (11.0 s vs 2.0 s for the identical group-sum)."""

    def tag(b: pa.Table) -> pa.Table:
        # hash only the key columns through pandas (same siphash and thus
        # the SAME bucket assignment as add_hash_bucket), then append the
        # int32 bucket to the Arrow block — no full-batch pandas round-trip
        kdf = b.select(key_cols).to_pandas()
        key = kdf[key_cols[0]].astype(str)
        for c in key_cols[1:]:
            key = key + "\x00" + kdf[c].astype(str)
        bucket = (
            pd.util.hash_pandas_object(key, index=False) % n_buckets
        ).astype("int32")
        return b.append_column("bucket", pa.array(bucket.to_numpy(), pa.int32()))

    if batch_format == "pyarrow":

        def apply(g: pa.Table) -> pa.Table:
            return merge(g.drop_columns(["bucket"]))

    else:

        def apply(g: pd.DataFrame) -> pd.DataFrame:
            return merge(g.drop(columns=["bucket"]))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(apply, batch_format=batch_format)
    )
