"""Per-group quantiles: exact (bucketed per-group interpolation) and a
deterministic-sample approximation for groups too large to co-locate.

Exact shape: one int-bucket exchange on the group key (all rows of a
group share a bucket), linear-interpolated quantiles per group inside the
bucket — the interpolation is numpy/pandas 'linear', the same
``x[⌊h⌋] + (h-⌊h⌋)·(x[⌊h⌋+1]-x[⌊h⌋])`` DuckDB's ``quantile_cont`` uses,
and results are rounded to 6 dp so the SQL oracle agrees bit-for-bit.
Valid while each group's values fit a worker (groups × values is the
bucket payload).

Sampled shape for web-scale groups: per-block per-group top-``m`` by
splitmix64 hash priority of the row key (deterministic, layout-invariant
— the same construction as ``stages/sampling.py``), so ≤ m rows per
(block, group) ever move; quantiles of the sample approximate the true
quantile with rank error O(1/√m). No reference counterpart (LLM-pipeline
extension operator).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sampling import _priorities


def _group_quantiles(df: pd.DataFrame, key_col: str, val_col: str,
                     qs: dict[str, float]) -> pd.DataFrame:
    g = df.dropna(subset=[val_col]).groupby(key_col)[val_col]
    out = {name: g.quantile(q, interpolation="linear").round(6)
           for name, q in qs.items()}
    return pd.DataFrame(out).reset_index()


def group_quantiles_dataset(ds, key_col: str, val_col: str,
                            qs: dict[str, float] | None = None,
                            n_buckets: int = 16):
    """Exact per-group quantiles → (key_col, *qs.keys())."""
    from ..functions.shuffles import bucketed_group_apply

    qs = qs or {"p50": 0.5, "p95": 0.95}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return _group_quantiles(g, key_col, val_col, qs)

    return bucketed_group_apply(
        ds.select_columns([key_col, val_col]), [key_col], merge,
        n_buckets=n_buckets, batch_format="pandas",
    )


def group_quantiles_sampled_dataset(ds, key_col: str, val_col: str,
                                    id_col: str, m: int = 1024,
                                    qs: dict[str, float] | None = None,
                                    n_buckets: int = 16):
    """Approximate per-group quantiles over a deterministic hash-priority
    sample of ``m`` values per group. Same output schema as the exact
    variant; rank error O(1/√m) (test-bounded in tests/test_quantiles.py).
    """
    from ..functions.shuffles import bucketed_group_apply

    qs = qs or {"p50": 0.5, "p95": 0.95}

    def local_topm(b: pa.Table) -> pa.Table:
        t = pa.table({key_col: b[key_col], val_col: b[val_col],
                      "pri": _priorities(b[id_col], "splitmix64")})
        df = t.to_pandas()
        df = df.sort_values("pri", kind="mergesort").groupby(
            key_col, sort=False
        ).head(m)
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        samp = g.sort_values("pri", kind="mergesort").groupby(
            key_col, sort=False
        ).head(m)
        return _group_quantiles(samp, key_col, val_col, qs)

    return bucketed_group_apply(
        ds.map_batches(local_topm, batch_format="pyarrow"),
        [key_col], merge, n_buckets=n_buckets, batch_format="pandas",
    )


def group_mad_dataset(ds, key_col: str, val_col: str, n_buckets: int = 16):
    """Per-group robust dispersion → (key_col, median_value, mad):
    MAD = median(|v − median(v)|), the standard outlier-resistant scale
    estimator (Hampel 1974) — the robust counterpart of
    `ranking.zscore_dataset`'s mean/stddev.

    Shape: the SAME one int-bucket exchange as `group_quantiles_dataset`
    (a group's values co-locate in its bucket), with both passes —
    median, then median of absolute deviations — computed vectorized
    inside the bucket; no second exchange. The inner median keeps full
    float64 precision for the deviations; only the OUTPUTS round to 6 dp
    (the quantile-oracle agreement contract)."""
    from ..functions.shuffles import bucketed_group_apply

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=[val_col])
        med = g.groupby(key_col)[val_col].quantile(
            0.5, interpolation="linear")
        dev = (g[val_col] - g[key_col].map(med)).abs()
        mad = dev.groupby(g[key_col]).quantile(0.5, interpolation="linear")
        out = pd.DataFrame({
            "median_value": med.round(6), "mad": mad.round(6),
        })
        return out.reset_index()

    return bucketed_group_apply(
        ds.select_columns([key_col, val_col]), [key_col], merge,
        n_buckets=n_buckets, batch_format="pandas",
    )


def anomalous_days_dataset(events, type_col: str = "event_type",
                           ts_col: str = "ts", k: float = 3.0,
                           n_buckets: int = 16):
    """Robust volume-anomaly detection → (event_type, day, n_events,
    median_n, mad_n) for days where |n − median| > k·MAD of that type's
    daily counts (the Hampel filter over the per-type daily volume
    series — the standard pipeline-monitoring alarm; MAD=0 degenerates
    to n ≠ median, the strictest reading, same on both sides).

    Shape: map-side (type, day) partial counts (day-vocabulary-bounded)
    → ONE type-bucket exchange that both folds the counts and runs the
    median/MAD/flag vectorized per type — daily-count series are
    days-bounded, so a bucket holds at most |types|·|days| tiny rows."""
    import pyarrow.compute as pc

    from ..functions.shuffles import bucketed_group_apply

    def day_partials(b: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": b[type_col],
            "day": pc.strftime(b[ts_col], format="%Y-%m-%d"),
        })
        g = t.group_by(["event_type", "day"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "day", "n"])

    parts = events.map_batches(day_partials, batch_format="pyarrow")

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["event_type", "day"], as_index=False)["n"].sum()
        med = g.groupby("event_type")["n"].transform(
            lambda s: s.quantile(0.5, interpolation="linear"))
        mad = (g["n"] - med).abs().groupby(g["event_type"]).transform(
            lambda s: s.quantile(0.5, interpolation="linear"))
        out = g[(g["n"] - med).abs() > k * mad].copy()
        out["median_n"] = med[out.index].round(6)
        out["mad_n"] = mad[out.index].round(6)
        return out.rename(columns={"n": "n_events"})

    return bucketed_group_apply(
        parts, ["event_type"], flag, n_buckets=n_buckets,
        batch_format="pandas",
    )
