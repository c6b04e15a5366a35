"""Per-group order statistics: grouped top-N selection and z-score
normalization.

Grouped top-N is the window-function ``row_number() OVER (PARTITION BY g
ORDER BY v) <= n`` shape Ray Data lacks natively. Scale shape mirrors
``stages/sampling.py``: map-side per-block per-group top-N prunes to
≤ n rows per (block, group) BEFORE the exchange, then one int-bucket
exchange on the group key with a vectorized in-bucket head(n) — a skewed
giant group still ships only n rows per block.

Z-score is the two-pass broadcast shape: map-side (n, Σv, Σv²) partials
per group → a group-vocabulary-sized combine on the driver → ``ray.put``
broadcast of the stats → a pure map stage. Nothing group-keyed ever
shuffles; the per-row output streams. Uses the population-variance
formula ``(Σv² − (Σv)²/n)/n`` matching SQL ``stddev_pop``; results are
rounded to 6 dp so serial-vs-distributed float drift can't flip the
oracle hash. No reference counterpart (LLM-pipeline extension operators).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.shuffles import bucketed_group_apply


def grouped_topn_dataset(ds, group_col: str, order_col: str, n: int,
                         tiebreak_col: str, descending: bool = True,
                         n_buckets: int = 16):
    """Top-``n`` rows per group by ``order_col`` (ties broken by
    ``tiebreak_col`` ascending — fully deterministic). Adds a ``rank``
    column (1-based within group)."""

    ascending = [not descending, True]
    sort_cols = [order_col, tiebreak_col]

    def local_prune(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(sort_cols, ascending=ascending,
                            kind="mergesort").groupby(
            group_col, sort=False
        ).head(n)
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        g = g.groupby(group_col, sort=False).head(n).copy()
        g["rank"] = g.groupby(group_col, sort=False).cumcount() + 1
        return g

    return bucketed_group_apply(
        ds.map_batches(local_prune, batch_format="pyarrow"),
        [group_col], merge, n_buckets=n_buckets, batch_format="pandas",
    )


def zscore_dataset(ds, group_col: str, val_col: str, id_cols: list[str]):
    """Per-row z-score of ``val_col`` within its ``group_col`` group →
    (*id_cols, group_col, z). Groups with zero variance get z = 0
    (matching ``CASE WHEN stddev_pop = 0`` SQL guards)."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        v = b[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        g = b[group_col].to_numpy(zero_copy_only=False)
        ug, inv = np.unique(g, return_inverse=True)
        return pa.table({
            group_col: pa.array(ug),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=v)),
            "s2": pa.array(np.bincount(inv, weights=v * v)),
        })

    stats = (
        ds.select_columns([group_col, val_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .sum(["n", "s", "s2"])
        .to_pandas()  # group-vocabulary-sized
    )
    keys = stats[group_col].to_numpy()
    srt = np.argsort(keys)
    n = stats["sum(n)"].to_numpy(dtype=np.float64)[srt]
    s = stats["sum(s)"].to_numpy(dtype=np.float64)[srt]
    s2 = stats["sum(s2)"].to_numpy(dtype=np.float64)[srt]
    mean = s / n
    var = np.maximum((s2 - s * s / n) / n, 0.0)
    std = np.sqrt(var)
    stats_ref = ray.put((keys[srt], mean, std))

    def score(b: pa.Table) -> pa.Table:
        gk, gmean, gstd = ray.get(stats_ref)
        g = b[group_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(gk, g)
        v = b[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        sd = gstd[pos]
        z = np.where(sd == 0, 0.0, (v - gmean[pos]) / np.where(sd == 0, 1, sd))
        out = b.select([c for c in (*id_cols, group_col) if c in b.column_names])
        return out.append_column("z", pa.array(np.round(z, 6), pa.float64()))

    return ds.select_columns([*id_cols, group_col, val_col]).map_batches(
        score, batch_format="pyarrow"
    )
