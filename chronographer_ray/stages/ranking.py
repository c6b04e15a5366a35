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


def ntile_dataset(ds, n_tiles: int = 8, value_col: str = "value",
                  id_col: str = "event_id", n_ranges: int = 64):
    """Global NTILE (equi-depth bucketing) WITHOUT a global sort →
    (id_col, tile), tile ∈ 1..n_tiles, larger buckets first (SQL NTILE
    semantics, bit-exact vs ``NTILE(n) OVER (ORDER BY v, id)``).

    Distributed global rank = the range-partitioned prefix sum of
    ``stages/sampling.py``: range bounds come from a sampled quantile grid
    (bounds affect only balance, never the result — equal values share a
    range, so cross-range ordering is strict), one map pass tags
    (value, range_id), per-range counts fold into exclusive offsets on the
    driver (n_ranges ints), and an int-keyed ``map_groups`` sorts each
    range locally and emits offset + arange. Only per-range COUNTS cross
    the driver; rows move through exactly one int-keyed exchange. NULL
    values rank as 0 (mirrored as ``COALESCE(v, 0)`` in the oracle —
    NULLS-LAST vs filled-zero drift would flip the hash)."""
    import pyarrow.compute as pc

    sample = ds.limit(4096).to_pandas()
    # empty-dataset to_pandas() is column-less (Ray caveat) — guard by name
    sv = (
        sample[value_col].fillna(0.0).to_numpy(dtype=np.float64)
        if value_col in sample.columns
        else np.array([], dtype=np.float64)
    )
    if len(sv):
        bounds = np.quantile(sv, np.linspace(0, 1, n_ranges + 1)[1:-1])
    else:
        bounds = np.array([], dtype=np.float64)

    def tag(b: pa.Table) -> pa.Table:
        val = pc.fill_null(
            pc.cast(b[value_col], pa.float64()), 0.0
        ).to_numpy(zero_copy_only=False)
        rng = np.searchsorted(bounds, val, side="left").astype(np.int64)
        return pa.table({
            id_col: b[id_col],
            "v": pa.array(val, pa.float64()),
            "range_id": pa.array(rng, pa.int64()),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def counts(b: pa.Table) -> pa.Table:
        uniq, c = np.unique(
            b["range_id"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({"range_id": pa.array(uniq, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    totals = np.zeros(n_ranges, dtype=np.int64)
    for row in tagged.map_batches(counts, batch_format="pyarrow").take_all():
        totals[row["range_id"]] += row["n"]
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    total = int(totals.sum())
    if total == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "tile": pa.array([], pa.int64()),
        }))
    q, rem = divmod(total, n_tiles)
    cut = rem * (q + 1)  # ranks below cut land in the (q+1)-sized tiles

    def rank(g: pa.Table) -> pa.Table:
        g = g.sort_by([("v", "ascending"), (id_col, "ascending")])
        r0 = int(g["range_id"][0].as_py())
        rn = int(offsets[r0]) + np.arange(g.num_rows, dtype=np.int64)
        tile = np.where(
            rn < cut, rn // (q + 1), rem + (rn - cut) // max(q, 1)
        ) + 1
        return pa.table({id_col: g[id_col], "tile": pa.array(tile, pa.int64())})

    return tagged.groupby("range_id").map_groups(rank, batch_format="pyarrow")


def _local_skyline(b: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """Vectorized 2-D maximal-points kernel. Keep row r iff no other row
    s has s.x ≥ r.x ∧ s.y ≥ r.y with one strict: sort by x desc, take
    per-x-group max y (gy) and the running max of gy over strictly
    greater x (m_prev); survivors are rows with y == gy (not beaten
    within the x-group) and gy > m_prev (not beaten by any greater-x
    row). Exact duplicates of a skyline point all survive (neither
    dominates the other) — mirrored by the SQL oracle."""
    import numpy as np

    if b.num_rows == 0:
        return b
    x = b[x_col].to_numpy(zero_copy_only=False)
    y = b[y_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((-y, -x))  # x desc, y desc
    xs, ys = x[order], y[order]
    new_grp = np.ones(len(xs), bool)
    new_grp[1:] = xs[1:] != xs[:-1]
    grp_id = np.cumsum(new_grp) - 1
    n_grp = grp_id[-1] + 1
    # per-group max y = first y of the group (y desc within x group)
    gy = ys[new_grp]
    m_prev = np.full(n_grp, -np.inf)
    if n_grp > 1:
        m_prev[1:] = np.maximum.accumulate(gy)[:-1]
    keep_sorted = (ys == gy[grp_id]) & (gy[grp_id] > m_prev[grp_id])
    keep = np.zeros(len(xs), bool)
    keep[order] = keep_sorted
    return b.filter(pa.array(keep))


def skyline_dataset(ds, x_col: str, y_col: str):
    """2-D skyline (Pareto frontier, maximize both columns) → all input
    rows not dominated by any other row.

    Distributed shape exploits skyline(A ∪ B) = skyline(skyline(A) ∪
    skyline(B)): a map-only local-skyline pass prunes every block to its
    own frontier (typically a few points for correlated dims), then ONE
    single-partition pass merges the survivors. The merge input is
    Σ per-block frontier sizes — tiny in practice; fully
    anti-correlated data degenerates to O(n) skyline, where no
    algorithm compresses and the honest answer is the whole set (same
    caveat as any skyline operator)."""
    locals_ = ds.map_batches(
        lambda b: _local_skyline(b, x_col, y_col),
        batch_format="pyarrow",
    )
    # batch_size=None: the merge must see the whole surviving set in one
    # kernel call (default 1024-row batching would skyline fragments)
    return locals_.repartition(1).map_batches(
        lambda b: _local_skyline(b, x_col, y_col),
        batch_format="pyarrow", batch_size=None,
    )


def rrf_fuse(lex, vec, k: int = 20, k_rrf: int = 60,
             id_col: str = "doc_id") -> pa.Table:
    """Reciprocal-rank fusion of a lexical and a vector candidate list
    (Cormack, Clarke & Buettcher 2009) → top-``k``
    (doc_id, lex_rank, vec_rank, rrf):

        rrf(d) = Σ over legs that retrieved d of 1/(k_rrf + rank_leg(d))

    ``lex``: (doc_id, score) ranked (score desc, doc_id asc);
    ``vec``: (doc_id, sim) likewise — Datasets, Tables or DataFrames.
    A leg that missed a doc contributes 0 and reports rank 0. rrf is
    rounded to 6 dp BEFORE the final (rrf desc, doc_id asc) sort so the
    tie-break is engine-independent.

    Scale: both inputs are top-K retrieval results — K-bounded by
    construction — so the fuse is a driver-side merge of ≤ 2K rows no
    matter the corpus size; the heavy lifting stays in the legs."""
    import pandas as pd

    def _pd(x, score_col: str) -> pd.DataFrame:
        if hasattr(x, "to_pandas"):
            x = x.to_pandas()
        if "rank" in x.columns:  # leg arrives pre-ranked (e.g. merge_topk)
            return x[[id_col, "rank"]].copy()
        df = x.sort_values([score_col, id_col],
                           ascending=[False, True]).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[[id_col, "rank"]]

    lx = _pd(lex, "score").rename(columns={"rank": "lex_rank"})
    vx = _pd(vec, "sim").rename(columns={"rank": "vec_rank"})
    m = lx.merge(vx, on=id_col, how="outer")
    lr = m["lex_rank"].to_numpy(dtype=np.float64, na_value=np.nan)
    vr = m["vec_rank"].to_numpy(dtype=np.float64, na_value=np.nan)
    rrf = (np.where(np.isnan(lr), 0.0, 1.0 / (k_rrf + lr))
           + np.where(np.isnan(vr), 0.0, 1.0 / (k_rrf + vr)))
    out = pd.DataFrame({
        id_col: m[id_col].to_numpy(dtype=np.int64),
        "lex_rank": np.nan_to_num(lr).astype(np.int64),
        "vec_rank": np.nan_to_num(vr).astype(np.int64),
        "rrf": np.round(rrf, 6),
    }).sort_values(["rrf", id_col], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(out.reset_index(drop=True))
