"""Deterministic distributed sampling: uniform top-k-by-hash and
per-stratum variants.

The scale problem with classic reservoir sampling is coordination: a
sequential reservoir is driver-state, and per-worker reservoirs need a
weighted merge. Hash-priority sampling removes the coordination entirely:
assign every row a deterministic pseudo-random priority = hash(key), take
the k smallest priorities globally. That is a uniform sample without
replacement (any fixed-size subset is equally likely under an ideal hash),
it is reproducible across runs/cluster sizes (no RNG state), resumable,
and it distributes as map-side partial top-k (each block keeps its own k
smallest — ≤ k·n_blocks candidate rows ever move) followed by a tiny
final merge.

Two priority functions:

- ``splitmix64`` (default): vectorized numpy 64-bit mixer — the scale
  path, zero per-row Python.
- ``md5``: hex md5 of the decimal key string — bit-identical to DuckDB's
  ``md5(CAST(key AS VARCHAR))``, which is what the correctness oracle
  compares against (Arrow has no md5 kernel, so this path pays a per-row
  hashlib call; it exists for verifiability, the default for production
  sampling is splitmix64).

Reference anchor: the reference's sampling is the seeded `random.sample`
frontier cap (`src/framework.py`, O2/O3 in SURVEY §2.6) — driver-local;
this module is the corpus-scale generalization.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (Steele et al., JDK SplittableRandom)."""
    z = x.astype(np.uint64) + _SM_GAMMA
    z = (z ^ (z >> np.uint64(30))) * _SM_M1
    z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def _priorities(keys: pa.ChunkedArray | pa.Array, method: str) -> pa.Array:
    if method == "splitmix64":
        ids = keys.to_numpy(zero_copy_only=False).astype(np.int64)
        # shift into int64 range so Arrow sort/limit stays integer-native
        return pa.array((splitmix64(ids) >> np.uint64(1)).astype(np.int64))
    if method == "md5":
        return pa.array(
            [
                hashlib.md5(str(v).encode("ascii")).hexdigest()
                for v in keys.to_pylist()
            ],
            pa.string(),
        )
    raise ValueError(f"unknown priority method: {method}")


def uniform_sample_dataset(ds, k: int, key_col: str = "doc_id",
                           method: str = "splitmix64"):
    """k-row uniform sample: global k smallest hash priorities.

    Map-side: each block keeps its own k smallest (vectorized argpartition)
    so at most k rows per block reach the final merge; final: sort + limit
    over the ≤ k·n_blocks survivors. Returns ``(key_col, pri)``.
    """

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {key_col: b[key_col],
                 "pri": pa.array([], pa.int64() if method == "splitmix64"
                                 else pa.string())}
            )
        pri = _priorities(b[key_col], method)
        t = pa.table({key_col: b[key_col], "pri": pri})
        if t.num_rows <= k:
            return t
        if method == "splitmix64":
            idx = np.argpartition(pri.to_numpy(), k)[:k]
            return t.take(pa.array(idx, pa.int64()))
        import pyarrow.compute as pc

        order = pc.sort_indices(t, sort_keys=[("pri", "ascending")])
        return t.take(order[:k])

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort("pri")
        .limit(k)
    )


def stratified_sample_dataset(ds, k: int, stratum_col: str,
                              key_col: str = "event_id",
                              method: str = "splitmix64", n_buckets: int = 16):
    """k rows PER STRATUM (group), same hash-priority construction.

    Map-side per-block per-stratum top-k, then one int-bucket exchange on
    the stratum with a vectorized per-stratum head(k) inside each bucket —
    a skewed giant stratum still only ships ≤ k rows per block.
    Returns ``(stratum_col, key_col, pri)``.
    """
    import pandas as pd

    from ..functions.shuffles import bucketed_group_apply

    def local_topk(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                stratum_col: b[stratum_col],
                key_col: b[key_col],
                "pri": _priorities(b[key_col], method),
            }
        )
        df = t.to_pandas()
        df = df.sort_values("pri", kind="mergesort").groupby(
            stratum_col, sort=False
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values("pri", kind="mergesort")
            .groupby(stratum_col, sort=False)
            .head(k)
        )

    return bucketed_group_apply(
        ds.map_batches(local_topk, batch_format="pyarrow"),
        [stratum_col], merge, n_buckets=n_buckets, batch_format="pandas",
    )


def weighted_mix_dataset(ds, rate_fn, source_col: str = "source",
                         key_col: str = "doc_id", method: str = "splitmix64"):
    """Deterministic corpus MIXING: keep each row with per-source
    probability ``rate_fn(source)`` — the training-mixture construction
    pass (upsample curated sources, downsample crawl) as a map-only
    Bernoulli filter on a hash fraction. No RNG state, reproducible across
    runs and cluster sizes, and composable with the samplers above because
    all three draw from the same key-hash priority space.

    - ``splitmix64`` (default, scale path): keep iff
      ``splitmix64(key) < rate * 2^64``; per-row rate lookup goes through
      Arrow dictionary indices, so the batch cost is one mixer pass + one
      numpy gather regardless of row count.
    - ``md5`` (oracle path): keep iff the first 8 hex chars of
      ``md5(CAST(key AS VARCHAR))`` compare below ``hex(rate * 16^8)`` —
      fixed-width lowercase hex, so string order == numeric order and the
      DuckDB mirror is a plain CASE + substr comparison.

    Rates are evaluated once per DISTINCT source per batch (cached), not
    per row; rates ≥ 1.0 keep everything, ≤ 0.0 drop everything.
    """
    import hashlib

    import pyarrow.compute as pc

    def keep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        enc = pc.dictionary_encode(
            b[source_col].combine_chunks()
            if isinstance(b[source_col], pa.ChunkedArray) else b[source_col]
        )
        src_vals = enc.dictionary.to_pylist()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        rates = np.array([float(rate_fn(s)) for s in src_vals])[idx]
        if method == "splitmix64":
            h = splitmix64(
                b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            ).astype(np.float64)
            mask = h < rates * float(2**64)
        elif method == "md5":
            thr = [
                format(min(int(r * 16**8), 16**8), "09x") if r < 1.0 else "g"
                for r in np.array([float(rate_fn(s)) for s in src_vals])
            ]  # "g" > any hex char: keep-all sentinel; 9-wide keeps 16^8 exact
            p8 = [
                hashlib.md5(str(v).encode("ascii")).hexdigest()[:8].rjust(9, "0")
                for v in b[key_col].to_pylist()
            ]
            mask = np.array([p < thr[i] for p, i in zip(p8, idx)])
        else:
            raise ValueError(f"unknown priority method: {method}")
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def deterministic_shuffle_dataset(ds, n_shards: int = 8,
                                  key_col: str = "doc_id",
                                  method: str = "splitmix64",
                                  n_ranges: int = 64):
    """Deterministic GLOBAL SHUFFLE for training: every row gets its rank
    in the hash-priority total order, dealt round-robin into
    ``(shard, pos)`` — the pre-training shuffle+shard pass, reproducible
    across runs AND cluster sizes (``ray.data.random_shuffle`` is neither).

    Distributed rank = the same scan-then-propagate prefix sum as
    `stages/packing.py`, but range-partitioned on the PRIORITY value
    (hash output is uniform, so prefix ranges are balanced by
    construction): one map pass tags priority + order-aligned range id,
    per-range counts fold into exclusive rank offsets on the driver
    (n_ranges ints), and an int-keyed ``map_groups`` sorts each range and
    adds ``offset + arange``. shard = rank % n_shards, pos = rank //
    n_shards, so every shard sees a uniform, disjoint, gap-free slice.
    """
    import hashlib

    def tag(b: pa.Table) -> pa.Table:
        if method == "splitmix64":
            pri = (
                splitmix64(
                    b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ) >> np.uint64(1)
            ).astype(np.int64)
            rng = pri >> np.int64(63 - int(np.log2(n_ranges)))
            pri_arr: pa.Array = pa.array(pri, pa.int64())
        elif method == "md5":
            hx = [
                hashlib.md5(str(v).encode("ascii")).hexdigest()
                for v in b[key_col].to_pylist()
            ]
            rng = np.array([int(h[:2], 16) * n_ranges // 256 for h in hx])
            pri_arr = pa.array(hx, pa.string())
        else:
            raise ValueError(f"unknown priority method: {method}")
        return pa.table(
            {
                key_col: b[key_col],
                "pri": pri_arr,
                "range_id": pa.array(rng.astype(np.int64), pa.int64()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def counts(b: pa.Table) -> pa.Table:
        r = b["range_id"].to_numpy(zero_copy_only=False)
        uniq, c = np.unique(r, return_counts=True)
        return pa.table(
            {"range_id": pa.array(uniq, pa.int64()),
             "n": pa.array(c.astype(np.int64), pa.int64())}
        )

    totals = np.zeros(n_ranges, dtype=np.int64)
    for row in tagged.map_batches(counts, batch_format="pyarrow").take_all():
        totals[row["range_id"]] += row["n"]
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))

    def rank(g: pa.Table) -> pa.Table:
        g = g.sort_by([("pri", "ascending"), (key_col, "ascending")])
        r = int(g["range_id"][0].as_py())
        rn = int(offsets[r]) + np.arange(g.num_rows, dtype=np.int64)
        return pa.table(
            {
                key_col: g[key_col],
                "shard": pa.array(rn % n_shards, pa.int64()),
                "pos": pa.array(rn // n_shards, pa.int64()),
            }
        )

    return tagged.groupby("range_id").map_groups(rank, batch_format="pyarrow")


def hash_split_dataset(ds, weights: tuple = (8, 1, 1),
                       names: tuple = ("train", "val", "test"),
                       key_col: str = "doc_id"):
    """Deterministic train/val/test corpus split: row → ``names[i]`` with
    probability ``weights[i]/sum(weights)``, keyed on
    ``splitmix64(key) % sum(weights)`` — the split a training-data build
    runs right before sharding.

    Entirely integer (hash, modulo, cumulative-weight searchsorted), so
    the assignment is bit-reproducible on any engine and cluster size,
    exactly SQL-expressible (the oracle mirrors the modulo + CASE), and
    stable under repartitioning: a document's split never depends on
    where it is read. Map-only — no shuffle, no state, no driver pass.
    Returns the input plus a ``split`` string column.
    """
    denom = int(sum(weights))
    cum = np.cumsum(np.asarray(weights, dtype=np.int64))
    names_arr = np.asarray(names, dtype=object)
    if len(weights) != len(names):
        raise ValueError("weights and names must pair up")

    def assign(b: pa.Table) -> pa.Table:
        ids = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (splitmix64(ids) % np.uint64(denom)).astype(np.int64)
        idx = np.searchsorted(cum, m, side="right")
        return b.append_column(
            "split", pa.array(names_arr[idx], pa.string())
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def temperature_mix_dataset(ds, alpha: float = 0.7,
                            source_col: str = "source",
                            key_col: str = "doc_id",
                            method: str = "splitmix64"):
    """Temperature-scaled source rebalancing (the mT5 / multilingual-LM
    mixture rule, Xue et al. 2021): sample source ``s`` in proportion to
    ``p_s^alpha`` (``p_s`` = its corpus share) instead of ``p_s``, here as
    a subsampling keep-rate

        r_s = (p_s^(alpha-1)) / max_t (p_t^(alpha-1))

    so with ``alpha < 1`` the SMALLEST source keeps 100% and larger
    sources are hash-Bernoulli thinned toward the tempered distribution
    (pure subsampling — no row duplication). ``alpha = 1`` keeps
    everything; ``alpha = 0`` targets the uniform mixture.

    Shape: per-block (source, n) partials fold to a source-bounded count
    table on the driver (the `term_category_assoc` category-total
    pattern) → rates are |sources| scalars → the filter itself is
    `weighted_mix_dataset`'s map-only hash Bernoulli. ONE streaming pass
    over the corpus after the count pass; nothing row-sized leaves
    workers. Rates derive from exact integer counts via float64 pow —
    the md5 oracle mirrors the same expression, with the documented
    ~1-ulp threshold tolerance (flips a doc only if its 32-bit hash
    prefix lands exactly on the flipped threshold integer)."""
    def counts(b: pa.Table) -> pa.Table:
        g = b.group_by(source_col).aggregate([([], "count_all")])
        return g.rename_columns([source_col, "n"])

    tot: dict[str, int] = {}
    # source-vocabulary-bounded driver fold: one row per (block, source)
    for b in ds.map_batches(counts, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for s, v in zip(b[source_col].to_pylist(), b["n"].to_numpy()):
            tot[s] = tot.get(s, 0) + int(v)
    if not tot:
        return ds
    n_total = float(sum(tot.values()))
    srcs = list(tot)
    w = np.array([(tot[s] / n_total) ** (alpha - 1.0) for s in srcs],
                 np.float64)
    rates = dict(zip(srcs, w / w.max()))

    return weighted_mix_dataset(
        ds, lambda s: rates.get(s, 1.0), source_col=source_col,
        key_col=key_col, method=method,
    )
