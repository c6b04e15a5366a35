"""Bloom-filter semi-join: constant-size broadcast pre-filter + exact
distributed verify join.

Why at 100 TB: a semi-join where the "small" side has too many keys for
an exact broadcast set (billions of int64 keys = 10s of GB) but the BIG
side is the expensive part to shuffle. A Bloom filter compresses the key
set to ~``bits_per_key`` bits/key (1.25 GB/billion keys at the default
10 bits, fp ≈ 1%): broadcast it once via ``ray.put``, drop non-matching
big-side rows map-side BEFORE the join shuffle, then run the exact
``Dataset.join`` on the survivors — false positives are removed by the
join, false negatives don't exist, so the result is EXACT while the
shuffle moves ~selectivity + 1% of the big side instead of all of it.
(Bloom, "Space/time trade-offs in hash coding with allowable errors",
CACM 1970.)

Build shape mirrors the HLL sketch (`stages/sketch.py`): map-side
per-block word partials → one int-bucket OR-combine exchange bounded by
m/64 rows → driver folds the fixed-size word array.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sampling import splitmix64

_SEEDS = (np.arange(1, 16, dtype=np.uint64)) * np.uint64(0x9E3779B97F4A7C15)


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions for int64 keys (splitmix64 with k seeds)."""
    h = keys.astype(np.int64, copy=False)
    return np.stack(
        [
            (splitmix64(h + _SEEDS[i].astype(np.int64)) % np.uint64(m_bits))
            for i in range(k)
        ]
    )


def build_bloom(ds, col: str, n_expected: int | None = None,
                bits_per_key: int = 10, k: int = 7):
    """Distributed Bloom build over ``ds[col]`` (int64 keys) →
    ``(words uint64[m/64], m_bits, k)``. The exchange carries at most
    m/64 (word, bits) rows — fixed by the filter size, not the data."""
    from ..functions.shuffles import bucketed_group_apply

    if n_expected is None:
        n_expected = ds.count()
    m_bits = max(64, 1 << int(np.ceil(np.log2(max(bits_per_key * n_expected, 64)))))

    def partial(b: pa.Table) -> pa.Table:
        keys = b[col].to_numpy(zero_copy_only=False)
        if keys.size == 0:
            return pa.table({"word": pa.array([], pa.int64()),
                             "bits": pa.array([], pa.int64())})
        pos = _positions(keys, m_bits, k).ravel()
        widx = (pos >> np.uint64(6)).astype(np.int64)
        bit = (np.uint64(1) << (pos & np.uint64(63)))
        order = np.argsort(widx, kind="stable")
        widx, bit = widx[order], bit[order]
        starts = np.flatnonzero(np.r_[True, widx[1:] != widx[:-1]])
        words = np.bitwise_or.reduceat(bit, starts)
        return pa.table({
            "word": pa.array(widx[starts], pa.int64()),
            "bits": pa.array(words.view(np.int64), pa.int64()),
        })

    def or_combine(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        g = df.groupby("word", as_index=False)["bits"].agg(np.bitwise_or.reduce)
        return pa.Table.from_pandas(g, preserve_index=False)

    combined = bucketed_group_apply(
        ds.select_columns([col]).map_batches(partial, batch_format="pyarrow"),
        ["word"], or_combine, batch_format="pyarrow",
    ).to_pandas()

    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(combined):
        words[combined["word"].to_numpy()] = (
            combined["bits"].to_numpy().view(np.uint64)
        )
    return words, m_bits, k


def bloom_contains(words: np.ndarray, m_bits: int, k: int,
                   keys: np.ndarray) -> np.ndarray:
    """Vectorized membership test (no false negatives)."""
    if keys.size == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(keys, m_bits, k)
    hit = np.ones(keys.shape[0], dtype=bool)
    for i in range(k):
        widx = (pos[i] >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos[i] & np.uint64(63))
        hit &= (words[widx] & bit) != 0
    return hit


def bloom_semi_join(big, small, on: str, right_on: str,
                    bits_per_key: int = 10, k: int = 7,
                    num_partitions: int = 8):
    """Exact ``big ⋉ small`` (big's columns, inner multiplicity of the
    distinct small keys): Bloom-prefilter big map-side, then verify with a
    distributed ``Dataset.join`` against the distinct small keys. Small
    side must have unique ``right_on`` values for pure semi-join
    semantics (dedupe upstream otherwise)."""
    import ray

    n_small = small.count()
    if n_small == 0:
        # join with an all-empty (schema-less) side raises in Arrow; the
        # exact semi-join against an empty key set is just "nothing"
        return big.limit(0)
    words, m_bits, kk = build_bloom(small, right_on, n_expected=n_small,
                                    bits_per_key=bits_per_key, k=k)
    bloom_ref = ray.put(words)

    def prefilter(b: pa.Table) -> pa.Table:
        w = ray.get(bloom_ref)
        keys = b[on].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(bloom_contains(w, m_bits, kk, keys)))

    survivors = big.map_batches(prefilter, batch_format="pyarrow")
    return survivors.join(
        small.select_columns([right_on]), join_type="inner",
        num_partitions=num_partitions, on=(on,), right_on=(right_on,),
    ).select_columns(big.schema().names)
