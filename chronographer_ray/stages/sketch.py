"""Mergeable cardinality sketches: HyperLogLog distinct counting.

Why a sketch at 100 TB: COUNT(DISTINCT key) done exactly is an all-to-all
shuffle of every distinct key (the `unique` path). An HLL register array
is a CONSTANT-size (2^p bytes) mergeable summary: each block folds its
rows into its own registers (pure numpy, map-side), registers combine by
element-wise max, and only 2^p tiny rows ever cross the network — the
classic sketch trade (Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm", AofA 2007; standard error
≈ 1.04/√m).

Distributed shape: map_batches → per-block register table (register,
rho) → one int-bucket exchange max-combining 2^p rows → driver folds the
FIXED-SIZE register vector into the estimate. The driver step is O(2^p),
independent of data size — bounded state, not a driver-side collect.

The exact companion (`distinct_count_dataset`) is the oracle-checkable
variant: two-stage distinct (map-side dedup, then int-bucket exchange) —
use it when the key space fits a shuffle; the sketch when it doesn't.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sampling import splitmix64


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (binary search, 6 passes —
    float log2 rounds wrong near powers of two)."""
    bl = np.zeros(w.shape, dtype=np.int64)
    t = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = (t >> np.uint64(shift)) > 0
        bl[mask] += shift
        t[mask] >>= np.uint64(shift)
    bl[w > 0] += 1
    return bl


def _registers_for_batch(keys: np.ndarray, p: int) -> np.ndarray:
    """Dense 2^p register array (max rho per register) for one batch."""
    m = 1 << p
    h = splitmix64(keys.astype(np.int64))
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h << np.uint64(p)) >> np.uint64(p)  # low 64-p bits
    # rho = leading-zero count of w within (64-p) bits, + 1
    rho = (64 - p) - _bit_length_u64(w) + 1
    regs = np.zeros(m, dtype=np.int64)
    np.maximum.at(regs, reg, rho)
    return regs


def _estimate(regs: np.ndarray, p: int) -> float:
    """Standard HLL estimator with small-range (linear counting) and
    large-range corrections."""
    m = float(1 << p)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)  # linear counting
    two64 = 2.0**64
    if e > two64 / 30.0:
        return -two64 * np.log(1.0 - e / two64)
    return float(e)


def hll_distinct_dataset(ds, col: str, p: int = 14):
    """Approximate COUNT(DISTINCT col) → one-row Dataset
    ``(n_distinct_est,)`` (int64 rounded estimate; σ ≈ 1.04/√2^p ≈ 0.8%
    at the default p=14, 16 KiB of state).
    """
    import ray.data as rd

    from ..functions.shuffles import bucketed_group_apply

    def block_regs(b: pa.Table) -> pa.Table:
        keys = b[col].to_numpy(zero_copy_only=False)
        if keys.size == 0:
            return pa.table(
                {"register": pa.array([], pa.int64()),
                 "rho": pa.array([], pa.int64())}
            )
        regs = _registers_for_batch(keys, p)
        nz = np.nonzero(regs)[0]
        return pa.table({"register": pa.array(nz), "rho": pa.array(regs[nz])})

    def max_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("register").aggregate([("rho", "max")])
        return g.rename_columns(["register", "rho"])

    combined = bucketed_group_apply(
        ds.map_batches(block_regs, batch_format="pyarrow"),
        ["register"], max_combine, batch_format="pyarrow",
    ).to_pandas()  # ≤ 2^p rows by construction — bounded, not data-sized

    regs = np.zeros(1 << p, dtype=np.int64)
    if len(combined):
        regs[combined["register"].to_numpy()] = combined["rho"].to_numpy()
    est = int(round(_estimate(regs, p)))
    return rd.from_arrow(
        pa.table({"n_distinct_est": pa.array([est], pa.int64())})
    )


def distinct_count_dataset(ds, col: str):
    """Exact COUNT(DISTINCT col) → one-row Dataset ``(n_distinct,)``.

    Two-stage: per-block dedup (a hot key collapses before the exchange),
    then int-bucket distinct + per-bucket counts summed. The oracle-
    checkable companion of the HLL sketch.
    """
    import ray.data as rd

    from .dedup import dedup_dataset

    n = dedup_dataset(ds.select_columns([col]), [col]).count()
    return rd.from_arrow(pa.table({"n_distinct": pa.array([n], pa.int64())}))


def hll_registers_dataset(ds, col: str, p: int = 8):
    """The HLL register table itself → (register, rho) for ALL 2^p
    registers (rho 0 where no key landed). Same kernel as
    ``hll_distinct_dataset`` — this surface exists so the PRODUCTION
    sketch path is bit-exact oracle-verifiable: splitmix64 is exactly
    expressible in SQL (32-bit-split HUGEINT multiplies) and the
    leading-zero count is ``length(ltrim(bin(w), '0'))`` on the masked
    low 64-p bits, so every register value is reproduced bit-for-bit."""
    import ray.data as rd

    from ..functions.shuffles import bucketed_group_apply

    def block_regs(b: pa.Table) -> pa.Table:
        keys = b[col].to_numpy(zero_copy_only=False)
        if keys.size == 0:
            return pa.table(
                {"register": pa.array([], pa.int64()),
                 "rho": pa.array([], pa.int64())}
            )
        regs = _registers_for_batch(keys, p)
        nz = np.nonzero(regs)[0]
        return pa.table({"register": pa.array(nz), "rho": pa.array(regs[nz])})

    def max_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("register").aggregate([("rho", "max")])
        return g.rename_columns(["register", "rho"])

    combined = bucketed_group_apply(
        ds.map_batches(block_regs, batch_format="pyarrow"),
        ["register"], max_combine, batch_format="pyarrow",
    ).to_pandas()  # ≤ 2^p rows by construction

    regs = np.zeros(1 << p, dtype=np.int64)
    if len(combined):
        regs[combined["register"].to_numpy()] = combined["rho"].to_numpy()
    return rd.from_arrow(pa.table({
        "register": pa.array(np.arange(1 << p, dtype=np.int64)),
        "rho": pa.array(regs),
    }))
