"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side over an sf dir and compare row-count,
schema (column names) and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""
from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(mine)} (rows-only, no oracle) [{elapsed:.1f}s]")
            continue
        try:
            gold = canon(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if list(mine.columns) != list(gold.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(gold.columns)}")
            failures.append(name)
            continue
        if len(mine) != len(gold):
            print(f"FAIL {name}: rows {len(mine)} vs {len(gold)}")
            failures.append(name)
            continue
        eq = True
        for c in mine.columns:
            a, b = mine[c], gold[c].astype(mine[c].dtype, errors="ignore") if hasattr(gold[c], "astype") else gold[c]
            try:
                b = gold[c].astype(mine[c].dtype)
            except (TypeError, ValueError):
                b = gold[c]
            if not a.equals(b):
                import numpy as np

                if a.dtype.kind == "f":
                    if not np.allclose(a.to_numpy(), gold[c].to_numpy(dtype=float), rtol=0, atol=1e-12, equal_nan=True):
                        eq = False
                        print(f"FAIL {name}: column {c} differs (float, >1e-12)")
                        break
                else:
                    eq = False
                    diff = (a != b)
                    print(f"FAIL {name}: column {c} differs in {int(diff.sum())} rows; "
                          f"example mine={a[diff].iloc[0]!r} gold={gold[c][diff].iloc[0]!r}")
                    break
        if eq:
            print(f"ok   {name}: rows={len(mine)} match [{elapsed:.1f}s]")
        else:
            failures.append(name)

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
