"""Generic resumable partitioned-Parquet sink for any Dataset.

Generalizes the triple sink (`state/sink.py`, S7/S9 semantics — reference
per-iteration writers `/root/reference/src/framework.py` hop snapshots) to
arbitrary tables keyed on any column: rows hash into ``part=<i>/`` hive
dirs, each finished partition gets a ``manifest.json`` stamped from the
parquet footers, and a re-run after a mid-write failure

1. treats partitions WITH a manifest as finished — their rows are
   filtered out inside the tagging ``map_batches`` (no re-write, files
   untouched, byte-identical),
2. clears any orphan files in UNfinished partitions (a crashed
   ``write_parquet`` leaves data without a manifest — deleting the dir is
   what makes the retry idempotent instead of duplicating rows),
3. writes only the missing partitions, then stamps the root manifest.

Layout (mirrors `ParquetTripleStore.write_ray`: rows are sorted by the
int bucket before writing so each partition stays ~one file per block
range instead of n_blocks fragments):

    {root}/data/part=<i>/*.parquet
    {root}/data/part=<i>/manifest.json   {rows, files}
    {root}/_manifest.json                {n_parts, total_rows, complete}
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _buckets(col, n_parts: int) -> np.ndarray:
    """Vectorized partition ids: splitmix64 for integer keys, crc32 (paid
    once per distinct value via dictionary encoding) for strings."""
    import pyarrow.compute as pc

    from ..stages.sampling import splitmix64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        ids = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return (splitmix64(ids) % np.uint64(n_parts)).astype(np.int32)
    enc = pc.dictionary_encode(col)
    crc = np.array(
        [zlib.crc32(str(v).encode("utf-8")) for v in enc.dictionary.to_pylist()],
        dtype=np.uint64,
    )
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return (crc[idx] % np.uint64(n_parts)).astype(np.int32)


def _part_dir(root: str, i: int) -> str:
    return os.path.join(root, "data", f"part={i}")


def finished_partitions(root: str, n_parts: int) -> set[int]:
    return {
        i for i in range(n_parts)
        if os.path.exists(os.path.join(_part_dir(root, i), "manifest.json"))
    }


def write_resumable(ds, root: str, key_col: str, n_parts: int = 32) -> dict:
    """Write ``ds`` under ``root`` hash-partitioned on ``key_col``; skips
    partitions already stamped finished. Returns the root manifest."""
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    done = finished_partitions(root, n_parts)
    for i in set(range(n_parts)) - done:
        shutil.rmtree(_part_dir(root, i), ignore_errors=True)

    def tag(b: pa.Table) -> pa.Table:
        parts = _buckets(b[key_col], n_parts)
        t = b.append_column("part", pa.array(parts, pa.int32()))
        if done:
            keep = ~np.isin(parts, np.fromiter(done, dtype=np.int32))
            t = t.filter(pa.array(keep))
        return t

    pending = ds.map_batches(tag, batch_format="pyarrow")
    if len(done) < n_parts:
        pending.sort("part").write_parquet(
            os.path.join(root, "data"), partition_cols=["part"]
        )

    total = 0
    for i in range(n_parts):
        pdir = _part_dir(root, i)
        files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
        rows = sum(pq.ParquetFile(p).metadata.num_rows for p in files)
        total += rows
        mpath = os.path.join(pdir, "manifest.json")
        if i not in done:
            os.makedirs(pdir, exist_ok=True)
            with open(mpath, "w", encoding="utf-8") as f:
                json.dump(
                    {"rows": rows, "files": [os.path.basename(p) for p in files]},
                    f,
                )
    manifest = {
        "n_parts": n_parts,
        "total_rows": total,
        "complete": len(finished_partitions(root, n_parts)) == n_parts,
        "key_col": key_col,
    }
    with open(os.path.join(root, "_manifest.json"), "w", encoding="utf-8") as f:
        json.dump(manifest, f)
    return manifest


def read_resumable(root: str):
    """Read the sink back as a Dataset (projection/pruning via read_parquet)."""
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(root, "data"), file_extensions=["parquet"]
    )
