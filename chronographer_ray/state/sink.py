"""Partitioned triple sink with per-partition lineage manifests (S9/D7).

Layout (resumable output — SURVEY §7.1):

    {root}/part=<i>/data.parquet    i = crc32(subject) % P  (hub-salt note:
                                    subjects are hashed, so a hub entity's
                                    triples land in ONE partition but dedup
                                    happened upstream two-stage)
    {root}/part=<i>/manifest.json   {rows, fingerprint}
    {root}/_manifest.json           {partitions, total_rows, meta, complete}

Writes are atomic per partition (temp file + rename); a rerun skips
partitions whose manifest already exists — that is what checkpoint-resume
means for the materialize step.
"""
from __future__ import annotations

import json
import os
import zlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sources.triple_store import crc_bucket


def write_partitioned_triples(
    table: pa.Table, root: str, partitions: int = 16, meta: dict | None = None
) -> dict:
    os.makedirs(root, exist_ok=True)
    buckets = pa.array(
        [crc_bucket(s, partitions) for s in table["subject"].to_pylist()], pa.int32()
    )
    tagged = table.append_column("_part", buckets)
    written = 0
    for i in range(partitions):
        pdir = os.path.join(root, f"part={i}")
        mpath = os.path.join(pdir, "manifest.json")
        if os.path.exists(mpath):
            continue  # resumable: partition already complete
        part = tagged.filter(pc.equal(tagged["_part"], i)).drop(["_part"])
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        pq.write_table(part, tmp)
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        fingerprint = f"{zlib.crc32(part.to_pandas().to_csv(index=False).encode()):08x}"
        with open(mpath, "w", encoding="utf-8") as f:
            json.dump({"rows": part.num_rows, "fingerprint": fingerprint}, f)
        written += 1
    manifest = {
        "partitions": partitions,
        "total_rows": table.num_rows,
        "meta": meta or {},
        "complete": True,
    }
    with open(os.path.join(root, "_manifest.json"), "w", encoding="utf-8") as f:
        json.dump(manifest, f)
    return manifest


def append_triples(
    table: pa.Table, root: str, partitions: int = 16, meta: dict | None = None
) -> dict:
    """S10 parity — the reference regenerates its HDT store via a
    SPARQL→ttl→rdf2hdt subprocess to add new nodes (``src/update_kb.py:28-48``);
    here new triples land as an immutable ``delta=NNNN`` snapshot in the same
    partition layout, visible to the next ``read_partitioned_triples``."""
    k = 0
    while os.path.exists(os.path.join(root, f"delta={k:04d}")):
        k += 1
    return write_partitioned_triples(
        table, os.path.join(root, f"delta={k:04d}"), partitions, meta
    )


def _partition_tables(root: str) -> list:
    parts = []
    for name in sorted(os.listdir(root)):
        p = os.path.join(root, name, "data.parquet")
        if name.startswith("part=") and os.path.exists(p):
            parts.append(pq.read_table(p))
        elif name.startswith("delta="):
            parts.extend(_partition_tables(os.path.join(root, name)))
    return parts


def read_partitioned_triples(root: str) -> pa.Table:
    parts = _partition_tables(root)
    if not parts:
        raise FileNotFoundError(f"no complete partitions under {root}")
    return pa.concat_tables(parts)
