"""Triple stores — the reference's HDT SPO/OPS indexes re-expressed for Ray.

The generic KG is a ``(subject, predicate, object)`` string table stored in
TWO role-partitioned copies (reference behavior: ``src/hdt_interface.py``
queries HDT's SPO and OPS indexes; design per SURVEY.md §7.1):

    root/by_subject/part=<i>/data.parquet   i = crc32(subject) % P
    root/by_object/part=<i>/data.parquet    i = crc32(object)  % P
    root/_manifest.json                     {partitions, rows, fingerprint}

Frontier expansion is a *partition-pruned hash semi-join*: only the
partitions that can contain a frontier id are read; within them the id set
(broadcast once via ``ray.put`` on the Ray path) filters batches with
``pc.is_in``. Point lookups never scan the full table — that's what replaces
HDT's per-pattern index at 100 TB.

``ArrowTripleStore`` keeps the same API fully in memory for tests and for
small frontier hops where task-launch overhead would dominate.
"""
from __future__ import annotations

import json
import os
import zlib
from typing import Iterable, Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..stages.filters import TRIPLE_SCHEMA

DEFAULT_PARTITIONS = 32


def crc_bucket(value: str, partitions: int) -> int:
    """Stable cross-process hash partition (Python ``hash()`` is salted)."""
    return zlib.crc32(value.encode("utf-8")) % partitions


class TripleStore:
    """Protocol: point-pattern triple retrieval by role."""

    def triples_for(self, role: str, ids: Iterable[str]) -> pa.Table:
        raise NotImplementedError

    def triples_for_subjects(self, ids: Iterable[str]) -> pa.Table:
        return self.triples_for("subject", ids)

    def triples_for_objects(self, ids: Iterable[str]) -> pa.Table:
        return self.triples_for("object", ids)


class ArrowTripleStore(TripleStore):
    """In-memory store over one Arrow table (tests / small graphs)."""

    def __init__(self, table: pa.Table):
        self.table = table.select(["subject", "predicate", "object"])

    def triples_for(self, role: str, ids: Iterable[str]) -> pa.Table:
        ids = list(ids)
        if not ids:
            return TRIPLE_SCHEMA.empty_table()
        mask = pc.is_in(self.table[role], value_set=pa.array(ids, pa.string()))
        return self.table.filter(mask)


class ParquetTripleStore(TripleStore):
    """Role-partitioned Parquet store with partition-pruned lookups.

    ``triples_for`` (driver-side, small frontier) reads only the needed
    ``part=i`` files via pyarrow with an ``is_in`` row filter;
    ``expand_dataset`` (scale path) returns a lazy ``ray.data.Dataset`` over
    the same pruned file set with the id set broadcast via ``ray.put`` and
    applied zero-copy inside ``map_batches``.
    """

    ROLE_DIR = {"subject": "by_subject", "object": "by_object"}

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, "_manifest.json"), encoding="utf-8") as f:
            self.manifest = json.load(f)
        self.partitions = int(self.manifest["partitions"])

    # -- write path ---------------------------------------------------------
    @classmethod
    def write(
        cls, table: pa.Table, root: str, partitions: int = DEFAULT_PARTITIONS
    ) -> "ParquetTripleStore":
        """Materialize both role-partitioned copies + manifest.

        Small-scale builder (single process). At 100 TB this is a one-off
        Ray job: ``ds.map_batches(add bucket col).write_parquet(
        partition_cols=['part'])`` per role — same layout, same manifest.
        """
        table = table.select(["subject", "predicate", "object"])
        for role, sub in cls.ROLE_DIR.items():
            buckets = pa.array(
                [crc_bucket(v, partitions) for v in table[role].to_pylist()],
                pa.int32(),
            )
            tagged = table.append_column("part", buckets)
            for i in range(partitions):
                part = tagged.filter(pc.equal(tagged["part"], i)).drop(["part"])
                pdir = os.path.join(root, sub, f"part={i}")
                os.makedirs(pdir, exist_ok=True)
                pq.write_table(part, os.path.join(pdir, "data.parquet"))
        manifest = {
            "partitions": partitions,
            "rows": table.num_rows,
            "fingerprint": f"{zlib.crc32(b''.join(s.encode() for s in sorted(set(table['subject'].to_pylist()))[:100])):08x}",
        }
        with open(os.path.join(root, "_manifest.json"), "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        return cls(root)

    @classmethod
    def write_ray(
        cls, source, root: str, partitions: int = DEFAULT_PARTITIONS
    ) -> "ParquetTripleStore":
        """Distributed store build — the Ray-job shape of :meth:`write`.

        ``source`` is a ``ray.data.Dataset`` of triples (or an Arrow table,
        wrapped for convenience). Per role: ``map_batches`` tags each row with
        its crc bucket (the hash runs inside the tasks, so at 100 TB the key
        hashing is cluster-wide, not driver-bound), then
        ``write_parquet(partition_cols=['part'])`` lays out the identical
        hive ``part=i/`` tree the read path prunes over — each partition just
        holds one file per block instead of a single ``data.parquet``.
        Resumable by partition: a re-run overwrites per-partition dirs.
        """
        import ray.data as rd

        ds = rd.from_arrow(source) if isinstance(source, pa.Table) else source

        for role, sub in cls.ROLE_DIR.items():

            def tag(batch: pa.Table, role=role) -> pa.Table:
                batch = batch.select(["subject", "predicate", "object"])
                buckets = pa.array(
                    [crc_bucket(v, partitions) for v in batch[role].to_pylist()],
                    pa.int32(),
                )
                return batch.append_column("part", buckets)

            # sort by the int bucket before writing: write_parquet emits one
            # file per (block × partition) pair, so unsorted blocks spray
            # ~n_blocks small files into EVERY part= dir and point lookups
            # then open n_blocks files per probe (measured 6× slower search);
            # range-sorted blocks give ~1 file per partition
            ds.map_batches(tag, batch_format="pyarrow").sort("part").write_parquet(
                os.path.join(root, sub), partition_cols=["part"]
            )
        # row count from parquet footers — no pipeline re-execution
        n_rows = sum(
            pq.ParquetFile(p).metadata.num_rows
            for i in range(partitions)
            for p in cls._part_files(root, "by_subject", i)
        )
        manifest = {"partitions": partitions, "rows": n_rows, "writer": "ray"}
        with open(os.path.join(root, "_manifest.json"), "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        return cls(root)

    # -- read path ----------------------------------------------------------
    @staticmethod
    def _part_files(root: str, sub: str, i: int) -> list[str]:
        """All parquet files of one partition — the single-process writer
        emits one ``data.parquet``, the Ray writer one file per block."""
        import glob

        return sorted(glob.glob(os.path.join(root, sub, f"part={i}", "*.parquet")))

    def _paths_for(self, role: str, ids: list[str]) -> list[str]:
        parts = sorted({crc_bucket(v, self.partitions) for v in ids})
        sub = self.ROLE_DIR[role]
        paths = []
        for i in parts:
            paths.extend(self._part_files(self.root, sub, i))
        return paths

    def triples_for(self, role: str, ids: Iterable[str]) -> pa.Table:
        ids = list(ids)
        if not ids:
            return TRIPLE_SCHEMA.empty_table()
        paths = self._paths_for(role, ids)
        if not paths:
            return TRIPLE_SCHEMA.empty_table()
        dataset = pads.dataset(paths, format="parquet")
        return dataset.to_table(filter=pads.field(role).isin(ids))

    def expand_dataset(
        self, role: str, ids: list[str], pred_filter: Optional[list[str]] = None
    ):
        """Scale path: lazy Ray Dataset semi-join over pruned partitions.

        The id set ships to the object store ONCE (``ray.put``) and every
        read task filters its Arrow batches against it — no per-batch
        re-serialization of the frontier, no all-to-all shuffle.
        """
        import ray
        import ray.data as rd

        paths = self._paths_for(role, ids)
        if not paths:
            return rd.from_arrow(TRIPLE_SCHEMA.empty_table())
        ids_ref = ray.put(pa.array(sorted(set(ids)), pa.string()))
        preds = list(pred_filter) if pred_filter else None

        def semi_join(batch: pa.Table) -> pa.Table:
            value_set = ray.get(ids_ref)
            out = batch.filter(pc.is_in(batch[role], value_set=value_set))
            # drop the hive-partition column the parquet read re-derives
            out = out.select(["subject", "predicate", "object"])
            if preds:
                out = out.filter(
                    pc.invert(
                        pc.is_in(out["predicate"], value_set=pa.array(preds, pa.string()))
                    )
                )
            return out

        return rd.read_parquet(paths).map_batches(semi_join, batch_format="pyarrow")


class ActorTripleStore(TripleStore):
    """T4 — per-partition lookup ACTORS holding hash indexes.

    The reference keeps a pool of open ``HDTDocument`` handles per process
    (``src/hdt_interface.py:47-58``); here each Ray actor owns a slice of a
    role-partitioned store, loads it ONCE in ``__init__`` and builds a
    value→rows hash index, so frontier point lookups are index probes with
    no per-hop file I/O. ``triples_for`` prunes to the actors whose
    partitions can contain the ids (same crc routing as the on-disk store)
    and fans the id set out concurrently.
    """

    def __init__(self, root: str, actors_per_role: int = 4):
        import ray

        disk = ParquetTripleStore(root)
        self.partitions = disk.partitions
        self.actors_per_role = actors_per_role
        self._actors: dict[str, list] = {}
        self._actor_parts: dict[str, list[list[int]]] = {}

        @ray.remote
        class PartitionLookup:
            def __init__(self, paths: list[str], role: str):
                import collections

                import pyarrow.parquet as _pq

                tables = [_pq.read_table(p) for p in paths]
                self.table = (
                    pa.concat_tables(tables) if tables else TRIPLE_SCHEMA.empty_table()
                )
                index = collections.defaultdict(list)
                for i, v in enumerate(self.table[role].to_pylist()):
                    index[v].append(i)
                self.index = dict(index)

            def lookup(self, ids: list[str]):
                rows = [i for v in ids for i in self.index.get(v, [])]
                if not rows:
                    return TRIPLE_SCHEMA.empty_table()
                return self.table.take(pa.array(sorted(rows), pa.int64()))

        for role, sub in ParquetTripleStore.ROLE_DIR.items():
            groups: list[list[int]] = [[] for _ in range(actors_per_role)]
            for i in range(self.partitions):
                groups[i % actors_per_role].append(i)
            actors, parts = [], []
            for group in groups:
                paths = [
                    p
                    for i in group
                    for p in ParquetTripleStore._part_files(root, sub, i)
                ]
                actors.append(PartitionLookup.remote(paths, role))
                parts.append(group)
            self._actors[role] = actors
            self._actor_parts[role] = parts

    def triples_for(self, role: str, ids: Iterable[str]) -> pa.Table:
        import ray

        ids = list(ids)
        if not ids:
            return TRIPLE_SCHEMA.empty_table()
        needed = {crc_bucket(v, self.partitions) for v in ids}
        futures = []
        for actor, parts in zip(self._actors[role], self._actor_parts[role]):
            if needed & set(parts):  # partition pruning at the actor level
                futures.append(actor.lookup.remote(ids))
        tables = [t for t in ray.get(futures) if t.num_rows]
        if not tables:
            return TRIPLE_SCHEMA.empty_table()
        return pa.concat_tables(tables)
