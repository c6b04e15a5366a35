"""Incremental near-dup index: stream NEW documents against an existing
corpus without re-running batch LSH over the union.

This is the ingestion-time shape of dedup: a crawler/feed adds documents
continuously, and each increment must be checked against everything seen
so far. Batch `minhash_candidates_dataset` (stages/dedup.py) recomputes
the full band table per run — O(corpus) per increment. Here the band
table IS the persistent state, sharded across actors:

- `BandIndexShard` (one of ``n_shards`` actors) holds a dict
  ``(band, band_hash) → doc_id array`` for its hash range of buckets.
  This is the textbook "shared mutable index" case where the Dataset API
  genuinely can't express the semantics (SURVEY §7.3 / task brief) — the
  state must outlive any single pipeline run and be writable from many
  tasks.
- `add_corpus` / `probe` are ordinary ``map_batches`` passes: each task
  computes its batch's band rows with the SAME flat-Arrow MinHash kernels
  as the batch path (identical signatures ⇒ identical candidates, tested
  differentially), splits them by shard, and awaits the shard calls. Rows
  move driver-free from read task to index actor.

Scale sizing: each shard holds |corpus| × bands / n_shards bucket
entries (ints). Shards scale horizontally (``n_shards`` up to cluster
size); per-bucket arrays are bounded by `bucket_cap`-style flood control
at the caller if identical-text floods are expected.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..stages.dedup import (
    minhash_bands_from_signatures,
    minhash_signatures_from_flat,
    tokenize_batch_flat,
)


def _bands_table(b: pa.Table, text_col: str, bands: int, rows: int) -> pa.Table:
    """(doc_id, band, band_hash) rows via the production crc-token kernels —
    bit-identical to the batch LSH path in ``minhash_candidates_dataset``."""
    f_ids, f_offsets, f_crc = tokenize_batch_flat(b[text_col])
    sigs = minhash_signatures_from_flat(f_ids, f_offsets, f_crc)
    return minhash_bands_from_signatures(sigs, b["doc_id"], bands, rows)


def _shard_of(band: np.ndarray, band_hash: np.ndarray, n_shards: int) -> np.ndarray:
    # mix band into the hash so one hot band can't pin a single shard
    # (uint64 domain: the golden-gamma constant exceeds int64)
    mixed = band_hash.astype(np.uint64) ^ (
        band.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    )
    return (mixed % np.uint64(n_shards)).astype(np.int64)


@ray.remote
class BandIndexShard:
    """One shard of the persistent band-bucket index."""

    def __init__(self):
        self._buckets: dict[tuple[int, int], list[int]] = {}
        self._n = 0

    def add(self, band: np.ndarray, band_hash: np.ndarray,
            doc_id: np.ndarray) -> int:
        for b, h, d in zip(band.tolist(), band_hash.tolist(), doc_id.tolist()):
            self._buckets.setdefault((b, h), []).append(d)
        self._n += len(doc_id)
        return self._n

    def probe(self, band: np.ndarray, band_hash: np.ndarray,
              doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Existing doc_ids sharing any queried bucket → (new_id, dup_id)
        pair arrays (deduped per call)."""
        pairs: set[tuple[int, int]] = set()
        for b, h, d in zip(band.tolist(), band_hash.tolist(), doc_id.tolist()):
            for other in self._buckets.get((b, h), ()):
                if other != d:
                    pairs.add((d, other))
        if not pairs:
            return (np.array([], np.int64), np.array([], np.int64))
        arr = np.array(sorted(pairs), dtype=np.int64)
        return arr[:, 0], arr[:, 1]

    def stats(self) -> dict:
        return {"rows": self._n, "buckets": len(self._buckets)}

    def save(self, path: str) -> int:
        """Persist the shard as one parquet of (band, band_hash, doc_id)
        rows — atomic tmp+rename, same discipline as the PageRank
        checkpoints. On a multi-node cluster ``path`` must be on shared
        storage (each shard actor writes from its own node)."""
        import os

        import pyarrow.parquet as pq

        if self._buckets:
            keys = np.array(list(self._buckets.keys()), dtype=np.int64)
            lens = np.fromiter(
                (len(v) for v in self._buckets.values()), dtype=np.int64,
                count=len(self._buckets),
            )
            docs = np.concatenate(
                [np.asarray(v, dtype=np.int64) for v in self._buckets.values()]
            )
            band = np.repeat(keys[:, 0], lens)
            bh = np.repeat(keys[:, 1], lens)
        else:
            band = bh = docs = np.array([], np.int64)
        t = pa.table({
            "band": pa.array(band, pa.int64()),
            "band_hash": pa.array(bh, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
        })
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return self._n

    def load(self, path: str) -> int:
        """Replace this shard's state with a `save` snapshot."""
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        self._buckets = {}
        self._n = 0
        return self.add(
            t["band"].to_numpy(zero_copy_only=False),
            t["band_hash"].to_numpy(zero_copy_only=False),
            t["doc_id"].to_numpy(zero_copy_only=False),
        )


class NearDupIndex:
    """Driver-side handle: build once, `add_corpus` any number of times,
    `probe` increments against everything added so far."""

    def __init__(self, n_shards: int = 4, bands: int = 16, rows: int = 4,
                 text_col: str = "text"):
        self.n_shards = n_shards
        self.bands = bands
        self.rows = rows
        self.text_col = text_col
        self.shards = [BandIndexShard.remote() for _ in range(n_shards)]

    def _split(self, t: pa.Table):
        band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bh = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = _shard_of(band, bh, self.n_shards)
        for s in range(self.n_shards):
            m = shard == s
            if m.any():
                yield s, band[m], bh[m], did[m]

    def add_corpus(self, ds) -> int:
        """Ingest a Dataset of (doc_id, text): band rows stream from read
        tasks straight into the shard actors (no driver materialize)."""
        shards, text_col, bands, rows = (
            self.shards, self.text_col, self.bands, self.rows,
        )
        split = self._split

        def ingest(b: pa.Table) -> pa.Table:
            t = _bands_table(b, text_col, bands, rows)
            refs = [shards[s].add.remote(bd, bh, d)
                    for s, bd, bh, d in split(t)]
            # backpressure: the task completes only once its rows are
            # durably in the index
            ray.get(refs)
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        total = 0
        for batch in ds.map_batches(
            ingest, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            total += int(pa.compute.sum(batch["n"]).as_py() or 0)
        return total

    def probe(self, ds) -> pa.Table:
        """Candidate (new_id, dup_id) pairs of a new Dataset vs the index
        (does NOT mutate — call `add_corpus` after to admit the docs)."""
        shards, text_col, bands, rows = (
            self.shards, self.text_col, self.bands, self.rows,
        )
        split = self._split

        def lookup(b: pa.Table) -> pa.Table:
            t = _bands_table(b, text_col, bands, rows)
            parts = ray.get([shards[s].probe.remote(bd, bh, d)
                             for s, bd, bh, d in split(t)])
            if parts:
                new_id = np.concatenate([p[0] for p in parts])
                dup_id = np.concatenate([p[1] for p in parts])
            else:
                new_id = dup_id = np.array([], np.int64)
            return pa.table({"new_id": pa.array(new_id),
                             "dup_id": pa.array(dup_id)})

        out = ds.map_batches(lookup, batch_format="pyarrow").to_pandas()
        if "new_id" not in out.columns:  # all-empty dataset → column-less
            return pa.table({"new_id": pa.array([], pa.int64()),
                             "dup_id": pa.array([], pa.int64())})
        # global pair dedup (a pair can surface from several bands/shards)
        out = out.drop_duplicates().sort_values(["new_id", "dup_id"])
        return pa.Table.from_pandas(out.reset_index(drop=True),
                                    preserve_index=False)

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def snapshot(self, dir_path: str) -> None:
        """Persist every shard (parallel, atomic per shard) + a manifest so
        `restore` rebuilds an identical index in a fresh cluster — the
        round-2 gap: shard state used to die with the Ray session."""
        import json
        import os

        os.makedirs(dir_path, exist_ok=True)
        ray.get([
            s.save.remote(os.path.join(dir_path, f"shard_{i}.parquet"))
            for i, s in enumerate(self.shards)
        ])
        manifest = {
            "n_shards": self.n_shards, "bands": self.bands,
            "rows": self.rows, "text_col": self.text_col,
        }
        tmp = os.path.join(dir_path, ".manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(dir_path, "manifest.json"))

    @classmethod
    def restore(cls, dir_path: str) -> "NearDupIndex":
        """Fresh actors loaded from a `snapshot` directory. Probe results
        are identical to the pre-snapshot index (tested): bucket contents
        round-trip exactly and shard routing is a pure function of the
        manifest's n_shards."""
        import json
        import os

        with open(os.path.join(dir_path, "manifest.json")) as f:
            m = json.load(f)
        idx = cls(n_shards=m["n_shards"], bands=m["bands"],
                  rows=m["rows"], text_col=m["text_col"])
        ray.get([
            s.load.remote(os.path.join(dir_path, f"shard_{i}.parquet"))
            for i, s in enumerate(idx.shards)
        ])
        return idx
