"""Benchmark pipeline: the flagship document path at adjustable scale.

The sf0.1 documents table is small (5k rows), so the bench replicates it
``repeat`` times INSIDE a map_batches kernel (disjoint doc-id offsets per
copy): one parquet read, no unions, and output blocks that are repeat×
larger than the read blocks — at 100 TB the replication disappears and the
same pipeline runs over the real shards. A 20-way ``union`` of per-replica
reads was measured 20× slower: it fragments the stream into ~1300 sub-100-row
blocks and per-task overhead dominates.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..data.interleave import interleave_batch
from ..data.synth import entity_label_map
from ..stages.linker import MentionLinker, mentions_to_edges


def replicated_docs(sf_dir: str, repeat: int, num_blocks: int | None = None):
    """One read; each read block is replicated ``repeat``× in-kernel. Block
    count scales with ``repeat`` so one post-replication task holds ~10-20k
    docs — the fused downstream stage parallelizes across ALL cores instead
    of being bundled back into a handful of giant tasks."""
    import ray.data as rd

    if num_blocks is None:
        # ~100 blocks at the scaling repeat: enough tasks for 32 cores with
        # headroom for stragglers, few enough that the (single-threaded)
        # streaming-executor scheduling loop stays off the critical path
        # (256+ blocks measured ~6 s of pure driver overhead)
        num_blocks = min(128, max(32, repeat // 6))
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=num_blocks,
    )

    def replicate(b: pa.Table) -> pa.Table:
        idx = b.schema.get_field_index("doc_id")
        parts = [
            b.set_column(idx, "doc_id", pc.add(b["doc_id"], i * 10_000_000))
            for i in range(repeat)
        ]
        return pa.concat_tables(parts)

    return ds.map_batches(replicate, batch_format="pyarrow")


class LinkAndCount:
    """Fused stage for the headline bench — the representative per-document
    KG-construction load, one call per block:

      interleave → mention-link → entity counts   (the flagship path)
      + MinHash-LSH band hashes                    (dedup path)
      + SimHash fingerprint                        (near-dup path)
      + quality stats                              (filtering path)

    Everything reduces to an additive ``(entity, n)`` partial per batch
    (corpus-level metrics use reserved ``__*__`` keys), so the driver-side
    merge stays a dict sum and no distributed shuffle is needed."""

    def __init__(self, label_map):
        self.linker = MentionLinker(label_map)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        from ..stages.dedup import minhash_bands_batch, simhash_values, tokenize_batch
        from ..stages.text import text_stats_batch

        linked = self.linker(interleave_batch(batch))
        edges = mentions_to_edges(linked)
        agg = edges.group_by("entity").aggregate([("doc_id", "count")])
        agg = agg.rename_columns(["entity", "n"])

        texts = batch["text"].to_pylist()
        tokenized = tokenize_batch(texts)  # one pass feeds both signatures
        bands = minhash_bands_batch(batch, tokenized=tokenized)
        n_buckets = len(
            np.unique(
                np.asarray(bands["band"], dtype=np.int64) * (1 << 32)
                + np.asarray(bands["band_hash"], dtype=np.int64)
            )
        )
        n_heavy = sum(1 for v in simhash_values(texts, tokenized) if v.bit_count() > 32)
        stats = text_stats_batch(batch)
        n_words = pc.sum(stats["word_count"]).as_py() or 0
        extra = pa.table(
            {
                "entity": pa.array(
                    ["__lsh_buckets__", "__simhash_heavy__", "__words__"], pa.string()
                ),
                "n": pa.array([n_buckets, n_heavy, n_words], pa.int64()),
            }
        )
        return pa.concat_tables([agg.cast(extra.schema), extra])


# per-worker-process cache for the task-based stage: the linker's setup here
# is cheap (31-entry dict + one regex compile), so a task pool on Ray's warm
# default workers beats an actor pool, whose ~5 s spawn/import ramp was the
# dominant fixed cost of the measured run. An actor pool (LinkAndCount class
# above) is the right shape only when setup is expensive (models, indexes).
_LINKER_BY_REF: dict = {}


def link_and_count_task(batch: pa.Table, label_ref) -> pa.Table:
    key = label_ref.hex() if hasattr(label_ref, "hex") else id(label_ref)
    stage = _LINKER_BY_REF.get(key)
    if stage is None:
        stage = _LINKER_BY_REF[key] = LinkAndCount(label_ref)
    return stage(batch)


def bench_flagship(sf_dir: str, repeat: int, concurrency: int, batch_size=None,
                   num_blocks: int | None = None):
    """Returns (n_docs_processed, n_distinct_entities). Consumes the full
    pipeline: replicate → (fused actor pool) interleave → link → partial
    count → driver-side merge of the tiny per-batch partials.

    No ``batch_size`` on the actor stage: after operator fusion a batch size
    re-bundles the PRE-replication rows (512 rows ≈ 300k replicated docs per
    task — measured 4× under-parallelization); per-block batches keep one
    task ≈ one read block × repeat. The final merge is a driver dict — each
    partial is ≤|entities| rows, so a distributed groupby here moves
    kilobytes through a multi-second shuffle (SURVEY §7.4 partial-combine).
    """
    import ray

    _ = concurrency  # task pool sizes itself to the cluster; kept for API compat
    label_ref = ray.put(entity_label_map())
    partials = replicated_docs(sf_dir, repeat, num_blocks=num_blocks).map_batches(
        link_and_count_task,
        fn_kwargs={"label_ref": label_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
    )
    totals: dict[str, int] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for ent, n in zip(b["entity"].to_pylist(), b["n"].to_pylist()):
            totals[ent] = totals.get(ent, 0) + n
    n_entities = len(totals)
    # n docs processed = repeat × base table rows (authoritative count)
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows * repeat
    return n_docs, n_entities
