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


def replicated_docs(sf_dir: str, repeat: int, num_blocks: int = 32):
    import ray.data as rd

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


def bench_flagship(sf_dir: str, repeat: int, concurrency: int, batch_size: int = 512):
    """Returns (n_docs_processed, n_distinct_entities). Consumes the full
    pipeline: interleave → actor-pool linking → mention edges → partial
    counts → groupby sum."""
    import ray
    from ray.data.aggregate import Sum

    docs = replicated_docs(sf_dir, repeat)
    docs = docs.map_batches(interleave_batch, batch_format="pyarrow")
    label_ref = ray.put(entity_label_map())
    linked = docs.map_batches(
        MentionLinker,
        fn_constructor_kwargs={"label_map": label_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

    def partial_counts(batch: pa.Table) -> pa.Table:
        edges = mentions_to_edges(batch)
        agg = edges.group_by("entity").aggregate([("doc_id", "count")])
        return agg.rename_columns(["entity", "n"])

    # combine inside map_batches; the per-batch partials are ~|entities| rows,
    # so the final merge is a driver-side sum, not a distributed shuffle
    # (SURVEY §7.4 "push aggregation partial"). At 10^12 docs the partials
    # stream in at kB/block and the dict stays |entities|-sized.
    _ = Sum  # distributed-aggregate variant kept for high-cardinality keys
    partials = linked.map_batches(partial_counts, batch_format="pyarrow")
    totals: dict[str, int] = {}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for ent, n in zip(b["entity"].to_pylist(), b["n"].to_pylist()):
            totals[ent] = totals.get(ent, 0) + n
    n_entities = len(totals)
    # n docs processed = repeat × base table rows (authoritative count)
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows * repeat
    return n_docs, n_entities
