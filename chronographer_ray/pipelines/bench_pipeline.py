"""Benchmark pipeline: the flagship document path at adjustable scale.

The sf0.1 documents table is small (5k rows), so the bench replicates the
read ``repeat`` times (a union of independent parquet reads with disjoint
doc-id offsets → repeat × blocks of genuine read parallelism, no shuffle)
and drives the full interleave → link → partial-count → groupby pipeline.
Same input at every parallelism level ⇒ valid scaling comparison.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..data.interleave import interleave_batch
from ..data.synth import entity_label_map
from ..stages.linker import MentionLinker, mentions_to_edges


def _offset_ids(offset: int):
    def fn(b: pa.Table) -> pa.Table:
        ids = pc.add(b["doc_id"], offset)
        return b.set_column(b.schema.get_field_index("doc_id"), "doc_id", ids)

    return fn


def replicated_docs(sf_dir: str, repeat: int):
    import ray.data as rd

    parts = []
    for i in range(repeat):
        parts.append(
            rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            ).map_batches(_offset_ids(i * 10_000_000), batch_format="pyarrow")
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


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
        n = batch.num_rows
        edges = mentions_to_edges(batch)
        agg = edges.group_by("entity").aggregate([("doc_id", "count")])
        agg = agg.rename_columns(["entity", "n"])
        return agg.append_column("n_docs", pa.array([n] * agg.num_rows, pa.int64()))

    partials = linked.map_batches(partial_counts, batch_format="pyarrow")
    out = partials.groupby("entity").aggregate(
        Sum("n", alias_name="n"), Sum("n_docs", alias_name="n_docs_x")
    )
    df = out.to_pandas()
    n_entities = len(df)
    # n docs processed = repeat × base table rows (authoritative count)
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows * repeat
    return n_docs, n_entities
