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

        from ..stages.dedup import (
            minhash_bands_from_signatures,
            minhash_signatures_from_flat,
            simhash_values_from_flat,
            tokenize_batch_flat,
        )

        linked = self.linker(interleave_batch(batch))
        edges = mentions_to_edges(linked)
        agg = edges.group_by("entity").aggregate([("doc_id", "count")])
        agg = agg.rename_columns(["entity", "n"])

        # ONE Arrow tokenization pass feeds both signatures (flat token-id
        # arrays — the per-token Python dict loop was the allocator hot
        # spot at 32 workers; parity with the per-doc API is tested)
        ids, offsets, tok_crc, vocab = tokenize_batch_flat(
            batch["text"], return_vocab=True
        )
        sigs = minhash_signatures_from_flat(ids, offsets, tok_crc)
        bands = minhash_bands_from_signatures(sigs, batch["doc_id"])
        # distinct (band, hash) PAIRS via lexsort + adjacent-diff: exact
        # (band_hash spans 63 bits, a packed single key would overflow
        # int64) and ~10× cheaper than np.unique(axis=0)'s void-dtype sort
        bb = np.asarray(bands["band"], dtype=np.int64)
        hh = np.asarray(bands["band_hash"], dtype=np.int64)
        if bb.size:
            order = np.lexsort((bb, hh))
            b1, h1 = bb[order], hh[order]
            n_buckets = int(1 + np.count_nonzero((b1[1:] != b1[:-1]) | (h1[1:] != h1[:-1])))
        else:
            n_buckets = 0
        n_heavy = sum(
            1
            for v in simhash_values_from_flat(ids, offsets, tok_crc, vocab)
            if v.bit_count() > 32
        )
        # word total from the SHARED tokenization (ids is the masked flat
        # token stream, so its length IS sum(word_count) — value-identical
        # to text_stats_batch's column; one tokenize pass per batch is the
        # production shape for the filtering path too)
        n_words = int(ids.size)
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


# ------------------------------------------------------- stage-2 scale bench
def synth_stage2_subgraph(
    n_edges: int = 1_000_000, n_events: int = 10_000, n_preds: int = 24
):
    """Deterministic ≥10⁶-edge search neighborhood for the stage-2 bench.

    Edges are ``outgoing`` rows (entity → pred → event), so the extracted
    event set is the bounded object vocabulary (``n_events``); every edge
    flows through the RoleMapper, and 1 pred in 6 carries a temporal-trigger
    label with XSD-date literal objects to exercise the A8 path. Returns
    ``(subgraph_table, store, domain_map, range_map, labels)``.
    """
    import numpy as np

    from ..sources.triple_store import ArrowTripleStore

    RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
    preds = [f"http://x/prop/p{i}" for i in range(n_preds)]
    domain_map: dict[str, list[str]] = {}
    range_map: dict[str, list[str]] = {}
    labels: dict[str, str] = {}
    for i, p in enumerate(preds):
        if i % 6 == 4:
            labels[p] = '"start time of thing"@en'
        elif i % 6 == 5:
            labels[p] = '"end time of thing"@en'
        elif i % 3 == 0:
            range_map[p] = ["http://x/ontology/Person"]
            labels[p] = f'"relation {i}"@en'
        elif i % 3 == 1:
            range_map[p] = ["http://x/ontology/Place"]
            labels[p] = f'"relation {i}"@en'
        else:
            domain_map[p] = ["http://x/ontology/Person"]
            labels[p] = f'"relation {i}"@en'

    eidx = np.arange(n_edges)
    pred_ids = (eidx % n_preds).astype(np.int64)
    ev_ids = (eidx % n_events).astype(np.int64)
    subject = pc.binary_join_element_wise(
        "http://x/resource/r", pa.array((eidx % (n_edges // 2 + 1)).astype("U")), ""
    )
    predicate = pc.take(pa.array(preds, pa.string()), pa.array(pred_ids))
    temporal = (pred_ids % 6) >= 4
    day = (eidx % 28 + 1).astype(np.int64)
    dates = pa.array(
        [f'"1795-03-{d:02d}"^^<http://www.w3.org/2001/XMLSchema#date>' for d in day]
    )
    events_obj = pc.binary_join_element_wise(
        "http://x/resource/ev", pa.array(ev_ids.astype("U")), ""
    )
    obj = pc.if_else(pa.array(temporal), dates, events_obj)
    subgraph = pa.table(
        {
            "subject": subject,
            "predicate": predicate,
            "object": obj,
            "type_df": pa.array(np.full(n_edges, "outgoing")),
            "iteration": pa.array(np.zeros(n_edges, dtype=np.int64)),
        }
    )
    label_triples = pa.table(
        {
            "subject": pa.array(list(labels), pa.string()),
            "predicate": pa.array([RDFS_LABEL] * len(labels), pa.string()),
            "object": pa.array(list(labels.values()), pa.string()),
        }
    )
    store = ArrowTripleStore(label_triples)
    return subgraph, store, domain_map, range_map


def bench_stage2(n_edges: int = 1_000_000, concurrency: int = 8):
    """Run the streaming stage-2 event-KG build over a synthetic ≥10⁶-edge
    neighborhood; returns (n_edges, n_out_triples, seconds)."""
    import time

    from ..build_ng.event_kg import build_event_kg_dataset

    subgraph, store, domain_map, range_map = synth_stage2_subgraph(n_edges)
    t0 = time.time()
    out = build_event_kg_dataset(
        subgraph,
        store,
        domain_map,
        range_map,
        {},
        "1795-01-01",
        "1795-12-31",
        concurrency=concurrency,
    )
    return n_edges, out.num_rows, time.time() - t0
