"""Flagship end-to-end pipeline: interleaved documents → mention linking →
seed selection → semantically-informed graph search → SEM event-KG.

Ray-Data execution shape (north-star architecture):

1. ``read_parquet(documents)`` → ``map_batches(interleave)`` — derive the
   interleaved span corpus (columns pruned at the read).
2. ``map_batches(MentionLinker, concurrency=(pool), batch_format="pyarrow")``
   — actor-pool entity linking; spans pass through byte-identical.
3. ``map_batches(mentions_to_edges)`` → per-batch partial counts →
   ``groupby('entity').sum`` — pre-aggregated mention scoring (the partial
   combine keeps the shuffle small; SURVEY §7.4).
4. Driver: pick the seed event (top-scored event entity), run the frontier
   loop (stage 1) against the role-partitioned ON-DISK store (partition-
   pruned point lookups; the lazy ``expand_dataset`` semi-join above the
   frontier-size threshold) — the KG never sits on the driver.
5. Stage 2: event-KG population; canonical dedup + sort (driver kernels for
   small subgraphs, the streaming Dataset pipeline above
   ``STAGE2_DATASET_THRESHOLD`` edges).

Steps 1-3 stream; 4-5 operate on the search state. The function never
calls ``ray.init`` (driver contract).
"""
from __future__ import annotations

from typing import Optional

import pyarrow as pa

from ..build_ng.event_kg import build_event_kg
from ..data.fixtures import synth_configs
from ..data.interleave import interleaved_dataset
from ..data.synth import SEED_EVENT, entity_label_map, synth_kg
from ..search.frontier import GraphSearch
from ..sources.triple_store import ParquetTripleStore
from ..stages.linker import MentionLinker, mentions_to_edges


# subgraph edge count above which stage 2 switches from the driver kernels
# to the streaming Dataset pipeline (same kernels, distributed dedup+sort)
STAGE2_DATASET_THRESHOLD = 50_000


def _adaptive_concurrency(requested):
    """Cap the actor pool below the session CPU count: a pool equal to it
    starves its own upstream read/derive tasks (observed stall)."""
    if requested is not None:
        return requested
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:  # noqa: BLE001 — conservative default
        cpus = 4
    return max(1, min(4, cpus - 1))


def link_documents(
    sf_dir: str,
    concurrency=None,
    batch_size: int = 256,
    linker_cls: type = MentionLinker,
    linker_kwargs: Optional[dict] = None,
):
    """Steps 1-2: lazy Dataset of linked interleaved documents.

    ``linker_cls`` is the model integration point: any callable class with
    the ``__init__(**kwargs)`` / ``__call__(pa.Table) -> pa.Table`` contract
    (spans pass through byte-identical, a ``mentions`` list column is
    appended) drops in without touching this pipeline — conformance is
    proven with a differently-shaped second fake in
    ``tests/test_adapter_conformance.py``."""
    import ray

    concurrency = _adaptive_concurrency(concurrency)

    docs = interleaved_dataset(sf_dir)
    if linker_kwargs is None:
        linker_kwargs = {"label_map": ray.put(entity_label_map())}
    return docs.map_batches(
        linker_cls,
        fn_constructor_kwargs=linker_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def entity_mention_counts(linked, top_k: Optional[int] = None) -> pa.Table:
    """Step 3: per-batch partial counts (map-side combine), then a
    DISTRIBUTED ``groupby('entity').sum`` — the shuffle is tiny precisely
    because the partials are pre-combined (≤|entities| rows per batch), and
    no driver-side dict grows with the entity vocabulary (SURVEY §7.4).
    ``top_k`` bounds what reaches the driver: with it set, only the k
    highest-count entities are collected (sort + limit run in the cluster);
    ``None`` collects the full count table (small-scale / oracle use)."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        edges = mentions_to_edges(batch)
        if edges.num_rows == 0:
            return pa.table({"entity": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        agg = edges.group_by("entity").aggregate([("doc_id", "count")])
        return agg.rename_columns(["entity", "n"])

    partials = linked.map_batches(partial_counts, batch_format="pyarrow")
    grouped = partials.groupby("entity").sum("n").map_batches(
        lambda b: pa.table({"entity": b["entity"], "n": b["sum(n)"]}),
        batch_format="pyarrow",
    )
    if top_k is not None:
        grouped = grouped.sort(key=["n", "entity"], descending=[True, False]).limit(
            top_k
        )
    batches = list(grouped.iter_batches(batch_format="pyarrow"))
    t = (
        pa.concat_tables([pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b for b in batches])
        if batches
        else pa.table({"entity": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    )
    return t.sort_by([("n", "descending"), ("entity", "ascending")])


def _ensure_store(triples: pa.Table, tag: str = "flagship") -> ParquetTripleStore:
    """Build-once cached role-partitioned store for the flagship KG.

    The flagship's search MUST run against the on-disk
    ``ParquetTripleStore`` (partition-pruned ``expand_dataset`` path) — at
    100 TB the KG never fits on the driver, so an in-memory store in the
    headline pipeline would hide the scale path. The store is written once
    per KG content (crc-keyed cache under /tmp), staged in a
    ``mkdtemp``-unique dir and atomically promoted; a losing racer reads
    the winner's store."""
    import os
    import shutil
    import tempfile
    import zlib

    fp = zlib.crc32(
        "\n".join(sorted(set(triples["subject"].to_pylist()))).encode("utf-8")
    )
    parent = "/tmp/chronographer_cache"
    root = os.path.join(parent, f"{tag}_store_{triples.num_rows}_{fp:08x}")
    if os.path.exists(os.path.join(root, "_manifest.json")):
        return ParquetTripleStore(root)
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=os.path.basename(root) + ".tmp.", dir=parent)
    ParquetTripleStore.write(triples, tmp, partitions=8)
    try:
        os.replace(tmp, root)
    except OSError:  # concurrent writer promoted first
        shutil.rmtree(tmp, ignore_errors=True)
    return ParquetTripleStore(root)


def run_flagship(
    sf_dir: str,
    iterations: int = 8,
    concurrency=None,
    checkpoint_dir: Optional[str] = None,
    text_branch: bool = False,
    store_root: Optional[str] = None,
) -> dict:
    """Full pipeline; returns datasets/tables for each artifact.

    ``text_branch=True`` adds the frame-semantics branch (SURVEY §7.2 item
    6): the linked documents' text + mentions feed the T2 frame-detector
    actor pool, yielding a lazy ``frame_kg`` triples Dataset alongside the
    SEM event KG.

    The search runs against the role-partitioned on-disk
    ``ParquetTripleStore`` (built once per KG content and cached, or a
    caller-supplied ``store_root``) so the partition-pruned
    ``expand_dataset`` scale path is what the flagship exercises
    end-to-end."""
    concurrency = _adaptive_concurrency(concurrency)
    linked = link_documents(sf_dir, concurrency=concurrency)
    counts = entity_mention_counts(linked)

    triples, side = synth_kg()
    dataset_cfg, search_cfg = synth_configs(side, iterations=iterations)
    # seed = the most-mentioned entity that is a known event, else the synth seed
    event_iris = {side["seed_event"], *(e for e in side["gold_events"])}
    seed = SEED_EVENT
    for entity in counts["entity"].to_pylist():
        if entity in event_iris:
            seed = entity
            break
    search_cfg.start = seed

    store = (
        ParquetTripleStore(store_root) if store_root else _ensure_store(triples)
    )
    gs = GraphSearch(
        store=store,
        dataset=dataset_cfg,
        config=search_cfg,
        domain_map=side["domain"],
        range_map=side["range"],
        superclasses=side["superclasses"],
        gold_events=side["gold_events"],
        referents=side["referents"],
        checkpoint_dir=checkpoint_dir,
    )
    subgraph = gs.run()
    # stage 2: driver kernels for small subgraphs (task-launch overhead
    # dominates below ~50k edges), the streaming Dataset pipeline above —
    # same kernels, J6 via the store's pruned expand_dataset, distributed
    # dedup+sort (see build_event_kg_dataset; differential-tested equal)
    if subgraph.num_rows >= STAGE2_DATASET_THRESHOLD:
        from ..build_ng.event_kg import build_event_kg_dataset

        event_kg = build_event_kg_dataset(
            subgraph, store, side["domain"], side["range"],
            side["superclasses"], side["dates"][0], side["dates"][1],
            concurrency=max(2, concurrency // 2),
        )
    else:
        event_kg = build_event_kg(
            subgraph,
            store,
            side["domain"],
            side["range"],
            side["superclasses"],
            side["dates"][0],
            side["dates"][1],
        )
    out = {
        "linked": linked,
        "mention_counts": counts,
        "subgraph": subgraph,
        "event_kg": event_kg,
        "search": gs,
    }
    if text_branch:
        from ..build_ng.text_kg import frame_kg_dataset

        def with_text(b: pa.Table) -> pa.Table:
            texts = []
            for spans in b["spans"].to_pylist():
                texts.append(
                    " ".join(s["text"] for s in (spans or []) if s["kind"] == "text")
                )
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "text": pa.array(texts, pa.string()),
                    "mentions": b["mentions"],
                }
            )

        docs_text = linked.map_batches(with_text, batch_format="pyarrow")
        # chained actor pools must JOINTLY fit the CPU budget: linker pool
        # (``concurrency``) + frame pool run in one streaming pipeline, and
        # a pool that cannot schedule its minimum actors stalls the stream —
        # keep the downstream pool small
        out["frame_kg"] = frame_kg_dataset(
            docs_text, concurrency=max(1, min(2, concurrency))
        )
    return out
