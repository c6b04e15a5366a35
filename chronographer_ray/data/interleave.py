"""Deterministic interleaved-corpus derivation from the flat testdata
``documents`` table.

The graft's input shape is ``(doc_id: string, spans: list<struct<kind, text,
media_ref, offset>>)`` (BASELINE.json input_hint). The driver's testdata
ships a flat ``documents.parquet`` (doc_id:int64, text, lang, source,
n_chars); this module derives the interleaved corpus from it with a pure,
seedless function of the row content (crc32-keyed choices), so the corpus is
deterministic at every scale factor and regenerable inside any worker — it
runs as a ``map_batches`` stage over the parquet read, no driver
materialization.

Entity mention surface forms from the synthetic KG are injected into text
spans (crc-selected), making mention density scale-independent; docs whose
crc lands in the hub bucket mention the seed entity (skew).
"""
from __future__ import annotations

import zlib

import pyarrow as pa

from .synth import DOC_SCHEMA, entity_label_map

_CHUNK = 160  # target characters per text span


def _crc(s: str) -> int:
    return zlib.crc32(s.encode("utf-8"))


def interleave_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` kernel: flat documents → interleaved span documents.

    Builds the list<struct> column from FLAT arrays + offsets
    (``ListArray.from_arrays`` over a ``StructArray``) instead of
    per-span Python dicts: with 32 concurrent workers the dict path was
    allocator-bandwidth-bound (per-worker throughput dropped ~40% vs 8
    workers); flat build keeps the kernel C-dominated.
    """
    labels = sorted(entity_label_map())
    n_labels = len(labels)
    hub_label = "Great Revolution"
    doc_ids: list[str] = []
    # flat span columns + per-doc list offsets
    f_kind: list[str] = []
    f_text: list[str] = []
    f_ref: list[str] = []
    f_off: list[int] = []
    list_offsets: list[int] = [0]
    media_kinds = ("image", "audio", "video")
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        did = f"doc-{int(doc_id):06d}"
        h = _crc(did)
        text = text or ""
        offset = 0
        piece_idx = 0
        is_hub = h % 50 == 0
        for start in range(0, max(len(text), 1), _CHUNK):
            piece = text[start : start + _CHUNK]
            # inject a deterministic mention into every other text span
            if piece_idx % 2 == 0:
                label = hub_label if is_hub else labels[(h + piece_idx) % n_labels]
                piece = f"{piece} {label}."
            f_kind.append("text")
            f_text.append(piece)
            f_ref.append("")
            f_off.append(offset)
            offset += len(piece)
            piece_idx += 1
            # every third text span is followed by a media span
            if piece_idx % 3 == 0:
                kind = media_kinds[(h + piece_idx) % 3]
                f_kind.append(kind)
                f_text.append("")
                f_ref.append(f"mem://media/{kind}/{did}-{piece_idx:03d}")
                f_off.append(offset)
                offset += 1
        doc_ids.append(did)
        list_offsets.append(len(f_kind))
    struct = pa.StructArray.from_arrays(
        [
            pa.array(f_kind, pa.string()),
            pa.array(f_text, pa.string()),
            pa.array(f_ref, pa.string()),
            pa.array(f_off, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()), struct)
    return pa.Table.from_arrays(
        [pa.array(doc_ids, pa.string()), spans], schema=DOC_SCHEMA
    )


def interleaved_dataset(sf_dir: str):
    """Lazy Ray Dataset of the interleaved corpus for a testdata sf dir."""
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(interleave_batch, batch_format="pyarrow")


def interleaved_table(sf_dir: str) -> pa.Table:
    """Eager single-process variant (tests, oracles)."""
    import pyarrow.parquet as pq

    flat = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return interleave_batch(flat)
