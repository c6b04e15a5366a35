"""Benchmark decontamination: flag training documents that share word
n-grams with a (small) benchmark / eval set.

This is the standard LLM-training-data hygiene pass (GPT-3 appendix C /
Dolma-style n-gram overlap decontamination): the benchmark side is tiny by
construction (eval suites are MBs; the training corpus is the 100 TB side),
so the scale-correct shape is a BROADCAST of the benchmark's distinct
shingle-hash set — built once with one pass over the benchmark docs,
``ray.put`` once — and a pure ``map_batches`` scan over the training
corpus (no shuffle at all): per batch, one shared tokenization pass
(`tokenize_batch`), rolling-hash shingles per doc
(`_shingle_hashes_fast`), and a vectorized sorted-array membership probe
(``np.searchsorted``) against the broadcast hashes.

Hashes are the same 64-bit rolling mix the MinHash path uses; a collision
would need two distinct n-grams with equal 64-bit hashes inside the
benchmark set — negligible at eval-suite scale (for extra margin at very
large benchmark sets, raise to a 128-bit double-probe; the oracle compares
exact string shingles and agrees at test scale).

No reference-file counterpart: the reference (muhai-project/chronographer)
has no corpus-hygiene stage; this extends the engine per the LLM-pipeline
charter (SURVEY §2.9).
"""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray

from .dedup import _shingle_hashes_fast, tokenize_batch


def _batch_doc_hashes(texts: list, n: int, min_tokens: int):
    """Per-doc DISTINCT shingle-hash arrays for docs with >= min_tokens
    tokens; yields (row_index, unique_hash_array)."""
    vocab, doc_tok = tokenize_batch(texts)
    tok_crc = (
        np.array([zlib.crc32(t.encode("utf-8")) for t in vocab], dtype=np.uint64)
        if vocab
        else np.array([], np.uint64)
    )
    for i, ids in enumerate(doc_tok):
        if len(ids) < min_tokens:
            continue
        sh = _shingle_hashes_fast(np.asarray(ids, dtype=np.int64), tok_crc, n)
        if sh.size:
            yield i, np.unique(sh)


def collect_benchmark_hashes(bench_ds, text_col: str = "text", n: int = 3,
                             min_tokens: int = 3) -> np.ndarray:
    """One pass over the benchmark docs -> sorted distinct uint64 shingle
    hashes. Per-batch partials are pre-uniqued so only distinct hashes
    travel to the driver; the result is bounded by the benchmark's shingle
    vocabulary (small by definition), which is what makes the driver-side
    union + broadcast legitimate here."""

    def part(batch: pa.Table) -> pa.Table:
        hs = [h for _, h in _batch_doc_hashes(batch[text_col].to_pylist(), n, min_tokens)]
        u = np.unique(np.concatenate(hs)) if hs else np.array([], np.uint64)
        return pa.table({"h": pa.array(u, pa.uint64())})

    parts = bench_ds.map_batches(part, batch_format="pyarrow").take_all()
    if not parts:
        return np.array([], np.uint64)
    return np.unique(np.array([r["h"] for r in parts], dtype=np.uint64))


def decontam_overlap_dataset(train_ds, bench_hashes_ref, text_col: str = "text",
                             n: int = 3, min_tokens: int = 3):
    """(doc_id, n_overlap) for every training doc sharing >= 1 distinct
    n-gram with the broadcast benchmark set. Map-only: the benchmark hash
    array is fetched from the object store once per task (zero-copy numpy
    view), each doc costs one tokenize + one searchsorted probe."""

    def flag(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_hashes_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_ids: list[int] = []
        out_n: list[int] = []
        for i, sh in _batch_doc_hashes(batch[text_col].to_pylist(), n, min_tokens):
            if bench.size == 0:
                continue
            pos = np.searchsorted(bench, sh)
            valid = pos < bench.size
            hits = int((bench[pos[valid]] == sh[valid]).sum())
            if hits:
                out_ids.append(int(ids[i]))
                out_n.append(hits)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_overlap": pa.array(out_n, pa.int64()),
            }
        )

    return train_ds.map_batches(flag, batch_format="pyarrow")


def decontam_report(docs_ds, bench_mod: int = 10, bench_rem: int = 7,
                    text_col: str = "text", n: int = 3, min_tokens: int = 3):
    """End-to-end decontamination over one documents table: rows with
    ``doc_id % bench_mod == bench_rem`` act as the benchmark set, the rest
    as the training corpus; returns (doc_id, n_overlap) for contaminated
    training docs."""
    def _rem(b: pa.Table) -> np.ndarray:
        return b["doc_id"].to_numpy(zero_copy_only=False) % bench_mod

    def is_bench(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(_rem(b) == bench_rem))

    def is_train(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(_rem(b) != bench_rem))

    bench = docs_ds.map_batches(is_bench, batch_format="pyarrow")
    train = docs_ds.map_batches(is_train, batch_format="pyarrow")
    ref = ray.put(collect_benchmark_hashes(bench, text_col, n, min_tokens))
    return decontam_overlap_dataset(train, ref, text_col, n, min_tokens)
