"""Benchmark decontamination: flag training documents that share word
n-grams with a (small) benchmark / eval set.

This is the standard LLM-training-data hygiene pass (GPT-3 appendix C /
Dolma-style n-gram overlap decontamination): the benchmark side is tiny by
construction (eval suites are MBs; the training corpus is the 100 TB side),
so the scale-correct shape is a BROADCAST of the benchmark's distinct
shingle-hash set — built once with one pass over the benchmark docs,
``ray.put`` once — and a pure ``map_batches`` scan over the training
corpus (no shuffle at all): per batch, Arrow-vectorized tokenization
(`tokenize_batch_flat`), one whole-batch rolling-hash pass
(`shingle_hashes_flat`), one lexsort for per-doc distinct shingles, and a
vectorized sorted-array membership probe (``np.searchsorted``) against
the broadcast hashes — zero per-doc Python.

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

import numpy as np
import pyarrow as pa

import ray

from .dedup import shingle_hashes_flat, tokenize_batch_flat


def _batch_distinct_pairs(col, n: int, min_tokens: int):
    """(sh, doc_idx) DISTINCT (doc, shingle-hash) pairs over a whole batch
    — Arrow tokenization + one rolling-hash pass + one lexsort; docs with
    < max(min_tokens, n) tokens contribute nothing."""
    ids, offsets, tok_crc = tokenize_batch_flat(col)
    lens = np.diff(offsets)
    sh, doc_idx = shingle_hashes_flat(ids, offsets, tok_crc, n)
    if sh.size:
        mask = lens[doc_idx] >= max(min_tokens, n)
        sh, doc_idx = sh[mask], doc_idx[mask]
    if sh.size == 0:
        return sh, doc_idx
    order = np.lexsort((sh, doc_idx))
    sd, ss = doc_idx[order], sh[order]
    head = np.ones(sd.size, dtype=bool)
    head[1:] = (sd[1:] != sd[:-1]) | (ss[1:] != ss[:-1])
    return ss[head], sd[head]


def collect_benchmark_hashes(bench_ds, text_col: str = "text", n: int = 3,
                             min_tokens: int = 3) -> np.ndarray:
    """One pass over the benchmark docs -> sorted distinct uint64 shingle
    hashes. Per-batch partials are pre-uniqued so only distinct hashes
    travel to the driver; the result is bounded by the benchmark's shingle
    vocabulary (small by definition), which is what makes the driver-side
    union + broadcast legitimate here."""

    def part(batch: pa.Table) -> pa.Table:
        sh, _ = _batch_distinct_pairs(batch[text_col], n, min_tokens)
        return pa.table({"h": pa.array(np.unique(sh), pa.uint64())})

    parts = bench_ds.map_batches(part, batch_format="pyarrow").take_all()
    if not parts:
        return np.array([], np.uint64)
    return np.unique(np.array([r["h"] for r in parts], dtype=np.uint64))


def decontam_overlap_dataset(train_ds, bench_hashes_ref, text_col: str = "text",
                             n: int = 3, min_tokens: int = 3,
                             batch_size: int = 128):
    """(doc_id, n_overlap) for every training doc sharing >= 1 distinct
    n-gram with the broadcast benchmark set. Map-only: the benchmark hash
    array is fetched from the object store once per task (zero-copy numpy
    view), each doc costs one tokenize + one searchsorted probe."""

    def flag(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_hashes_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_overlap": pa.array([], pa.int64())}
        )
        if bench.size == 0:
            return empty
        sh, doc_idx = _batch_distinct_pairs(batch[text_col], n, min_tokens)
        if sh.size == 0:
            return empty
        pos = np.searchsorted(bench, sh)
        valid = pos < bench.size
        hit = np.zeros(sh.size, dtype=bool)
        hit[valid] = bench[pos[valid]] == sh[valid]
        n_ov = np.bincount(doc_idx[hit], minlength=len(batch))
        flagged = np.nonzero(n_ov)[0]
        return pa.table(
            {
                "doc_id": pa.array(ids[flagged], pa.int64()),
                "n_overlap": pa.array(n_ov[flagged], pa.int64()),
            }
        )

    # cache-sized batches: the per-batch lexsort working set stays
    # L2-resident under 32-worker bus contention (see quality.py rationale)
    return train_ds.map_batches(flag, batch_format="pyarrow",
                                batch_size=batch_size)


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
