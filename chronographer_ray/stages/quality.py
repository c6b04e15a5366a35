"""Repetition-based quality filtering (Gopher/C4-style): per-document
duplicate-n-gram fraction and top-token concentration, with a composite
keep decision.

Repetition is the strongest cheap predictor of low-quality generated /
boilerplate text (Rae et al. 2021 "Gopher" §A1.1 repetition rules;
Raffel et al. 2020 C4 filters). Two signals per document:

- ``dup_trigram_frac`` = 1 - distinct_trigrams / total_trigrams —
  near-zero for natural prose, high for looped/template text;
- ``top_token_frac``   = count(most frequent token) / n_tokens —
  catches single-token floods the trigram signal can miss.

Pure ``map_batches``: one shared tokenization pass per batch
(`tokenize_batch`), trigram hashes via the rolling mixer
(`_shingle_hashes_fast`), per-doc `np.unique` / `np.bincount`. No
shuffle, no state — the filter streams at read bandwidth, which is what
a 100 TB hygiene pass needs.

No reference-file counterpart (LLM-pipeline charter, SURVEY §2.9).
"""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .dedup import _shingle_hashes_fast, tokenize_batch

# Gopher-flavored defaults: docs repeating >30% of their trigrams or
# spending >20% of tokens on one word are dropped.
MAX_DUP_TRIGRAM_FRAC = 0.3
MAX_TOP_TOKEN_FRAC = 0.2


def repetition_stats_batch(batch: pa.Table, text_col: str = "text",
                           min_tokens: int = 3,
                           max_dup: float = MAX_DUP_TRIGRAM_FRAC,
                           max_top: float = MAX_TOP_TOKEN_FRAC) -> pa.Table:
    """(doc_id, n_tokens, dup_trigram_frac, top_token_frac, keep_doc) for
    docs with >= min_tokens tokens (shorter docs carry no trigram signal
    and are the length filter's job, not this one's)."""
    texts = batch[text_col].to_pylist()
    vocab, doc_tok = tokenize_batch(texts)
    tok_crc = (
        np.array([zlib.crc32(t.encode("utf-8")) for t in vocab], dtype=np.uint64)
        if vocab
        else np.array([], np.uint64)
    )
    ids_col = batch["doc_id"].to_numpy(zero_copy_only=False)
    out_id: list[int] = []
    out_n: list[int] = []
    out_dup: list[float] = []
    out_top: list[float] = []
    for i, ids in enumerate(doc_tok):
        if len(ids) < min_tokens:
            continue
        arr = np.asarray(ids, dtype=np.int64)
        sh = _shingle_hashes_fast(arr, tok_crc)
        out_id.append(int(ids_col[i]))
        out_n.append(arr.size)
        out_dup.append(1.0 - np.unique(sh).size / sh.size)
        _, tok_counts = np.unique(arr, return_counts=True)
        out_top.append(int(tok_counts.max()) / arr.size)
    dup = np.asarray(out_dup)
    top = np.asarray(out_top)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "dup_trigram_frac": pa.array(dup, pa.float64()),
            "top_token_frac": pa.array(top, pa.float64()),
            "keep_doc": pa.array((dup <= max_dup) & (top <= max_top)),
        }
    )


def repetition_filter_dataset(ds, text_col: str = "text", **kw):
    """Full stats table; compose with a keep_doc filter to drop."""
    return ds.map_batches(
        lambda b: repetition_stats_batch(b, text_col, **kw),
        batch_format="pyarrow",
    )
