"""Persistent inverted index: build once (resumable hash-partitioned
postings), probe by reading ONLY the partitions the query terms hash to.

At 100 TB you do not rescan the corpus per query — the index is the
"prune at the read" structure: postings (term, doc_id, tf) land in
``write_resumable``'s crc-hash partitions, a search computes the same
crc32 per query term and opens just those ``part=<i>`` directories
(file-level pruning: a 3-term query against a 4096-partition index
touches <= 3 partitions regardless of corpus size), then one grouped
aggregate over the pruned postings scores the docs.

Build is map-only before the sink's single partition exchange; postings
use the shared flat tokenizer (`dedup.tokenize_batch_flat`: lower +
ASCII-whitespace split), so the index's term space matches every other
text operator and the DuckDB oracles."""
from __future__ import annotations

import glob
import os
import zlib

import numpy as np
import pyarrow as pa

from ..state.dataset_sink import write_resumable
from .dedup import tokenize_batch_flat


def postings_batch(b: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """(term, doc_id, tf) rows for one batch — whole-batch vectorized:
    flat token ids keyed (doc, id) through one np.unique."""
    ids, offsets, _, vocab = tokenize_batch_flat(b[text_col],
                                                 return_vocab=True)
    lens = np.diff(offsets)
    doc_idx = np.repeat(np.arange(lens.size), lens)
    if not ids.size:
        return pa.table({"term": pa.array([], pa.string()),
                         id_col: pa.array([], pa.int64()),
                         "tf": pa.array([], pa.int64())})
    key = doc_idx.astype(np.int64) * len(vocab) + ids
    uniq, counts = np.unique(key, return_counts=True)
    u_doc = (uniq // len(vocab)).astype(np.int64)
    u_term = (uniq % len(vocab)).astype(np.int64)
    doc_ids = b[id_col].to_numpy(zero_copy_only=False)
    varr = pa.array(vocab, pa.string())
    return pa.table({
        "term": varr.take(pa.array(u_term, pa.int64())),
        id_col: pa.array(doc_ids[u_doc], pa.int64()),
        "tf": pa.array(counts.astype(np.int64), pa.int64()),
    })


def build_inverted_index(docs, root: str, text_col: str = "text",
                         id_col: str = "doc_id", n_parts: int = 32) -> dict:
    """Materialize the postings index under ``root`` (resumable: a
    crashed build re-run skips finished partitions)."""
    postings = docs.map_batches(
        lambda b: postings_batch(b, text_col, id_col),
        batch_format="pyarrow",
    )
    return write_resumable(postings, root, key_col="term", n_parts=n_parts)


def _term_parts(terms: list[str], n_parts: int) -> list[int]:
    return sorted({
        zlib.crc32(t.encode("utf-8")) % n_parts for t in terms
    })


def search_index(root: str, terms: list[str], mode: str = "and",
                 id_col: str = "doc_id", n_parts: int = 32):
    """Boolean search over a built index → Dataset of (doc_id, score):
    docs containing ALL (``and``) or ANY (``or``) query terms, score =
    total tf of the matched terms. Reads ONLY the partitions the terms
    hash into; the aggregate runs over that pruned sliver."""
    import pyarrow.compute as pc
    import ray.data as rd

    term_set = sorted(set(terms))
    dirs = [
        d for i in _term_parts(term_set, n_parts)
        if glob.glob(os.path.join(d := os.path.join(root, "data", f"part={i}"),
                                  "*.parquet"))
    ]
    if not dirs:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
        }))
    ds = rd.read_parquet(dirs, file_extensions=["parquet"])

    def hits(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["term"], value_set=pa.array(term_set)))
        return t.select([id_col, "term", "tf"])

    matched = ds.map_batches(hits, batch_format="pyarrow")

    def score(g: "pd.DataFrame") -> "pd.DataFrame":
        agg = g.groupby(id_col).agg(
            n_terms=("term", "nunique"), score=("tf", "sum")
        ).reset_index()
        if mode == "and":
            agg = agg[agg["n_terms"] == len(term_set)]
        return agg[[id_col, "score"]]

    from ..functions.shuffles import bucketed_group_apply

    return bucketed_group_apply(matched, [id_col], score, n_buckets=8)
