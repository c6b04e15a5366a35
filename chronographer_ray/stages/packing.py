"""Sequence packing: assign every document its token offset in the
doc_id-ordered concatenated token stream, and the fixed-capacity context
window (bin) its first token lands in — GPT-style pretraining packing
(concatenate-then-chunk), computed as a DISTRIBUTED PREFIX SUM.

Shape (three passes, one text scan, no driver-side row data):
1. map: per-doc whitespace token counts (reuses the oracle-checked
   `token_count_batch` kernel) — the (doc_id, n_tokens) projection is
   materialized so the text column is scanned exactly once;
2. range partials: docs are RANGE-bucketed on the order key (monotone
   ``(doc_id - lo) * n_ranges // span``); a map pass emits one
   (range_id, token_sum) partial per batch — the driver folds
   ≤ n_blocks × n_ranges tiny rows into exclusive per-range offsets
   (the classic scan-then-propagate prefix-sum step);
3. in-range scan: an int-keyed ``groupby(range_id).map_groups`` sorts
   each range by doc_id and adds range_offset + exclusive in-range
   cumsum; ``bin_id = offset // capacity``.

The partitioning assumption (documented per the custom-operator charter):
packing is defined over a TOTAL ORDER of docs, so the order key must
range-partition — ranges need not be balanced (a skewed range only skews
one group's sort, and token sums, not texts, are what cross the wire).

First-fit/best-fit bin packing variants need iterative bin state and are
deliberately out of scope: concat-then-chunk is the packing used by
GPT-2/3-style pretraining corpora and is exactly prefix-sum-parallel.

No reference-file counterpart (LLM-pipeline charter, SURVEY §2.9).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Max, Min

from .text import token_count_batch


def sequence_pack_dataset(ds, capacity: int = 512, text_col: str = "text",
                          n_ranges: int = 32):
    """(doc_id, n_tokens, tok_offset, bin_id) over a documents Dataset."""

    def counts(b: pa.Table) -> pa.Table:
        t = token_count_batch(b, text_col)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": t["ws_tokens"]})

    tok = ds.map_batches(counts, batch_format="pyarrow").materialize()

    bounds = tok.aggregate(Min("doc_id"), Max("doc_id"))
    lo, hi = bounds["min(doc_id)"], bounds["max(doc_id)"]
    span = max(int(hi) - int(lo) + 1, 1)

    def _range_ids(ids: np.ndarray) -> np.ndarray:
        return (ids.astype(np.int64) - lo) * n_ranges // span

    def tag(b: pa.Table) -> pa.Table:
        r = _range_ids(b["doc_id"].to_numpy(zero_copy_only=False))
        return b.append_column("range_id", pa.array(r, pa.int64()))

    tagged = tok.map_batches(tag, batch_format="pyarrow")

    def partials(b: pa.Table) -> pa.Table:
        r = b["range_id"].to_numpy(zero_copy_only=False)
        n = b["n_tokens"].to_numpy(zero_copy_only=False)
        uniq = np.unique(r)
        sums = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(sums, np.searchsorted(uniq, r), n)
        return pa.table(
            {"range_id": pa.array(uniq, pa.int64()),
             "tok_sum": pa.array(sums, pa.int64())}
        )

    totals = np.zeros(n_ranges, dtype=np.int64)
    for row in tagged.map_batches(partials, batch_format="pyarrow").take_all():
        totals[row["range_id"]] += row["tok_sum"]
    # exclusive prefix over ranges: offset of range r = tokens in ranges < r
    range_offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))

    def scan(g: pa.Table) -> pa.Table:
        g = g.sort_by("doc_id")
        n = g["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = int(g["range_id"][0].as_py())
        off = int(range_offsets[r]) + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"],
                "tok_offset": pa.array(off, pa.int64()),
                "bin_id": pa.array(off // capacity, pa.int64()),
            }
        )

    return tagged.groupby("range_id").map_groups(scan, batch_format="pyarrow")
