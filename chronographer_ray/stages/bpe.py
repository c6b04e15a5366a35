"""Distributed BPE vocabulary induction (Sennrich et al. 2016, "Neural
machine translation of rare words with subword units") and the matching
encoder.

The 100 TB shape: BPE training never touches the raw corpus after ONE
pass — the classic algorithm runs entirely over the (word, count)
histogram, so the corpus-scale step is the word-count exchange
(`freq.term_counts_dataset`, map-side partials → one int-bucket
exchange) and every merge round is vocabulary-bounded. Per round:

1. map over histogram blocks: apply the merges learned so far to each
   word's symbol sequence (vocab-bounded Python — the same cost every
   BPE trainer pays) and emit count-weighted adjacent-pair partials;
2. one int-bucket exchange sums pair counts; each bucket emits ONLY its
   best row, and the driver picks the global argmax from ≤ n_buckets
   candidates (two scalars ever cross per bucket);
3. the winning pair joins the broadcast merge list (ties broken
   deterministically: max count, then lexicographically smallest
   (left, right) — so any block layout learns the IDENTICAL merge
   table).

Symbols are the word's codepoints (no end-of-word marker — documented
deviation from Sennrich's `</w>`; the dataflow is marker-agnostic).
Re-applying r merges from scratch each round costs O(r²·vocab) overall —
the standard trainer trade at small r; incremental pair maintenance is
the known optimization and drops in per-block without changing the
exchanges.

Not SQL-expressible (iterative argmax) → driver entry is rows-only;
correctness is pinned by a differential test against a reference
in-memory BPE trainer (tests/test_bpe.py).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def apply_merges(symbols: list[str], ranks: dict[tuple[str, str], int]
                 ) -> list[str]:
    """Standard BPE apply: repeatedly merge the lowest-rank adjacent pair."""
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols = (symbols[:best_i]
                   + [symbols[best_i] + symbols[best_i + 1]]
                   + symbols[best_i + 2:])
    return symbols


def bpe_train(ds, n_merges: int = 16, text_col: str = "text",
              n_buckets: int = 16):
    """Learn ``n_merges`` BPE merges from a corpus → pandas DataFrame
    (rank, left, right, n) — n the pair's count-weighted frequency when
    it was chosen. The merge table is the TRAINED ARTIFACT (like the
    classifier's weight table); it is merges-bounded, so returning it
    driver-side is the contract, not a scale leak."""
    import ray

    from ..functions.shuffles import bucketed_group_apply
    from .freq import term_counts_dataset

    hist = term_counts_dataset(ds, text_col=text_col).materialize()

    merges: list[tuple[str, str, int]] = []
    for rank in range(n_merges):
        ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
        ref = ray.put(ranks)

        def pair_partials(b: pa.Table) -> pa.Table:
            rk = ray.get(ref)
            terms = b["term"].to_pylist()
            ns = b["n"].to_numpy()
            agg: dict[tuple[str, str], int] = {}
            for t, n in zip(terms, ns):
                syms = apply_merges(list(t), rk)
                for a, c in zip(syms, syms[1:]):
                    agg[(a, c)] = agg.get((a, c), 0) + int(n)
            if not agg:
                return pa.table({"left": pa.array([], pa.string()),
                                 "right": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            ls, rs = zip(*agg.keys())
            return pa.table({"left": pa.array(ls, pa.string()),
                             "right": pa.array(rs, pa.string()),
                             "n": pa.array(list(agg.values()), pa.int64())})

        def best_of_bucket(t: pa.Table) -> pa.Table:
            g = t.group_by(["left", "right"]).aggregate([("n", "sum")])
            df = g.rename_columns(["left", "right", "n"]).to_pandas()
            if df.empty:
                return pa.table({"left": pa.array([], pa.string()),
                                 "right": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            df = df.sort_values(["n", "left", "right"],
                                ascending=[False, True, True])
            return pa.Table.from_pandas(df.head(1), preserve_index=False)

        cand = bucketed_group_apply(
            hist.map_batches(pair_partials, batch_format="pyarrow"),
            ["left", "right"], best_of_bucket, n_buckets=n_buckets,
            batch_format="pyarrow",
        ).to_pandas()  # ≤ n_buckets rows (one best per bucket)
        if cand.empty or "n" not in cand.columns:
            break
        cand = cand.sort_values(["n", "left", "right"],
                                ascending=[False, True, True])
        top = cand.iloc[0]
        if int(top["n"]) < 2:
            break  # nothing repeats — further merges are noise
        merges.append((str(top["left"]), str(top["right"]), int(top["n"])))

    return pd.DataFrame(
        [(i, l, r, n) for i, (l, r, n) in enumerate(merges)],
        columns=["rank", "left", "right", "n"],
    )


def bpe_encode_dataset(ds, merges: pd.DataFrame, text_col: str = "text"):
    """Apply a trained merge table → (doc_id, n_words, n_bpe_tokens):
    map-only (the merge table broadcasts once), the deployment shape of
    the trained artifact — per-doc BPE token counts for packing/pricing."""
    import ray

    from .dedup import tokenize_batch_flat

    ranks = {(l, r): i for i, (l, r) in
             enumerate(zip(merges["left"], merges["right"]))}
    ref = ray.put(ranks)

    def encode(b: pa.Table) -> pa.Table:
        rk = ray.get(ref)
        ids, offsets, _, vocab = tokenize_batch_flat(
            b[text_col], return_vocab=True)
        # one apply per DISTINCT token, gathered per occurrence
        tok_len = np.array(
            [len(apply_merges(list(t), rk)) for t in vocab], np.int64
        ) if vocab else np.array([], np.int64)
        n_docs = b.num_rows
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64),
                            np.diff(offsets))
        n_words = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        n_bpe = np.zeros(n_docs, np.int64)
        if len(ids):
            np.add.at(n_bpe, doc_idx, tok_len[ids])
        return pa.table({
            "doc_id": b["doc_id"],
            "n_words": pa.array(n_words),
            "n_bpe_tokens": pa.array(n_bpe),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


def bpe_pair_counts_dataset(ds, text_col: str = "text",
                            n_buckets: int = 16):
    """Round-0 BPE pair table → (left, right, n): count-weighted adjacent
    CHARACTER pairs over the word histogram — the exact input to the
    trainer's first argmax, exposed as a certifiable Dataset (the one
    piece of the iterative loop SQL can express, so the driver oracle
    pins the foundation the differential test builds on)."""
    from ..functions.shuffles import bucketed_group_apply
    from .freq import term_counts_dataset

    hist = term_counts_dataset(ds, text_col=text_col)

    def pair_partials(b: pa.Table) -> pa.Table:
        terms = b["term"].to_pylist()
        ns = b["n"].to_numpy()
        agg: dict[tuple[str, str], int] = {}
        for t, n in zip(terms, ns):
            for a, c in zip(t, t[1:]):  # codepoint pairs
                agg[(a, c)] = agg.get((a, c), 0) + int(n)
        if not agg:
            return pa.table({"left": pa.array([], pa.string()),
                             "right": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ls, rs = zip(*agg.keys())
        return pa.table({"left": pa.array(ls, pa.string()),
                         "right": pa.array(rs, pa.string()),
                         "n": pa.array(list(agg.values()), pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["left", "right"]).aggregate([("n", "sum")])
        return g.rename_columns(["left", "right", "n"])

    return bucketed_group_apply(
        hist.map_batches(pair_partials, batch_format="pyarrow"),
        ["left", "right"], merge, n_buckets=n_buckets,
        batch_format="pyarrow",
    )
