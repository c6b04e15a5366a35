"""Corpus frequency statistics: term counts, heavy hitters (exact and
count-min sketch), PMI bigram collocations.

Why these shapes at 100 TB:

- Exact term counts pre-combine map-side (each block collapses its own
  token stream to a (term, n) partial ≤ block-vocabulary rows) so the
  exchange moves vocabulary-sized partials, never the token stream.
- The count-min sketch variant bounds shuffle AND driver state by the
  sketch dimensions (depth × width), independent of vocabulary size —
  the mergeable-summary trade (Cormode & Muthukrishnan, "An improved
  data stream summary: the count-min sketch and its applications",
  J. Algorithms 2005). Candidates come from per-block local top-c·k
  (a corpus-wide heavy hitter is a heavy hitter in at least one block
  of a random partition, with high probability).
- PMI joins unigram probabilities onto the bigram table by broadcast
  (unigram vocab ≪ bigram vocab); the bigram table itself stays
  distributed.

No direct reference counterpart (LLM-pipeline extension operators);
tokenization matches ``stages/text.py`` (lowercase, whitespace split)
so the DuckDB oracles share one canonical form.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .sampling import splitmix64


def _batch_terms(col):
    """Batch-local (vocab_np, counts) over lowercased whitespace tokens;
    tokens of empty/all-whitespace rows are masked (split of '' → [''])."""
    import pyarrow.compute as pc

    from .text import _tokens_and_counts

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    tokens, _, empty = _tokens_and_counts(pc.utf8_lower(col))
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
    keep = ~empty.to_numpy(zero_copy_only=False)[parent]
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[keep]
    vocab_np = np.array(denc.dictionary.to_pylist(), dtype=object)
    counts = np.bincount(codes, minlength=len(vocab_np)).astype(np.int64)
    present = counts > 0
    return vocab_np[present], counts[present]


def term_counts_dataset(ds, text_col: str = "text"):
    """Corpus-wide (term, n) counts: map-side partial counts per block,
    then one int-bucket exchange summing per term. The shuffle input is
    Σ(block vocabularies), not the token stream."""
    from ..functions.shuffles import bucketed_group_apply

    def partial(b: pa.Table) -> pa.Table:
        vocab, counts = _batch_terms(b[text_col])
        return pa.table({"term": pa.array(vocab.tolist(), pa.string()),
                         "n": pa.array(counts, pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate([("n", "sum")])
        return g.rename_columns(["term", "n"])

    return bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["term"], merge, batch_format="pyarrow",
    )


def heavy_hitters_dataset(ds, k: int = 20, text_col: str = "text"):
    """Exact top-``k`` most frequent terms, ordered (n desc, term asc) so
    boundary ties are deterministic. The sort runs over the vocabulary-
    sized counts table, not the corpus."""
    return term_counts_dataset(ds, text_col).sort(
        ["n", "term"], descending=[True, False]
    ).limit(k)


def _term_hash(vocab_np: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash per term (blake2b digest — Python's
    built-in ``hash`` is process-salted). Runs over the batch VOCABULARY
    (small), never per token."""
    return np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                        "little") for t in vocab_np],
        dtype=np.uint64,
    )


def cms_heavy_hitters_dataset(
    ds, k: int = 20, text_col: str = "text",
    depth: int = 4, width: int = 1 << 16, candidate_factor: int = 4,
):
    """Approximate top-``k`` terms via a distributed count-min sketch.

    Per block: fold local term counts into (row, col, cnt) sketch entries
    (≤ depth × block-vocab rows) and nominate the local top-``c·k`` terms
    as candidates. One int-bucket exchange sum-combines sketch cells to at
    most depth × width rows; the driver folds that FIXED-size table into
    the dense sketch and scores the (bounded) candidate union by the
    min-over-rows estimate. Overestimates only (ε ≈ e/width of the token
    mass, δ ≈ e^-depth); exact companion: :func:`heavy_hitters_dataset`.
    Returns (term, n_est) ordered (n_est desc, term asc)."""
    import ray.data as rd

    from ..functions.shuffles import bucketed_group_apply

    seeds = (np.arange(depth, dtype=np.uint64) + np.uint64(1)) * np.uint64(
        0x9E3779B97F4A7C15
    )

    def partial(b: pa.Table) -> pa.Table:
        vocab, counts = _batch_terms(b[text_col])
        if len(vocab) == 0:
            return pa.table({"row": pa.array([], pa.int64()),
                             "col": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string())})
        h = _term_hash(vocab)
        rows, cols, cnts = [], [], []
        for d in range(depth):
            c = (splitmix64((h + seeds[d]).astype(np.int64)) %
                 np.uint64(width)).astype(np.int64)
            # collapse batch-local col collisions before emitting
            uc, inv = np.unique(c, return_inverse=True)
            cc = np.bincount(inv, weights=counts).astype(np.int64)
            rows.append(np.full(len(uc), d, dtype=np.int64))
            cols.append(uc)
            cnts.append(cc)
        top = np.lexsort((vocab, -counts))[: candidate_factor * k]
        t = pa.table({
            "row": pa.array(np.concatenate(rows)),
            "col": pa.array(np.concatenate(cols)),
            "cnt": pa.array(np.concatenate(cnts)),
        })
        # candidates ride along with row=-1 (cnt unused downstream)
        cand = pa.table({
            "row": pa.array(np.full(len(top), -1, dtype=np.int64)),
            "col": pa.array(np.zeros(len(top), dtype=np.int64)),
            "cnt": pa.array(counts[top]),
            "term": pa.array(vocab[top].tolist(), pa.string()),
        })
        return pa.concat_tables(
            [t.append_column("term", pa.array([""] * len(t), pa.string())), cand]
        )

    def merge(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cells = t.filter(pc.not_equal(t["row"], -1))
        g = cells.group_by(["row", "col"]).aggregate([("cnt", "sum")])
        g = g.rename_columns(["row", "col", "cnt"])
        g = g.append_column("term", pa.array([""] * len(g), pa.string()))
        cand = t.filter(pc.equal(t["row"], -1)).select(
            ["row", "col", "cnt", "term"]
        )
        return pa.concat_tables([g, cand])

    combined = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["row", "col"], merge, batch_format="pyarrow",
    ).to_pandas()  # ≤ depth×width sketch rows + bounded candidate rows

    if len(combined) == 0:  # all-empty dataset → column-less frame (Ray quirk)
        return rd.from_arrow(pa.table({"term": pa.array([], pa.string()),
                                       "n_est": pa.array([], pa.int64())}))
    cells = combined[combined["row"] >= 0]
    sketch = np.zeros((depth, width), dtype=np.int64)
    # candidate rows from every bucket share (row=-1, col=0): merge sums
    # duplicate candidate nominations — re-aggregate cells exactly once
    agg = cells.groupby(["row", "col"], as_index=False)["cnt"].sum()
    sketch[agg["row"].to_numpy(), agg["col"].to_numpy()] = agg["cnt"].to_numpy()

    cand_terms = np.array(
        sorted(set(combined.loc[combined["row"] < 0, "term"])), dtype=object
    )
    if len(cand_terms) == 0:
        return rd.from_arrow(pa.table({"term": pa.array([], pa.string()),
                                       "n_est": pa.array([], pa.int64())}))
    h = _term_hash(cand_terms)
    est = np.full(len(cand_terms), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        c = (splitmix64((h + seeds[d]).astype(np.int64)) %
             np.uint64(width)).astype(np.int64)
        est = np.minimum(est, sketch[d, c])
    top = np.lexsort((cand_terms, -est))[:k]
    return rd.from_arrow(pa.table({
        "term": pa.array(cand_terms[top].tolist(), pa.string()),
        "n_est": pa.array(est[top], pa.int64()),
    }))


def _batch_bigrams(col):
    """Batch-local (bigram 'w1 w2' vocab, counts) over consecutive token
    pairs within each doc (pairs never cross doc boundaries)."""
    import pyarrow.compute as pc

    from .text import _tokens_and_counts

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    tokens, _, empty = _tokens_and_counts(pc.utf8_lower(col))
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
    keep = ~empty.to_numpy(zero_copy_only=False)[parent]
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[keep]
    parent = parent[keep]
    vocab_np = np.array(denc.dictionary.to_pylist(), dtype=object)
    if len(codes) < 2:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    same_doc = parent[1:] == parent[:-1]
    a, b = codes[:-1][same_doc], codes[1:][same_doc]
    nv = max(len(vocab_np), 1)
    key = a * nv + b
    uk, cnt = np.unique(key, return_counts=True)
    w1, w2 = vocab_np[uk // nv], vocab_np[uk % nv]
    grams = np.array([f"{x} {y}" for x, y in zip(w1, w2)], dtype=object)
    return grams, cnt.astype(np.int64)


def pmi_bigrams_dataset(ds, min_count: int = 2, text_col: str = "text",
                        broadcast_vocab_limit: int = 100_000_000):
    """Pointwise mutual information of adjacent-token bigrams:
    ``pmi = ln((c_ab/B) / ((c_a/T)·(c_b/T)))`` with T total tokens and B
    total bigrams, keeping bigrams with count ≥ ``min_count``.

    Shape: bigram counts via map-side partials + one int-bucket exchange
    (bigram-vocabulary-sized). Unigram attachment is GATED on the unigram
    vocab size (the same contract as the graph ops' node threshold):

    - ≤ ``broadcast_vocab_limit``: unigram counts are collected and
      broadcast (``ray.put`` sorted arrays) into a map-only scoring pass —
      no bigram-side join shuffle. A web-scale corpus has ~10^8 distinct
      terms (GBs) — within a worker heap, hence the high default.
    - above the limit: the unigram table stays distributed; c_a / c_b
      attach via two bucketed zip exchanges on the term key (the
      assortativity shuffle-attach pattern), then the same map-only score.

    Both paths are bit-identical (tested with a forced tiny limit).
    Scores are rounded to 6 dp for oracle agreement. Returns
    (w1, w2, n, pmi)."""
    import ray

    from ..functions.shuffles import bucketed_group_apply

    def partial(b: pa.Table) -> pa.Table:
        grams, cnt = _batch_bigrams(b[text_col])
        return pa.table({"gram": pa.array(grams.tolist(), pa.string()),
                         "n": pa.array(cnt, pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("gram").aggregate([("n", "sum")])
        return g.rename_columns(["gram", "n"])

    # materialized: consumed twice (total + scoring) and only
    # bigram-vocabulary-sized — re-running the corpus scan would be worse
    bigrams = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["gram"], merge, batch_format="pyarrow",
    ).materialize()

    # total bigram count B: sum over the (distributed) bigram table
    n_bigrams = int(bigrams.sum("n") or 0)

    uni_ds = term_counts_dataset(ds, text_col).materialize()
    total_t = int(uni_ds.sum("n") or 0)

    def _pmi_cols(w1, w2, nab: np.ndarray, c1: np.ndarray,
                  c2: np.ndarray) -> pa.Table:
        pmi = np.round(
            np.log((nab.astype(np.float64) / n_bigrams) /
                   ((c1 / total_t) * (c2 / total_t))), 6)
        return pa.table({"w1": w1, "w2": w2,
                         "n": pa.array(nab, pa.int64()),
                         "pmi": pa.array(pmi, pa.float64())})

    _EMPTY = pa.table({"w1": pa.array([], pa.string()),
                       "w2": pa.array([], pa.string()),
                       "n": pa.array([], pa.int64()),
                       "pmi": pa.array([], pa.float64())})

    if uni_ds.count() <= broadcast_vocab_limit:
        uni = uni_ds.to_pandas()  # unigram-vocab-sized (the gate's bound)
        terms = uni["term"].to_numpy(dtype=object)
        srt = np.argsort(terms)
        uni_ref = ray.put((terms[srt],
                           uni["n"].to_numpy(dtype=np.int64)[srt]))

        def score(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            terms_sorted, uni_n = ray.get(uni_ref)
            t = t.filter(pc.greater_equal(t["n"], min_count))
            if t.num_rows == 0:
                return _EMPTY
            split = pc.split_pattern(t["gram"], " ")
            w1 = pc.list_element(split, 0)
            w2 = pc.list_element(split, 1)
            c1 = uni_n[np.searchsorted(
                terms_sorted, np.array(w1.to_pylist(), dtype=object))]
            c2 = uni_n[np.searchsorted(
                terms_sorted, np.array(w2.to_pylist(), dtype=object))]
            nab = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            return _pmi_cols(w1, w2, nab, c1, c2)

        return bigrams.map_batches(score, batch_format="pyarrow")

    # join path: unigram table stays distributed; attach c1 then c2 via
    # tagged-union bucketed zip exchanges on the term key
    import pandas as pd
    import pyarrow.compute as pc_mod

    def split_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc_mod.greater_equal(t["n"], min_count))
        split = pc_mod.split_pattern(t["gram"], " ")
        return pa.table({
            "key": pc_mod.list_element(split, 0),
            "w2": pc_mod.list_element(split, 1),
            "n": t["n"],
            "c": pa.array(np.zeros(t.num_rows, np.int64)),
            "kind": pa.array(np.zeros(t.num_rows, np.int8)),
        })

    def uni_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t["term"],
            "w2": pa.array([""] * t.num_rows, pa.string()),
            "n": pa.array(np.zeros(t.num_rows, np.int64)),
            "c": t["n"],
            "kind": pa.array(np.ones(t.num_rows, np.int8)),
        })

    # pass 1: key = w1 → unigram c joins as c1 (≤1 unigram row per key
    # in-bucket; inner join — every bigram token is in the unigram vocab
    # by construction)
    def fix1(g: pd.DataFrame) -> pd.DataFrame:
        uni_g = g.loc[g["kind"] == 1, ["key", "c"]]
        big = g.loc[g["kind"] == 0, ["key", "w2", "n"]]
        return big.merge(uni_g, on="key").rename(
            columns={"key": "w1", "c": "c1"})

    with_c1 = bucketed_group_apply(
        bigrams.map_batches(split_rows, batch_format="pyarrow").union(
            uni_ds.map_batches(uni_rows, batch_format="pyarrow")),
        ["key"], fix1,
    ).materialize()  # re-keyed exchange follows; don't recompute

    def rekey(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t["w2"], "w2": t["w1"], "n": t["n"],
            "c": t["c1"],
            "kind": pa.array(np.zeros(t.num_rows, np.int8)),
        })

    def fix2(g: pd.DataFrame) -> pd.DataFrame:
        # bigram rows carry (key=w2, w2=w1, n, c=c1); unigram c joins as c2
        uni_g = g.loc[g["kind"] == 1, ["key", "c"]].rename(
            columns={"c": "c2"})
        big = g.loc[g["kind"] == 0, ["key", "w2", "n", "c"]].rename(
            columns={"key": "rw2", "w2": "w1", "c": "c1"})
        return big.merge(uni_g, left_on="rw2", right_on="key")[
            ["w1", "rw2", "n", "c1", "c2"]].rename(columns={"rw2": "w2"})

    with_c2 = bucketed_group_apply(
        with_c1.map_batches(rekey, batch_format="pyarrow").union(
            uni_ds.map_batches(uni_rows, batch_format="pyarrow")),
        ["key"], fix2,
    )

    def score_joined(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        return _pmi_cols(
            t["w1"], t["w2"],
            t["n"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["c1"].to_numpy(zero_copy_only=False).astype(np.float64),
            t["c2"].to_numpy(zero_copy_only=False).astype(np.float64))

    return with_c2.map_batches(score_joined, batch_format="pyarrow")


def cooccurrence_pairs_dataset(ds, group_col: str, item_col: str,
                               group_cap: int = 64, min_support: int = 2,
                               n_buckets: int = 16):
    """Market-basket co-occurrence mining: (item_a, item_b, n_groups)
    for every unordered item pair sharing ≥ ``min_support`` groups —
    the frequent-pair half of Apriori, the feature most co-view /
    co-purchase / co-citation pipelines actually ship.

    ``group_cap`` drops groups with more than ``group_cap`` distinct
    items BEFORE the quadratic pair emit (a k-item group emits k²/2
    pairs, so one mega-basket otherwise dominates the exchange) — like
    entity-similarity's hub_cap it is part of the DEFINED semantics and
    lives in the oracle too.

    Dataflow: map-side per-batch (group, item) dedup → one int-bucket
    exchange on the group key (all items of a group co-locate) →
    in-bucket exact dedup + cap + vectorized self-merge emitting pair
    partials → pair-bucket exchange sums + support filter. Integer
    counts, order-independent."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.shuffles import bucketed_group_apply

    def project(b: pa.Table) -> pa.Table:
        t = pa.table({"g": b[group_col], "i": b[item_col]})
        return t.group_by(["g", "i"]).aggregate([])

    rows = ds.map_batches(project, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        sz = g.groupby("g")["i"].transform("size")
        g = g[sz <= group_cap]
        m = g.merge(g, on="g", suffixes=("_a", "_b"))
        m = m[m["i_a"] < m["i_b"]]
        out = (m.groupby(["i_a", "i_b"], as_index=False)
               .agg(n_part=("g", "size"))
               .rename(columns={"i_a": "item_a", "i_b": "item_b"}))
        out["n_part"] = out["n_part"].astype(np.int64)
        return out

    partials = bucketed_group_apply(rows, ["g"], pairs,
                                    n_buckets=n_buckets)

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["item_a", "item_b"]).aggregate([("n_part", "sum")])
        g = g.rename_columns(["item_a", "item_b", "n_groups"])
        return g.filter(pc.greater_equal(g["n_groups"], min_support))

    return bucketed_group_apply(partials, ["item_a", "item_b"], combine,
                                n_buckets=n_buckets,
                                batch_format="pyarrow")


def association_rules_dataset(ds, group_col: str, item_col: str,
                              group_cap: int = 64, min_support: int = 2,
                              n_buckets: int = 16):
    """Association rules from the frequent pairs: (item_a, item_b,
    n_groups, conf_a_to_b, conf_b_to_a) where conf(a→b) =
    n(a,b) / support(a) — the Apriori rule pass over
    ``cooccurrence_pairs_dataset``'s output.

    Supports are computed over the SAME capped, deduped baskets as the
    pairs (one extra group-bucket exchange → item-bounded support
    table), then broadcast once (``ray.put``; item-vocabulary-bounded —
    the usual broadcast-side contract, a 10^10-item catalog would flip
    this to an item-keyed join). Confidences divide exact int64 counts
    in float64 — bit-reproducible by the oracle."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from ..functions.shuffles import bucketed_group_apply

    pairs = cooccurrence_pairs_dataset(
        ds, group_col, item_col, group_cap=group_cap,
        min_support=min_support, n_buckets=n_buckets).materialize()

    def project(b: pa.Table) -> pa.Table:
        t = pa.table({"g": b[group_col], "i": b[item_col]})
        return t.group_by(["g", "i"]).aggregate([])

    rows = ds.map_batches(project, batch_format="pyarrow")

    def sup_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        sz = g.groupby("g")["i"].transform("size")
        g = g[sz <= group_cap]
        out = g.groupby("i", as_index=False).agg(s=("g", "size"))
        out["s"] = out["s"].astype(np.int64)
        return out

    sup_parts = bucketed_group_apply(rows, ["g"], sup_partial,
                                     n_buckets=n_buckets)

    def sup_merge(t: pa.Table) -> pa.Table:
        return t.group_by("i").aggregate([("s", "sum")]).rename_columns(
            ["i", "s"])

    sup_pd = bucketed_group_apply(
        sup_parts, ["i"], sup_merge, n_buckets=n_buckets,
        batch_format="pyarrow").to_pandas()
    order = np.argsort(sup_pd["i"].to_numpy())
    ref = ray.put((sup_pd["i"].to_numpy()[order],
                   sup_pd["s"].to_numpy()[order].astype(np.int64)))

    def score(b: pa.Table) -> pa.Table:
        items, sups = ray.get(ref)
        a = b["item_a"].to_numpy(zero_copy_only=False)
        bb = b["item_b"].to_numpy(zero_copy_only=False)
        n = b["n_groups"].to_numpy(zero_copy_only=False).astype(np.float64)
        sa = sups[np.searchsorted(items, a)].astype(np.float64)
        sb = sups[np.searchsorted(items, bb)].astype(np.float64)
        return pa.table({
            "item_a": b["item_a"], "item_b": b["item_b"],
            "n_groups": b["n_groups"],
            "conf_a_to_b": pa.array(n / sa, pa.float64()),
            "conf_b_to_a": pa.array(n / sb, pa.float64()),
        })

    return pairs.map_batches(score, batch_format="pyarrow")


# ------------------------------------------------ document-frequency score
def _distinct_doc_tokens(b: pa.Table, text_col: str) -> pa.Table:
    """(doc_id, tok) rows, DISTINCT per doc — one composite-key np.unique
    over the flat token stream (no per-doc Python)."""
    from .dedup import tokenize_batch_flat

    ids, offsets, _, vocab = tokenize_batch_flat(
        b[text_col], return_vocab=True
    )
    import pyarrow.compute as pc

    if not len(ids):
        return pa.table({"doc_id": pa.array([], b["doc_id"].type),
                         "tok": pa.array([], pa.string())})
    doc_idx = np.repeat(
        np.arange(b.num_rows, dtype=np.int64), np.diff(offsets)
    )
    codes = np.unique(doc_idx * np.int64(len(vocab)) + ids)
    va = np.array(vocab, dtype=object)
    return pa.table({
        "doc_id": pc.take(b["doc_id"],
                          pa.array(codes // np.int64(len(vocab)))),
        "tok": pa.array(va[codes % np.int64(len(vocab))].tolist(),
                        pa.string()),
    })


def doc_df_score_dataset(ds, text_col: str = "text",
                         broadcast_vocab_limit: int = 100_000_000,
                         n_buckets: int = 16):
    """CCNet-flavored corpus-fit score → (doc_id, n_terms, df_score):
    df_score = Σ over a doc's DISTINCT tokens of bit_length(df(token)),
    n_terms = distinct-token count. A document of corpus-common vocabulary
    scores high per term; OOV-heavy noise (mojibake, codes, spam hashes)
    scores the 1-bit floor — the document-frequency analogue of CCNet's
    LM-perplexity quality bucketing (Wenzek et al. 2020), integer-exact
    (bit_length = the frexp exponent; SQL twin ``length(bin(df))``) so the
    oracle matches bit-for-bit where a log-float score could not.

    Shape: distinct (doc, token) explode (composite-key unique, map-only)
    → token-bucket exchange for df (vocab-bounded partials: each doc's
    tokens are already distinct) → attach df back, GATED like the PMI
    unigram attach (`pmi_bigrams_dataset`):

    - vocab ≤ ``broadcast_vocab_limit``: (token, df) ships once via
      ``ray.put`` sorted arrays; scoring is map-only over the pair stream.
    - above: df stays distributed; a tagged-union bucket exchange on the
      token zips df onto each pair (the assortativity shuffle-attach
      pattern).

    Both paths end in ONE int-bucket exchange on doc_id summing per-batch
    partials (a doc's pairs may straddle batch boundaries). Bit-identical
    (tested with a forced tiny limit)."""
    import pandas as pd
    import ray

    from ..functions.shuffles import bucketed_group_apply

    # materialized: consumed twice (df exchange + scoring) and it is the
    # substrate both passes need — rescanning the corpus tokenizer would
    # cost more than spilling the distinct-pair table
    pairs = ds.map_batches(
        lambda b: _distinct_doc_tokens(b, text_col), batch_format="pyarrow",
    ).materialize()

    def df_merge(t: pa.Table) -> pa.Table:
        g = t.group_by("tok").aggregate([("doc_id", "count")])
        return g.rename_columns(["tok", "df"])

    df_ds = bucketed_group_apply(
        pairs, ["tok"], df_merge, n_buckets=n_buckets,
        batch_format="pyarrow",
    ).materialize()

    def bl(df: np.ndarray) -> np.ndarray:
        # bit_length of positive int64 = frexp exponent (exact < 2^53)
        return np.frexp(df.astype(np.float64))[1].astype(np.int64)

    if df_ds.count() <= broadcast_vocab_limit:
        dfp = df_ds.to_pandas()  # vocab-sized (the gate's bound)
        toks = dfp["tok"].to_numpy(dtype=object)
        srt = np.argsort(toks)
        df_ref = ray.put((toks[srt],
                          dfp["df"].to_numpy(dtype=np.int64)[srt]))

        def score_part(b: pa.Table) -> pa.Table:
            toks_sorted, dfs = ray.get(df_ref)
            t = b["tok"].to_numpy(zero_copy_only=False)
            w = bl(dfs[np.searchsorted(toks_sorted, t)])
            d = b["doc_id"].to_numpy(zero_copy_only=False)
            u, inv = np.unique(d, return_inverse=True)
            s = np.zeros(len(u), np.int64)
            np.add.at(s, inv, w)
            return pa.table({
                "doc_id": pa.array(u),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "s": pa.array(s),
            })

        parts = pairs.map_batches(score_part, batch_format="pyarrow")
    else:
        def p_rows(b: pa.Table) -> pa.Table:
            return pa.table({
                "tok": b["tok"], "doc_id": b["doc_id"],
                "df": pa.array(np.zeros(b.num_rows, np.int64)),
                "kind": pa.array(np.zeros(b.num_rows, np.int8)),
            })

        def d_rows(b: pa.Table) -> pa.Table:
            return pa.table({
                "tok": b["tok"],
                "doc_id": pa.array(np.zeros(b.num_rows, np.int64)),
                "df": b["df"],
                "kind": pa.array(np.ones(b.num_rows, np.int8)),
            })

        def zip_df(g: pd.DataFrame) -> pd.DataFrame:
            dfs = g.loc[g["kind"] == 1, ["tok", "df"]]
            pr = g.loc[g["kind"] == 0, ["tok", "doc_id"]]
            m = pr.merge(dfs, on="tok")
            m["s"] = bl(m["df"].to_numpy(dtype=np.int64))
            m["n"] = 1
            return m[["doc_id", "n", "s"]]

        parts = bucketed_group_apply(
            pairs.map_batches(p_rows, batch_format="pyarrow").union(
                df_ds.map_batches(d_rows, batch_format="pyarrow")),
            ["tok"], zip_df, n_buckets=n_buckets,
        )

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("n", "sum"), ("s", "sum")])
        return g.rename_columns(["doc_id", "n_terms", "df_score"])

    out = bucketed_group_apply(
        parts, ["doc_id"], fold, n_buckets=n_buckets,
        batch_format="pyarrow",
    )
    import ray.data as rd

    sch = ds.schema()
    doc_t = dict(zip(sch.names, sch.types)).get("doc_id", pa.int64())
    typed_empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], doc_t),
        "n_terms": pa.array([], pa.int64()),
        "df_score": pa.array([], pa.int64()),
    }))
    return out.union(typed_empty)


# ------------------------------------------------- term-category association
def term_category_assoc_dataset(ds, category_col: str = "source",
                                text_col: str = "text", min_count: int = 5,
                                n_buckets: int = 16):
    """Chi-squared term↔category association → (term, category, n, chi2)
    for (term, category) cells with n ≥ ``min_count``: which words are
    over-represented in which source/domain (feature selection for
    domain classifiers; Manning & Schütze ch. 5). Token occurrences are
    counted with multiplicity (the same contract as `term_counts_dataset`).

    chi2 from the 2×2 contingency table of exact int64 counts
    (N·(n11·n00 − n10·n01)² / ((n11+n10)(n01+n00)(n11+n01)(n10+n00)))
    evaluated as ONE fixed float64 expression — numerator/denominator are
    exact integers well inside 2^63 at cell scale, so the oracle
    hash-matches the float byte-for-byte.

    Shape: map-side (term, category) partial counts (block-vocab-bounded)
    → one int-bucket exchange on the term summing partials AND folding
    the term's row total; category totals + N are a category-bounded
    driver fold broadcast into the final map-only score."""
    import ray

    from ..functions.shuffles import bucketed_group_apply

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cats = b[category_col]
        if isinstance(cats, pa.ChunkedArray):
            cats = cats.combine_chunks()
        texts = b[text_col]
        vocab, counts = [], []
        # per-category within the batch: dictionary-encode category,
        # count tokens per (term, category) via one composite bincount
        from .dedup import tokenize_batch_flat

        ids, offsets, _, vb = tokenize_batch_flat(texts, return_vocab=True)
        if not len(ids):
            return pa.table({"term": pa.array([], pa.string()),
                             "category": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        cenc = pc.dictionary_encode(cats)
        if isinstance(cenc, pa.ChunkedArray):
            cenc = cenc.combine_chunks()
        ccodes = cenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cvocab = np.array(cenc.dictionary.to_pylist(), dtype=object)
        doc_idx = np.repeat(
            np.arange(b.num_rows, dtype=np.int64), np.diff(offsets))
        comp = ids * np.int64(len(cvocab)) + ccodes[doc_idx]
        u, cnt = np.unique(comp, return_counts=True)
        va = np.array(vb, dtype=object)
        return pa.table({
            "term": pa.array(va[u // len(cvocab)].tolist(), pa.string()),
            "category": pa.array(cvocab[u % len(cvocab)].tolist(),
                                 pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["term", "category"]).aggregate([("n", "sum")])
        return g.rename_columns(["term", "category", "n"])

    cells = bucketed_group_apply(
        parts, ["term"], merge, n_buckets=n_buckets,
        batch_format="pyarrow",
    ).materialize()

    # category totals + grand total: per-batch category-bounded partials
    # over the CELL table (already collapsed to vocab×|categories| rows),
    # folded on the driver — ≤ |categories| scalars ever held there
    def cat_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("category").aggregate([("n", "sum")])
        return g.rename_columns(["category", "n"])

    cat_tot: dict[str, int] = {}
    for b in cells.map_batches(
            cat_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for c, v in zip(b["category"].to_pylist(), b["n"].to_numpy()):
            cat_tot[c] = cat_tot.get(c, 0) + int(v)
    n_total = sum(cat_tot.values())
    tot_ref = ray.put((cat_tot, n_total))

    def term_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # term totals within the bucket (a term lives in ONE bucket);
        # int64 bound: n11·n00 ≤ N² must stay < 2^63 AND the squared
        # difference < 2^53 for the float64 hash-exactness contract —
        # holds to ~3·10^9 tokens per run; beyond that score in HUGEINT
        # terms (SQL side) / object-dtype ints (kernel side)
        g = t.group_by("term").aggregate([("n", "sum")])
        tt = dict(zip(g["term"].to_pylist(),
                      g["n_sum"].to_numpy().astype(np.int64)))
        ct, nn = ray.get(tot_ref)
        term = t["term"].to_pylist()
        cat = t["category"].to_pylist()
        n11 = t["n"].to_numpy().astype(np.int64)
        t_tot = np.array([tt[x] for x in term], np.int64)
        c_tot = np.array([ct[x] for x in cat], np.int64)
        n10 = t_tot - n11            # term, other categories
        n01 = c_tot - n11            # category, other terms
        n00 = nn - t_tot - n01       # neither
        diff = (n11 * n00 - n10 * n01).astype(np.float64)
        num = nn * (diff * diff)
        den = (t_tot * (nn - t_tot)).astype(np.float64) * \
            (c_tot * (nn - c_tot)).astype(np.float64)
        chi2 = np.where(den > 0, num / den, 0.0)
        out = pa.table({
            "term": t["term"], "category": t["category"],
            "n": pa.array(n11), "chi2": pa.array(chi2, pa.float64()),
        })
        return out.filter(pc.greater_equal(out["n"], min_count))

    return bucketed_group_apply(
        cells, ["term"], term_rows, n_buckets=n_buckets,
        batch_format="pyarrow",
    )


# ------------------------------------------------------- bigram LM scoring
def _doc_bigram_rows(b: pa.Table, text_col: str) -> pa.Table:
    """Per-doc bigram multiplicity table → (doc_id, w1, w2, m): consecutive
    lowercased-token pairs within each doc (never across docs), collapsed
    to one row per (doc, bigram) with its in-doc count. One composite
    bincount over the flattened token stream — no per-row Python."""
    import pyarrow.compute as pc

    from .text import _tokens_and_counts

    doc_t = b["doc_id"].type
    empty_out = pa.table({
        "doc_id": pa.array([], doc_t),
        "w1": pa.array([], pa.string()),
        "w2": pa.array([], pa.string()),
        "m": pa.array([], pa.int64()),
    })
    col = b[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    tokens, _, empty = _tokens_and_counts(pc.utf8_lower(col))
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
    keep = ~empty.to_numpy(zero_copy_only=False)[parent]
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)[keep]
    parent = parent[keep]
    if len(codes) < 2:
        return empty_out
    vocab_np = np.array(denc.dictionary.to_pylist(), dtype=object)
    same_doc = parent[1:] == parent[:-1]
    if not same_doc.any():
        return empty_out
    row = parent[:-1][same_doc].astype(np.int64)
    a, c = codes[:-1][same_doc], codes[1:][same_doc]
    # composite (doc row, w1, w2) key; bound: rows·nv² < 2^63 holds to a
    # ~10⁶-term batch vocabulary at 10⁴ rows/batch — far above any real
    # batch (batch vocab is bounded by the batch's token count)
    nv = np.int64(max(len(vocab_np), 1))
    key = (row * nv + a) * nv + c
    uk, m = np.unique(key, return_counts=True)
    r = uk // (nv * nv)
    rem = uk % (nv * nv)
    doc_ids = b["doc_id"].take(pa.array(r, pa.int64()))
    return pa.table({
        "doc_id": doc_ids,
        "w1": pa.array(vocab_np[(rem // nv)].tolist(), pa.string()),
        "w2": pa.array(vocab_np[(rem % nv)].tolist(), pa.string()),
        "m": pa.array(m.astype(np.int64)),
    })


def lm_score_dataset(ds, text_col: str = "text",
                     broadcast_vocab_limit: int = 100_000_000,
                     n_buckets: int = 16):
    """Add-one-smoothed bigram language-model score per document →
    (doc_id, n_bigrams, lm_logprob, lm_ppl): the real-LM version of the
    CCNet perplexity quality filter (Wenzek et al. 2020 train a KenLM and
    bucket documents by perplexity; this trains the LM on the corpus
    itself in one distributed pass and scores every doc with it).

      logP(w2|w1) = ln(c12 + 1) − ln(c1 + V)
      lm_logprob  = Σ over the doc's bigram positions of logP  (round 6)
      lm_ppl      = exp(−lm_logprob / n_bigrams)               (round 6)

    with c12 the corpus bigram count, c1 = Σ_w c12(w1, w) the context
    count (derived from the bigram table, so the math is self-consistent
    and the oracle can reproduce it with two GROUP BYs), and V the
    distinct-token vocabulary size. Docs with < 2 tokens emit no row
    (they have no bigram — same as the SQL join).

    Shape: one tokenizer pass → materialized (doc, w1, w2, m) pair table
    (consumed twice: LM fit + scoring) → bigram-bucket exchange for c12
    (input is Σ per-doc distinct bigrams, not the token stream) → c1 by
    folding the vocab-bounded bigram table itself. Scoring is GATED like
    the PMI/df attach:

    - bigram vocab ≤ ``broadcast_vocab_limit``: (w1·w2 → c12) and
      (w1 → c1) ship once via ``ray.put`` sorted arrays; scoring is
      map-only over the pair stream (every pair hits — the LM was fit on
      the same corpus).
    - above: two tagged-union bucket exchanges zip c12 then c1 onto the
      pair stream (the doc_df_score shuffle-attach pattern).

    Both paths end in ONE int-bucket exchange on doc_id summing per-batch
    partials. V needs the unigram vocabulary (single-token docs count),
    one extra vocab-bounded pass via `term_counts_dataset`; at 100 TB
    fuse it into the tokenizer pass if the extra scan matters."""
    import pandas as pd
    import ray

    from ..functions.shuffles import bucketed_group_apply

    pairs = ds.map_batches(
        lambda b: _doc_bigram_rows(b, text_col), batch_format="pyarrow",
    ).materialize()

    def bg_merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["w1", "w2"]).aggregate([("m", "sum")])
        return g.rename_columns(["w1", "w2", "c12"])

    bg_ds = bucketed_group_apply(
        pairs, ["w1", "w2"], bg_merge, n_buckets=n_buckets,
        batch_format="pyarrow",
    ).materialize()

    def cx_merge(t: pa.Table) -> pa.Table:
        g = t.group_by("w1").aggregate([("c12", "sum")])
        return g.rename_columns(["w1", "c1"])

    cx_ds = bucketed_group_apply(
        bg_ds, ["w1"], cx_merge, n_buckets=n_buckets,
        batch_format="pyarrow",
    ).materialize()

    v_size = float(term_counts_dataset(ds, text_col).count())

    def _pair_key(w1, w2) -> np.ndarray:
        # CAUTION: `series + "\x00"` and numpy object-array `+ "\x00"`
        # both silently DROP the NUL (the scalar is converted through a
        # NUL-terminated numpy str first), which would make ("ab","c")
        # and ("a","bc") collide; Series + Series of real Python strings
        # preserves it (regression-tested with exactly that pair)
        import pandas as pd

        n = len(w1)
        sep = pd.Series(["\x00"] * n)
        return (pd.Series(w1, dtype=object).reset_index(drop=True) + sep
                + pd.Series(w2, dtype=object).reset_index(drop=True)
                ).to_numpy(dtype=object)

    if bg_ds.count() <= broadcast_vocab_limit:
        bgp = bg_ds.to_pandas()  # bigram-vocab-sized (the gate's bound)
        gk = _pair_key(bgp["w1"].to_numpy(dtype=object),
                       bgp["w2"].to_numpy(dtype=object))
        srt = np.argsort(gk)
        bg_ref = ray.put((gk[srt], bgp["c12"].to_numpy(np.int64)[srt]))
        cxp = cx_ds.to_pandas()
        ck = cxp["w1"].to_numpy(dtype=object)
        srt2 = np.argsort(ck)
        cx_ref = ray.put((ck[srt2], cxp["c1"].to_numpy(np.int64)[srt2]))

        def score_part(b: pa.Table) -> pa.Table:
            gks, c12s = ray.get(bg_ref)
            cks, c1s = ray.get(cx_ref)
            w1 = b["w1"].to_numpy(zero_copy_only=False)
            w2 = b["w2"].to_numpy(zero_copy_only=False)
            k = _pair_key(w1, w2)
            c12 = c12s[np.searchsorted(gks, k)]
            c1 = c1s[np.searchsorted(cks, w1)]
            m = b["m"].to_numpy(zero_copy_only=False)
            lp = np.log(c12 + 1.0) - np.log(c1 + v_size)
            d = b["doc_id"].to_numpy(zero_copy_only=False)
            u, inv = np.unique(d, return_inverse=True)
            n = np.zeros(len(u), np.int64)
            np.add.at(n, inv, m)
            s = np.zeros(len(u), np.float64)
            np.add.at(s, inv, m * lp)
            return pa.table({
                "doc_id": pa.array(u), "n": pa.array(n), "s": pa.array(s),
            })

        parts = pairs.map_batches(score_part, batch_format="pyarrow")
    else:
        def pr_rows(b: pa.Table) -> pa.Table:
            z = pa.array(np.zeros(b.num_rows, np.int64))
            return pa.table({
                "w1": b["w1"], "w2": b["w2"], "doc_id": b["doc_id"],
                "m": b["m"], "c": z,
                "kind": pa.array(np.zeros(b.num_rows, np.int8)),
            })

        def bg_rows(b: pa.Table) -> pa.Table:
            z64 = pa.array(np.zeros(b.num_rows, np.int64))
            return pa.table({
                "w1": b["w1"], "w2": b["w2"], "doc_id": z64, "m": z64,
                "c": b["c12"],
                "kind": pa.array(np.ones(b.num_rows, np.int8)),
            })

        def zip_c12(g: pd.DataFrame) -> pd.DataFrame:
            lm = g.loc[g["kind"] == 1, ["w1", "w2", "c"]]
            pr = g.loc[g["kind"] == 0, ["w1", "w2", "doc_id", "m"]]
            return pr.merge(lm, on=["w1", "w2"])[
                ["w1", "doc_id", "m", "c"]].rename(columns={"c": "c12"})

        with_c12 = bucketed_group_apply(
            pairs.map_batches(pr_rows, batch_format="pyarrow").union(
                bg_ds.map_batches(bg_rows, batch_format="pyarrow")),
            ["w1", "w2"], zip_c12, n_buckets=n_buckets,
        )

        def pr2_rows(b: pa.Table) -> pa.Table:
            return pa.table({
                "w1": b["w1"], "doc_id": b["doc_id"], "m": b["m"],
                "c12": b["c12"],
                "c": pa.array(np.zeros(b.num_rows, np.int64)),
                "kind": pa.array(np.zeros(b.num_rows, np.int8)),
            })

        def cx_rows(b: pa.Table) -> pa.Table:
            z64 = pa.array(np.zeros(b.num_rows, np.int64))
            return pa.table({
                "w1": b["w1"], "doc_id": z64, "m": z64, "c12": z64,
                "c": b["c1"],
                "kind": pa.array(np.ones(b.num_rows, np.int8)),
            })

        def zip_c1(g: pd.DataFrame) -> pd.DataFrame:
            cx = g.loc[g["kind"] == 1, ["w1", "c"]]
            pr = g.loc[g["kind"] == 0, ["w1", "doc_id", "m", "c12"]]
            j = pr.merge(cx, on="w1")
            m = j["m"].to_numpy(dtype=np.int64)
            lp = (np.log(j["c12"].to_numpy(np.int64) + 1.0)
                  - np.log(j["c"].to_numpy(np.int64) + v_size))
            return pd.DataFrame({
                "doc_id": j["doc_id"], "n": m, "s": m * lp,
            })

        parts = bucketed_group_apply(
            with_c12.map_batches(pr2_rows, batch_format="pyarrow").union(
                cx_ds.map_batches(cx_rows, batch_format="pyarrow")),
            ["w1"], zip_c1, n_buckets=n_buckets,
        )

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("n", "sum"), ("s", "sum")])
        n = g["n_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = g["s_sum"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": g["doc_id"],
            "n_bigrams": g["n_sum"],
            "lm_logprob": pa.array(np.round(s, 6), pa.float64()),
            "lm_ppl": pa.array(np.round(np.exp(-s / n), 6), pa.float64()),
        })

    out = bucketed_group_apply(
        parts, ["doc_id"], fold, n_buckets=n_buckets,
        batch_format="pyarrow",
    )
    import ray.data as rd

    sch = ds.schema()
    doc_t = dict(zip(sch.names, sch.types)).get("doc_id", pa.int64())
    typed_empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], doc_t),
        "n_bigrams": pa.array([], pa.int64()),
        "lm_logprob": pa.array([], pa.float64()),
        "lm_ppl": pa.array([], pa.float64()),
    }))
    return out.union(typed_empty)


# ----------------------------------------------------- corpus-law statistics
def zipf_fit_dataset(ds, top_n: int = 1000, text_col: str = "text"):
    """Corpus-law diagnostics in one row → (n_top, vocab_size,
    total_tokens, zipf_slope, zipf_intercept): a least-squares fit of
    ln(freq) on ln(rank) over the exact top-``top_n`` terms (Zipf's law
    predicts slope ≈ −1; a corpus whose slope drifts far off is usually
    template/boilerplate-heavy — a cheap corpus-health gate next to the
    per-doc quality scores), plus the Heaps-law substrate (vocabulary
    size and token count as exact ints).

    Shape: the one term-count exchange everything else here shares →
    exact top-N (vocab-bounded sort, N rows out) → the regression is a
    closed-form fold over N scalars on the driver; vocab/token totals are
    Dataset count()/sum() over the counts table. Slope/intercept round-6
    (sums of N=1000 logs — same tolerance contract as tfidf)."""
    counts = term_counts_dataset(ds, text_col).materialize()
    vocab_size = counts.count()
    total_tokens = counts.sum(on="n") or 0
    top = (counts.sort(["n", "term"], descending=[True, False])
           .limit(top_n).to_pandas())          # N rows (the gate's bound)
    k = len(top)
    if k == 0:
        return pa.table({
            "n_top": pa.array([], pa.int64()),
            "vocab_size": pa.array([], pa.int64()),
            "total_tokens": pa.array([], pa.int64()),
            "zipf_slope": pa.array([], pa.float64()),
            "zipf_intercept": pa.array([], pa.float64()),
        })
    x = np.log(np.arange(1, k + 1, dtype=np.float64))
    y = np.log(top["n"].to_numpy(dtype=np.float64))
    sx, sy = x.sum(), y.sum()
    sxy, sxx = (x * y).sum(), (x * x).sum()
    den = k * sxx - sx * sx
    # k=1 (or a degenerate x) has no slope: mirror the oracle's CASE → 0.0
    # (the assortativity zero-denominator contract, ADVICE r3 #1)
    slope = (k * sxy - sx * sy) / den if den != 0 else 0.0
    intercept = (sy - slope * sx) / k
    return pa.table({
        "n_top": pa.array([k], pa.int64()),
        "vocab_size": pa.array([int(vocab_size)], pa.int64()),
        "total_tokens": pa.array([int(total_tokens)], pa.int64()),
        "zipf_slope": pa.array([round(float(slope), 6)], pa.float64()),
        "zipf_intercept": pa.array([round(float(intercept), 6)],
                                   pa.float64()),
    })


def term_divergence_dataset(ds, split_fn=None, category_col: str = "source",
                            text_col: str = "text", n_buckets: int = 16):
    """Corpus-drift divergence between two sub-corpora → ONE row
    (n_a, n_b, vocab, kl_ab, kl_ba, js): add-one-smoothed unigram
    distributions P (side a) and Q (side b) over the union vocabulary,

        kl_ab = Σ p ln(p/q),  kl_ba = Σ q ln(q/p),
        js    = (Σ p ln(2p/(p+q)) + Σ q ln(2q/(p+q))) / 2

    with p = (c_a+1)/(n_a+V), q = (c_b+1)/(n_b+V) — the corpus-mix drift
    monitor a continuously-ingesting pipeline runs between snapshots /
    sources (rising JS = the crawl changed under you).

    ``split_fn(category) -> 'a' | 'b'`` assigns sides (default: docs with
    even-indexed sources are 'a'). Shape: the `term_category_assoc`
    (term, side) cell exchange → per-bucket partial divergence sums
    (vocab-bounded, computed WHERE THE CELLS LIVE — only 6 scalars per
    bucket reach the driver) → closed-form driver fold, round-6."""
    from ..functions.shuffles import bucketed_group_apply

    if split_fn is None:
        def split_fn(src):
            return "a" if int(src[3:]) % 2 == 0 else "b"

    def partial(b: pa.Table) -> pa.Table:
        from .dedup import tokenize_batch_flat

        cats = b[category_col]
        if isinstance(cats, pa.ChunkedArray):
            cats = cats.combine_chunks()
        ids, offsets, _, vb = tokenize_batch_flat(b[text_col],
                                                  return_vocab=True)
        if not len(ids):
            return pa.table({"term": pa.array([], pa.string()),
                             "side": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        sides = np.array([split_fn(s) == "a" for s in cats.to_pylist()])
        doc_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                            np.diff(offsets))
        comp = ids * np.int64(2) + (~sides[doc_idx]).astype(np.int64)
        u, cnt = np.unique(comp, return_counts=True)
        va = np.array(vb, dtype=object)
        return pa.table({
            "term": pa.array(va[u // 2].tolist(), pa.string()),
            "side": pa.array(np.where(u % 2 == 0, "a", "b").tolist(),
                             pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["term", "side"]).aggregate([("n", "sum")])
        return g.rename_columns(["term", "side", "n"])

    cells = bucketed_group_apply(parts, ["term"], merge,
                                 n_buckets=n_buckets,
                                 batch_format="pyarrow").materialize()

    # side totals + vocab size: bounded folds over the cell table
    n_a = n_b = vocab = 0
    tot_parts = []

    def side_tot(b: pa.Table) -> pa.Table:
        g = b.group_by("side").aggregate([("n", "sum")])
        return g.rename_columns(["side", "n"])

    for b in cells.map_batches(side_tot, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for s, v in zip(b["side"].to_pylist(), b["n"].to_numpy()):
            if s == "a":
                n_a += int(v)
            else:
                n_b += int(v)

    def vocab_count(t: pa.Table) -> pa.Table:
        # runs inside bucketed_group_apply → t is a WHOLE bucket (all
        # rows of a term together), so per-bucket distinct is globally
        # exact — a raw map_batches here would double-count a term whose
        # (a)/(b) rows straddle a dynamic block split of the cell table
        u = pa.compute.unique(t["term"].combine_chunks()
                              if isinstance(t["term"], pa.ChunkedArray)
                              else t["term"])
        return pa.table({"c": pa.array([len(u)], pa.int64())})

    vocab = sum(r["c"] for r in bucketed_group_apply(
        cells, ["term"], vocab_count, n_buckets=n_buckets,
        batch_format="pyarrow").take_all())
    if vocab == 0:
        return pa.table({
            "n_a": pa.array([], pa.int64()), "n_b": pa.array([], pa.int64()),
            "vocab": pa.array([], pa.int64()),
            "kl_ab": pa.array([], pa.float64()),
            "kl_ba": pa.array([], pa.float64()),
            "js": pa.array([], pa.float64()),
        })
    den_a, den_b = float(n_a + vocab), float(n_b + vocab)

    def div_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas().pivot_table(index="term", columns="side",
                                       values="n", fill_value=0,
                                       aggfunc="sum")
        ca = df["a"].to_numpy(np.float64) if "a" in df else \
            np.zeros(len(df))
        cb = df["b"].to_numpy(np.float64) if "b" in df else \
            np.zeros(len(df))
        p, q = (ca + 1.0) / den_a, (cb + 1.0) / den_b
        m = 0.5 * (p + q)
        return pa.table({
            "kl_ab": pa.array([float(np.sum(p * np.log(p / q)))]),
            "kl_ba": pa.array([float(np.sum(q * np.log(q / p)))]),
            "js_a": pa.array([float(np.sum(p * np.log(p / m)))]),
            "js_b": pa.array([float(np.sum(q * np.log(q / m)))]),
            "nt": pa.array([len(df)], pa.int64()),
        })

    kl_ab = kl_ba = js_a = js_b = 0.0
    seen = 0
    # n_buckets 5-scalar rows to the driver
    for r in bucketed_group_apply(cells, ["term"], div_partial,
                                  n_buckets=n_buckets,
                                  batch_format="pyarrow").take_all():
        kl_ab += r["kl_ab"]; kl_ba += r["kl_ba"]
        js_a += r["js_a"]; js_b += r["js_b"]; seen += r["nt"]
    # terms ABSENT from the cell union contribute nothing extra: the
    # union vocab is exactly the cell table's terms (seen == vocab)
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "vocab": pa.array([int(vocab)], pa.int64()),
        "kl_ab": pa.array([round(kl_ab, 6)], pa.float64()),
        "kl_ba": pa.array([round(kl_ba, 6)], pa.float64()),
        "js": pa.array([round(0.5 * (js_a + js_b), 6)], pa.float64()),
    })
