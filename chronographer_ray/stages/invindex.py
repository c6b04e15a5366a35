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


def _index_n_parts(root: str, default: int) -> int:
    """Partition count as RECORDED by the build (root manifest) — a probe
    that trusts its caller's n_parts against an index built with a
    different count silently reads the wrong partitions and returns
    empty. Falls back to ``default`` for manifest-less roots."""
    import json

    try:
        with open(os.path.join(root, "_manifest.json")) as f:
            return int(json.load(f)["n_parts"])
    except (OSError, KeyError, ValueError, TypeError):
        return default


def search_index(root: str, terms: list[str], mode: str = "and",
                 id_col: str = "doc_id", n_parts: int = 32):
    """Boolean search over a built index → Dataset of (doc_id, score):
    docs containing ALL (``and``) or ANY (``or``) query terms, score =
    total tf of the matched terms. Reads ONLY the partitions the terms
    hash into; the aggregate runs over that pruned sliver."""
    import pyarrow.compute as pc
    import ray.data as rd

    n_parts = _index_n_parts(root, n_parts)
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


def positional_postings_batch(b: pa.Table, text_col: str = "text",
                              id_col: str = "doc_id") -> pa.Table:
    """(term, doc_id, pos) rows for one batch — pos is the 0-based token
    index within the doc (the flat tokenizer preserves token order, and
    its empty-token masking rebuilds offsets, so pos matches
    ``text.lower().split()`` indices exactly)."""
    ids, offsets, _, vocab = tokenize_batch_flat(b[text_col],
                                                 return_vocab=True)
    if not ids.size:
        return pa.table({"term": pa.array([], pa.string()),
                         id_col: pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64())})
    lens = np.diff(offsets)
    doc_idx = np.repeat(np.arange(lens.size), lens)
    pos = np.arange(ids.size, dtype=np.int64) - offsets[:-1][doc_idx]
    doc_ids = b[id_col].to_numpy(zero_copy_only=False)
    varr = pa.array(vocab, pa.string())
    return pa.table({
        "term": varr.take(pa.array(ids, pa.int64())),
        id_col: pa.array(doc_ids[doc_idx], pa.int64()),
        "pos": pa.array(pos),
    })


def build_positional_index(docs, root: str, text_col: str = "text",
                           id_col: str = "doc_id",
                           n_parts: int = 32) -> dict:
    """Materialize a POSITIONAL postings index under ``root`` (same
    resumable crc-hash partitioning as the tf index; ~len(doc) rows per
    doc instead of ~distinct(doc), the classic positional-index cost)."""
    postings = docs.map_batches(
        lambda b: positional_postings_batch(b, text_col, id_col),
        batch_format="pyarrow",
    )
    return write_resumable(postings, root, key_col="term", n_parts=n_parts)


def phrase_search(root: str, phrase: list[str], id_col: str = "doc_id",
                  n_parts: int = 32):
    """Exact phrase query over a positional index → (doc_id, n_matches):
    docs containing the tokens of ``phrase`` CONSECUTIVELY, with the
    number of occurrences.

    Anchor trick, fully vectorized: an occurrence of phrase slot i at
    token position p votes for anchor ``p - i``; a true phrase match at
    anchor a is an anchor with votes from ALL k slots, so one grouped
    distinct-count per (doc, anchor) decides every candidate at once —
    no per-doc Python loop, no windowed scan. Repeated phrase words
    (k slots per term) fall out naturally. Reads ONLY the ≤ |phrase|
    partitions the words hash into; one int-bucket exchange keyed on
    doc_id scores each doc's candidates locally."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.shuffles import bucketed_group_apply

    n_parts = _index_n_parts(root, n_parts)
    k = len(phrase)
    slots: dict[str, list[int]] = {}
    for i, t in enumerate(phrase):
        slots.setdefault(t, []).append(i)
    term_set = sorted(slots)

    dirs = [
        d for i in _term_parts(term_set, n_parts)
        if glob.glob(os.path.join(d := os.path.join(root, "data", f"part={i}"),
                                  "*.parquet"))
    ]
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "n_matches": pa.array([], pa.int64())})
    if not dirs or k == 0:
        return rd.from_arrow(empty)
    ds = rd.read_parquet(dirs, file_extensions=["parquet"])

    def anchors(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["term"], value_set=pa.array(term_set)))
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "anchor": pa.array([], pa.int64()),
                             "slot": pa.array([], pa.int64())})
        docs_np = t[id_col].to_numpy(zero_copy_only=False)
        pos_np = t["pos"].to_numpy(zero_copy_only=False)
        terms_np = t["term"].to_numpy(zero_copy_only=False)
        out_d, out_a, out_s = [], [], []
        for term, idxs in slots.items():  # ≤ k iterations, vector body
            m = terms_np == term
            for i in idxs:
                out_d.append(docs_np[m])
                out_a.append(pos_np[m] - i)
                out_s.append(np.full(int(m.sum()), i, np.int64))
        return pa.table({
            id_col: pa.array(np.concatenate(out_d).astype(np.int64)),
            "anchor": pa.array(np.concatenate(out_a).astype(np.int64)),
            "slot": pa.array(np.concatenate(out_s)),
        })

    votes = ds.map_batches(anchors, batch_format="pyarrow")

    def score(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["anchor"] >= 0]
        full = (
            g.groupby([id_col, "anchor"])["slot"].nunique()
            .reset_index(name="n_slots")
        )
        full = full[full["n_slots"] == k]
        out = full.groupby(id_col).size().reset_index(name="n_matches")
        out["n_matches"] = out["n_matches"].astype(np.int64)
        return out

    scored = bucketed_group_apply(votes, [id_col], score, n_buckets=8)
    # union one typed empty block: a phrase with ZERO matches must still
    # yield a schema-carrying Dataset (all-empty map_groups output loses
    # the schema through to_pandas — Ray-wide caveat)
    return scored.union(rd.from_arrow(empty))


def build_bm25_index(docs, root: str, text_col: str = "text",
                     id_col: str = "doc_id", n_parts: int = 32) -> dict:
    """Postings index + the two BM25 sidecars: a (doc_id, len) doc-length
    table and corpus stats (n_docs, total_len). Lengths come from the
    same flat tokenizer as the postings, so len(doc) == sum(tf) exactly;
    stats are two scalars — a 100 TB build would fold them the same way
    (map partials → two ints). Returns the build manifest plus stats."""
    manifest = build_inverted_index(docs, root, text_col, id_col, n_parts)

    def doclens(b: pa.Table) -> pa.Table:
        _, offsets, _, _ = tokenize_batch_flat(b[text_col],
                                               return_vocab=True)
        lens = np.diff(offsets).astype(np.int64)
        return pa.table({
            id_col: pa.array(
                b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)),
            "len": pa.array(lens),
        })

    dl = docs.map_batches(doclens, batch_format="pyarrow")
    dl_dir = os.path.join(root, "doclen")
    dl.write_parquet(dl_dir)
    stats_ds = __import__("ray").data.read_parquet(
        dl_dir, file_extensions=["parquet"])
    n_docs = stats_ds.count()
    total_len = stats_ds.sum(on="len") or 0
    stats = {"n_docs": int(n_docs), "total_len": int(total_len)}
    import json
    with open(os.path.join(root, "stats.json"), "w") as f:
        json.dump(stats, f)
    manifest = dict(manifest or {})
    manifest.update(stats)
    return manifest


def bm25_search(root: str, terms: list[str], topk: int = 20,
                id_col: str = "doc_id", n_parts: int = 32):
    """Ranked retrieval over a ``build_bm25_index`` index → top-k
    (doc_id, score) by a BM25-style weight with ODDS-RATIO idf:

        idf(t) = (N - df + 0.5) / (df + 0.5)              [no log]
        s(d,t) = idf(t) * (tf*2.2) / (tf + 1.2*(0.25 + 0.75*len/avglen))
        score(d) = Σ_t s(d,t)   (terms in sorted order, left-assoc)

    The classic ln(idf+1) is deliberately dropped: transcendental libm
    results differ in the last ulp across engines, which would break the
    hash-exact oracle; every operation above (int promotion, IEEE
    divide/multiply/add in a FIXED left-assoc order) is bit-reproducible
    by DuckDB, so the float scores hash-match. Monotone in the same tf /
    df / length signals as BM25 (k1=1.2, b=0.75 shape preserved).

    Scale: the read opens only the ≤|terms| hash partitions; df per term
    is a |terms|-bounded fold over that sliver; the doc-length attach is
    one int-bucket exchange keyed on doc_id; top-k is a distributed sort
    of the matched docs only."""
    import json

    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.shuffles import bucketed_group_apply

    n_parts = _index_n_parts(root, n_parts)
    term_sorted = sorted(set(terms))
    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    n_docs, total_len = stats["n_docs"], stats["total_len"]
    avglen = float(total_len) / n_docs  # same division as the oracle's

    dirs = [
        d for i in _term_parts(term_sorted, n_parts)
        if glob.glob(os.path.join(d := os.path.join(root, "data", f"part={i}"),
                                  "*.parquet"))
    ]
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if not dirs:
        return rd.from_arrow(empty)

    ds = rd.read_parquet(dirs, file_extensions=["parquet"])

    def hits(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["term"], value_set=pa.array(term_sorted)))
        return t.select([id_col, "term", "tf"])

    matched = ds.map_batches(hits, batch_format="pyarrow").materialize()

    # df fold: ≤ |terms| × n_blocks partial rows
    def df_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("term").aggregate([([], "count_all")])
        return g.rename_columns(["term", "df"])

    df_pd = matched.map_batches(
        df_partial, batch_format="pyarrow").to_pandas()
    df_map = df_pd.groupby("term")["df"].sum().to_dict()
    # idf from exact ints, same expression order as the oracle
    idf_map = {
        t: ((n_docs - int(df)) + 0.5) / (int(df) + 0.5)
        for t, df in df_map.items()
    }

    dl = rd.read_parquet(os.path.join(root, "doclen"),
                         file_extensions=["parquet"])

    def m_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col], "term": b["term"], "tf": b["tf"],
            "len": pa.array(np.zeros(b.num_rows, np.int64)),
            "kind": pa.array(np.zeros(b.num_rows, np.int8)),
        })

    def dl_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "term": pa.nulls(b.num_rows, pa.string()),
            "tf": pa.array(np.zeros(b.num_rows, np.int64)),
            "len": b["len"],
            "kind": pa.array(np.ones(b.num_rows, np.int8)),
        })

    def score(g: "pd.DataFrame") -> "pd.DataFrame":
        m = g[g["kind"] == 0]
        if m.empty:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.float64)})
        lens = g.loc[g["kind"] == 1, [id_col, "len"]]
        mm = m[[id_col, "term", "tf"]].merge(lens, on=id_col)
        tf = mm["tf"].to_numpy().astype(np.float64)
        ln = mm["len"].to_numpy().astype(np.float64)
        idf = mm["term"].map(idf_map).to_numpy().astype(np.float64)
        s = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (ln / avglen))))
        mm = mm.assign(s=s)
        piv = mm.pivot_table(index=id_col, columns="term", values="s",
                             aggfunc="first")
        total = np.zeros(len(piv), np.float64)
        for t in term_sorted:  # fixed left-assoc order, COALESCE 0
            if t in piv.columns:
                total = total + piv[t].fillna(0.0).to_numpy()
        return pd.DataFrame({id_col: piv.index.to_numpy(), "score": total})

    scored = bucketed_group_apply(
        matched.map_batches(m_rows, batch_format="pyarrow").union(
            dl.map_batches(dl_rows, batch_format="pyarrow")),
        [id_col], score, n_buckets=8,
    )
    return scored.sort(["score", id_col],
                       descending=[True, False]).limit(topk)
