"""Text-analysis kernels: token counting, quality signals, language ID,
document fingerprinting.

All kernels are SQL-mirrorable by construction (the DuckDB oracles in
``__ray_entry__.oracle_sql`` compute the same values), vectorized per batch,
and run as plain ``map_batches`` tasks — no state, no shuffle.
"""
from __future__ import annotations

import hashlib
import re

import numpy as np

import pyarrow as pa

STOPWORDS = ("the", "a", "of", "and", "to")
PUNCT = ".,;:!?"
# ASCII whitespace class, NOT r"\s+": Python's \s on str is Unicode-aware,
# but every oracle normalizes with RE2 \s (ASCII) + DuckDB trim() (' ' only),
# so U+00A0-style whitespace must survive normalization on all sides
_WS = re.compile(r"[ \t\n\r\f\v]+")


def _tokens_and_counts(col):
    """Shared vectorized tokenization: (tokens list-array, word_count int64).

    ``split_pattern_regex`` on the trimmed text; all-whitespace/empty rows
    (which split to ``['']``) are masked to zero tokens — byte-identical to
    DuckDB's ``regexp_split_to_array(trim(x, ' '), '\\s+')`` guarded on
    ``trim(x, ' ') = ''``. Trim is the explicit ASCII-space class (not
    ``utf8_trim_whitespace``): RE2 ``\\s`` is ASCII-only, so a doc edged
    with U+00A0 must keep it in-token on both sides.
    """
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    trimmed = pc.utf8_trim(col, characters=" ")
    tokens = pc.split_pattern_regex(trimmed, r"\s+")
    empty = pc.equal(trimmed, "")
    counts = pc.if_else(
        empty, pa.scalar(0, pa.int64()), pc.cast(pc.list_value_length(tokens), pa.int64())
    )
    return tokens, counts, empty


def text_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc stats: char_count, word_count, stop_hits, punct_count.

    Counts are exact-integer (float ratios are left to the consumer) so the
    DuckDB oracle matches bit-for-bit. Fully vectorized: Arrow string
    kernels + one bincount over the flattened token array (no per-row
    Python loop — this runs per batch over the whole corpus)."""
    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    n = len(col)
    tokens, word_count, empty = _tokens_and_counts(col)

    # stop_hits: flatten tokens, is_in stopwords, segment-sum by parent row
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
    hits = pc.is_in(flat, value_set=pa.array(list(STOPWORDS), pa.string())).to_numpy(
        zero_copy_only=False
    )
    stop_hits = np.bincount(parent[hits], minlength=n).astype(np.int64)
    stop_hits[empty.to_numpy(zero_copy_only=False)] = 0

    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    out = out.append_column("char_count", pc.cast(pc.utf8_length(col), pa.int64()))
    out = out.append_column("word_count", word_count)
    out = out.append_column("stop_hits", pa.array(stop_hits, pa.int64()))
    out = out.append_column(
        "punct_count",
        pc.cast(pc.count_substring_regex(col, f"[{re.escape(PUNCT)}]"), pa.int64()),
    )
    return out


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n-gram-free heuristic language ID: 'en' iff any stopword token occurs.

    Deliberately simple & deterministic (the corpus is synthetic); a real
    n-gram model drops into the same kernel shape. Vectorized: token
    is_in + bincount of hits per row."""
    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    n = len(col)
    tokens, _, empty = _tokens_and_counts(col)
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
    hits = pc.is_in(flat, value_set=pa.array(list(STOPWORDS), pa.string())).to_numpy(
        zero_copy_only=False
    )
    any_hit = np.bincount(parent[hits], minlength=n) > 0
    any_hit[empty.to_numpy(zero_copy_only=False)] = False
    langs = np.where(any_hit, "en", "unk")
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    return out.append_column("lang_pred", pa.array(langs.tolist(), pa.string()))


def normalize_text(t: str) -> str:
    # strip(' ') not strip(): Unicode whitespace at the edges must survive,
    # matching DuckDB trim(x, ' ') in the oracles and the Arrow kernels'
    # utf8_trim(' ') — bare DuckDB trim() strips Unicode Zs, Python strip()
    # strips all Unicode whitespace; only the explicit ASCII-space class
    # is expressible identically on all three sides
    return _WS.sub(" ", (t or "").lower()).strip(" ")


def ascii_tokens(t: str) -> list[str]:
    """lower + ASCII-whitespace split — THE per-doc tokenization contract,
    matching ``pc.ascii_split_whitespace`` (tokenize_batch_flat) and the
    oracles' ``regexp_split_to_array(trim(x, ' '), '\\s+')``. Plain
    ``str.split()`` splits on Unicode whitespace (NBSP, NEL) and diverges."""
    return [w for w in _WS.split((t or "").lower()) if w]


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """MD5 fingerprint of whitespace-collapsed lowercase text (doc identity
    key for exact dedup; mirrors ``md5(trim(regexp_replace(lower(text),
    '\\s+', ' ', 'g')))`` in SQL)."""
    texts = batch[text_col].to_pylist()
    fps = [hashlib.md5(normalize_text(t).encode("utf-8")).hexdigest() for t in texts]
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    return out.append_column("fingerprint", pa.array(fps, pa.string()))


_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Token counting two ways: whitespace words and a BPE-ish regex
    (letter runs | digit runs | single punctuation — the
    lookahead-free core of GPT-2's pattern, chosen so the DuckDB oracle
    can mirror it with ``regexp_extract_all``). Vectorized: Arrow
    count_substring_regex (non-overlapping match count ≡ ``findall``)."""
    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    _, ws, _ = _tokens_and_counts(col)
    bpe = pc.cast(
        pc.count_substring_regex(col, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), pa.int64()
    )
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    out = out.append_column("ws_tokens", ws)
    return out.append_column("bpe_tokens", bpe)


def _doc_term_tf(col):
    """Vectorized per-batch (row, term-code, tf) extraction over lowercased
    whitespace tokens. Returns ``(uparent, ucode, tf, vocab_np)`` where
    ``uparent``/``ucode`` index the batch row and the batch-local vocabulary
    for each distinct (doc, term) pair. Tokens from empty/all-whitespace rows
    are masked out (split of '' yields [''])."""
    import pyarrow.compute as pc

    low = pc.utf8_lower(col)
    tokens, _, empty = _tokens_and_counts(low)
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
    nonempty = ~empty.to_numpy(zero_copy_only=False)[parent]
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab_np = np.array(denc.dictionary.to_pylist(), dtype=object)
    parent, codes = parent[nonempty], codes[nonempty]
    nv = max(len(vocab_np), 1)
    key = parent.astype(np.int64) * nv + codes
    uk, tf = np.unique(key, return_counts=True)
    return uk // nv, uk % nv, tf.astype(np.int64), vocab_np


def df_partial_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Pass-1 map-side combiner for TF-IDF: per-batch partial document
    frequency (distinct docs containing each term) plus a sentinel row
    (term='', df = number of non-empty docs in the batch). The downstream
    ``groupby('term').sum()`` shuffle is vocabulary-sized, not corpus-sized,
    because this combine already collapsed per-doc repeats."""
    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    uparent, ucode, _, vocab_np = _doc_term_tf(col)
    df = np.bincount(ucode, minlength=len(vocab_np)).astype(np.int64)
    present = df > 0
    n_nonempty = int(np.unique(uparent).size)
    terms = np.concatenate([vocab_np[present], np.array([""], dtype=object)])
    dfs = np.concatenate([df[present], np.array([n_nonempty], dtype=np.int64)])
    return pa.table({"term": pa.array(terms.tolist(), pa.string()),
                     "df": pa.array(dfs, pa.int64())})


class TfIdfTopK:
    """Pass-2 scorer: tf·ln(N/df) per (doc, term), top-``k`` terms per doc
    (score desc, term asc; scores rounded to 6 dp before ranking so the
    DuckDB oracle's ``row_number()`` tie-break agrees bit-for-bit).

    The idf table arrives as a ``ray.put`` ObjectRef (broadcast once per
    node, fetched once per task) holding (sorted term array, idf array);
    lookup is a binary search per batch-local vocab entry, not per token.
    Valid while the vocabulary fits in worker memory — at web scale swap
    pass 2's broadcast for a ``Dataset.join`` on term followed by a doc-key
    bucketed top-k (shape documented in ``tfidf_topk_dataset``)."""

    def __init__(self, idf_ref, k: int = 3, text_col: str = "text"):
        import ray

        self.terms_sorted, self.idf_vals = ray.get(idf_ref)
        self.k = k
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        uparent, ucode, tf, vocab_np = _doc_term_tf(col)
        if len(uparent) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tfidf": pa.array([], pa.float64())})
        idf_arr = self.idf_vals[np.searchsorted(self.terms_sorted, vocab_np)]
        score = np.round(tf.astype(np.float64) * idf_arr[ucode], 6)
        # lexicographic rank of each vocab term for the ascending tie-break
        vrank = np.empty(len(vocab_np), dtype=np.int64)
        vrank[np.argsort(vocab_np)] = np.arange(len(vocab_np))
        order = np.lexsort((vrank[ucode], -score, uparent))
        p_sorted = uparent[order]
        starts = np.flatnonzero(np.r_[True, p_sorted[1:] != p_sorted[:-1]])
        sizes = np.diff(np.r_[starts, len(p_sorted)])
        rank = np.arange(len(p_sorted)) - np.repeat(starts, sizes)
        keep = order[rank < self.k]
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)[uparent[keep]]
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "term": pa.array(vocab_np[ucode[keep]].tolist(), pa.string()),
            "tfidf": pa.array(score[keep], pa.float64()),
        })


def tfidf_topk_dataset(ds, k: int = 3, text_col: str = "text"):
    """Top-``k`` TF-IDF terms per document, two passes over the corpus:

    1. ``map_batches(df_partial_batch)`` → ``groupby('term').sum()`` — the
       shuffle moves only (batch × batch-vocab) partial rows, pre-combined
       map-side; the result (global df + corpus doc count N) is
       vocabulary-sized and collected to the driver.
    2. ``ray.put`` the (term, idf) arrays once, re-scan the docs with
       :class:`TfIdfTopK` — scoring and per-doc top-k happen inside the
       batch (each row IS a whole doc), so no doc-key shuffle exists.

    Tokenizing twice is deliberate: a second scan is cheaper than
    materializing the exploded (doc, term, tf) table through a shuffle.
    At vocabularies beyond worker memory, replace the broadcast with
    ``exploded.join(df_table, on='term')`` + a bucketed per-doc top-k
    (``functions.shuffles.bucketed_group_apply`` on doc_id).

    Reference semantics: corpus-level informative-term extraction
    complements the reference's per-doc text stats (no direct reference
    counterpart — LLM-pipeline extension operator)."""
    import ray

    df_tbl = (
        ds.map_batches(lambda b: df_partial_batch(b, text_col),
                       batch_format="pyarrow")
        .groupby("term").sum("df")
        .to_pandas()
    )
    n_docs = int(df_tbl.loc[df_tbl["term"] == "", "sum(df)"].sum())
    df_tbl = df_tbl[df_tbl["term"] != ""]
    terms_sorted = df_tbl["term"].to_numpy(dtype=object)
    srt = np.argsort(terms_sorted)
    terms_sorted = terms_sorted[srt]
    idf_vals = np.log(n_docs / df_tbl["sum(df)"].to_numpy(dtype=np.float64)[srt])
    idf_ref = ray.put((terms_sorted, idf_vals))
    return ds.map_batches(
        TfIdfTopK, fn_constructor_kwargs={"idf_ref": idf_ref, "k": k,
                                          "text_col": text_col},
        batch_format="pyarrow", concurrency=(1, 8),
    )


_WINNOW_B = np.uint64(1099511628211)  # FNV prime — k-gram polynomial base
# cache-residency sweet spot for the whole-batch winnowing kernel under
# 32-worker bus contention (measured: 256 → 204k docs/s, 4096 → 20k)
WINNOW_BATCH_SIZE = 256


def _winnow_one(s: str, k: int, w: int, pows: np.ndarray) -> list[int]:
    """Fingerprints of ONE normalized text — fully vectorized: polynomial
    k-gram hashes over code points (k numpy ops, no per-position slice/crc
    allocation), then rightmost-window-min selection via a reversed-argmin
    over a sliding-window view, consecutive picks collapsed with a shift
    compare. ~40× the per-char Python loop it replaced."""
    if len(s) < k:
        if not s:
            return []
        # wrap to int64 so the value always fits the list<int64> column
        return [int((np.uint64(sum(ord(c) for c in s)) * _WINNOW_B).astype(np.int64))]
    cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    m = len(cp) - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):  # k is small (5): k vector ops, uint64 wraparound
        h += cp[j : j + m] * pows[j]
    if m <= w:
        return [int(h.min().astype(np.int64))]
    sw = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost min per window: argmin over the REVERSED window
    pos = np.arange(m - w + 1) + (w - 1) - sw[:, ::-1].argmin(axis=1)
    keep = np.empty(pos.size, dtype=bool)
    keep[0] = True
    np.not_equal(pos[1:], pos[:-1], out=keep[1:])  # collapse repeats
    return h[pos[keep]].astype(np.int64).tolist()


def winnowing_batch(batch: pa.Table, text_col: str = "text",
                    k: int = 5, w: int = 4) -> pa.Table:
    """Rolling-hash document fingerprinting (winnowing): polynomial hashes
    over character k-grams of the normalized text, then the minimum hash of
    each w-window (rightmost on ties), consecutive duplicates collapsed —
    the standard local-fingerprint scheme; two documents sharing any
    fingerprint share a k-gram region, robust to small edits.

    WHOLE-BATCH vectorized (the old per-doc `_winnow_one` loop measured
    42k docs/s at 1M docs — the last per-doc Python loop in the text
    family): one Arrow normalize pass (RE2 ``\\s+`` — the oracle's exact
    whitespace class; ASCII-equal to ``normalize_text``), ONE utf-32
    decode of the flat concatenated batch text, k vector ops for every
    k-gram in the batch at once, one sliding-window reversed-argmin for
    every window in the batch, doc boundaries handled by masks. Three
    doc regimes exactly as before: len<k → single sum·B hash,
    m=len-k+1 ≤ w → single min, else windows. Bit-identical to
    `_winnow_one` (differential-tested) and to the `winnowing_rows`
    SQL oracle.

    Map with ``batch_size≈256`` (see ``WINNOW_BATCH_SIZE``): the kernel's
    temporaries (flat hash array, sliding-window copies) must stay
    cache-resident under 32-worker bus contention — measured at 1M docs:
    256 → 204k docs/s, 1024 → 93k, 4096 → 20k, old per-doc loop → 42k."""
    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(pc.cast(col, pa.string()), "")
    # trim ' ' ONLY (not Unicode whitespace): RE2 \s is the ASCII class, so
    # after the collapse the edges hold either ' ' or non-ASCII whitespace
    # (e.g. U+00A0) — DuckDB's trim() keeps the latter, and the
    # winnowing_rows oracle must see byte-identical normalized text
    norm = pc.utf8_trim(
        pc.replace_substring_regex(
            pc.utf8_lower(col), pattern=r"\s+", replacement=" "),
        characters=" ")

    n_docs = len(norm)
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    lens = pc.utf8_length(norm).to_numpy(zero_copy_only=False).astype(
        np.int64)
    total = int(lens.sum())
    if total == 0:
        return out.append_column(
            "fingerprints",
            pa.array([[] for _ in range(n_docs)], pa.list_(pa.int64())))

    cp = np.frombuffer(
        "".join(norm.to_pylist()).encode("utf-32-le"), np.uint32
    ).astype(np.uint64)
    starts = np.concatenate(([0], np.cumsum(lens)))
    pows = _WINNOW_B ** np.arange(k - 1, -1, -1, dtype=np.uint64)

    # ---- tiny docs (0 < len < k): fingerprint = (Σ code points) · B
    csum = np.concatenate((np.zeros(1, np.uint64), np.cumsum(cp)))
    doc_sums = csum[starts[1:]] - csum[starts[:-1]]  # robust to len-0 docs
    tiny_mask = (lens > 0) & (lens < k)
    tiny_docs = np.nonzero(tiny_mask)[0]
    tiny_vals = doc_sums[tiny_mask] * _WINNOW_B

    # ---- k-gram hashes over the flat stream, boundary-crossing masked
    m_d = np.maximum(lens - (k - 1), 0)
    M = total - k + 1
    if M > 0 and m_d.sum() > 0:
        h = np.zeros(M, np.uint64)
        for j in range(k):  # k is small (5): k vector ops
            h += cp[j:j + M] * pows[j]
        gram_pos = np.arange(M)
        gram_doc = np.searchsorted(starts, gram_pos, side="right") - 1
        valid = gram_pos + k <= starts[gram_doc + 1]
        hv = h[valid]
        hdoc = gram_doc[valid]
    else:
        hv = np.array([], np.uint64)
        hdoc = np.array([], np.int64)

    # per-doc gram segments in hv are contiguous: exclusive cumsum of m_d
    gstart = np.concatenate(([0], np.cumsum(m_d)))
    docs_pos = np.nonzero(m_d > 0)[0]
    # reduceat is exact here: zero-gram docs occupy zero width, so each
    # listed start's segment ends exactly at the next listed start
    if docs_pos.size:
        seg_min = np.minimum.reduceat(hv, gstart[docs_pos])
    else:
        seg_min = np.array([], np.uint64)
    small_sel = m_d[docs_pos] <= w
    small_docs = docs_pos[small_sel]
    small_vals = seg_min[small_sel]

    # ---- big docs (m > w): every window in the batch in one argmin
    if hv.size >= w:
        sw = np.lib.stride_tricks.sliding_window_view(hv, w)
        q = np.arange(hv.size - w + 1)
        wd = hdoc[q]
        ok = (hdoc[q + w - 1] == wd) & (m_d[wd] > w)
        sw_ok = sw[ok]
        pos = q[ok] + (w - 1) - sw_ok[:, ::-1].argmin(axis=1)
        wd_ok = wd[ok]
        keep = np.empty(pos.size, dtype=bool)
        if pos.size:
            keep[0] = True
            keep[1:] = (pos[1:] != pos[:-1]) | (wd_ok[1:] != wd_ok[:-1])
        big_vals = hv[pos[keep]]
        big_docs = wd_ok[keep]
    else:
        big_vals = np.array([], np.uint64)
        big_docs = np.array([], np.int64)

    # ---- assemble per-doc lists (each doc is in exactly one regime;
    # stable sort preserves window order within a doc)
    all_docs = np.concatenate((tiny_docs, small_docs, big_docs))
    all_vals = np.concatenate((tiny_vals, small_vals, big_vals))
    order = np.argsort(all_docs, kind="stable")
    counts = np.bincount(all_docs.astype(np.int64), minlength=n_docs)
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    fp = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.array(all_vals[order].astype(np.int64), pa.int64()))
    return out.append_column("fingerprints", fp)


def unicode_normalize_batch(batch: pa.Table, text_col: str = "text",
                            form: str = "NFC") -> pa.Table:
    """Unicode hygiene: NFC(/NFKC) normalization + control-char strip +
    whitespace collapse + casefold — the canonicalization pass that runs
    before any fingerprint/shingle hashing on a real web corpus (mixed
    encodings make byte-identical dedup miss visually-identical text).
    Fully vectorized Arrow kernels; mirrors DuckDB
    ``nfc_normalize``/``regexp_replace``/``lower`` exactly.
    Returns (doc_id, norm_text, n_chars)."""
    import unicodedata

    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(pc.cast(col, pa.string()), "")
    # NFC via unicodedata on the NON-ASCII rows only: pyarrow 16's
    # utf8_normalize does not compose combining sequences (E+◌́ stays two
    # codepoints, diverging from DuckDB/CPython NFC), and ASCII text is
    # NFC-invariant — so the Python loop runs only where normalization can
    # matter, which on extracted web text is the minority of rows
    ascii_mask = pc.string_is_ascii(col).to_numpy(zero_copy_only=False)
    if not ascii_mask.all():
        vals = col.to_pylist()
        col = pa.array(
            [
                v if is_a else unicodedata.normalize(form, v)
                for v, is_a in zip(vals, ascii_mask)
            ],
            pa.string(),
        )
    col = pc.replace_substring_regex(col, r"[\x00-\x1f\x7f]", " ")
    col = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(col, r"\s+", " ")
    )
    col = pc.utf8_lower(col)
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    return out.append_column("norm_text", col).append_column(
        "n_chars", pc.cast(pc.utf8_length(col), pa.int64())
    )


def chunk_documents_dataset(ds, size: int = 32, stride: int = 24,
                            text_col: str = "text"):
    """RAG-style overlapping token windows → (doc_id, chunk_idx, chunk,
    n_tokens): tokens[i·stride : i·stride+size] for i = 0 ..
    ceil(max(n−size,0)/stride), no chunks for empty docs.

    Map-only (embarrassingly parallel — a chunk never crosses documents);
    whitespace tokens via the deterministic ASCII split (≡ RE2 ``\\S+``
    extraction, mirrored by the oracle's ``regexp_extract_all``); the
    join-per-chunk is inherent string object work, everything else is
    Arrow/numpy."""
    import math

    import pyarrow.compute as pc

    if stride > size or stride < 1:
        raise ValueError("overlap chunking requires 1 <= stride <= size "
                         "(stride > size would skip tokens and emit empty "
                         "tail windows)")

    def chunks(b: pa.Table) -> pa.Table:
        col = b[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.ascii_split_whitespace(pc.fill_null(col, ""))
        flat = lists.flatten()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        vals = flat.to_pandas().to_numpy()
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_idx, out_chunk, out_n = [], [], [], []
        start = 0
        for d, ln in zip(ids, lens):
            toks = vals[start:start + ln][nonempty[start:start + ln]]
            start += ln
            n = len(toks)
            if n == 0:
                continue
            n_chunks = 1 + math.ceil(max(n - size, 0) / stride)
            for i in range(n_chunks):
                w = toks[i * stride: i * stride + size]
                out_id.append(int(d))
                out_idx.append(i)
                out_chunk.append(" ".join(w))
                out_n.append(len(w))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "chunk": pa.array(out_chunk, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")


def kwic_snippets_batch(batch: pa.Table, term: str, window: int = 40,
                        text_col: str = "text") -> pa.Table:
    """Keyword-in-context extraction → (doc_id, pos, snippet) for docs
    containing ``term`` (case-sensitive, first occurrence): pos is the
    0-based CODEPOINT offset and snippet the codepoint slice
    [max(0, pos − window), +2·window) — the result-rendering stage of a
    search stack (the probe side of `stages/invindex` finds the docs;
    this shows WHY they matched).

    The corpus-wide match mask is one vectorized Arrow kernel; the
    position/slice math runs only on MATCHING rows and uses Python
    str.find/slicing because those are codepoint-exact — Arrow's
    ``find_substring`` returns BYTE offsets while its slicing counts
    codepoints, and mixing the two mis-windows any non-ASCII document
    (measured: find_substring('ééX','X') = 4, the byte offset). DuckDB's
    strpos/substr count characters, so the oracle agrees on every
    input, not just ASCII."""
    import pyarrow.compute as pc

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    hit = pc.match_substring(col, term)
    t = batch.filter(hit)
    texts = t[text_col].to_pylist()
    pos = np.array([s.find(term) for s in texts], np.int64)
    start = np.maximum(pos - window, 0)
    snippets = [s[a:a + 2 * window] for s, a in zip(texts, start)]
    return pa.table({
        "doc_id": t["doc_id"],
        "pos": pa.array(pos),
        "snippet": pa.array(snippets, pa.string()),
    })


def kwic_snippets_dataset(ds, term: str, window: int = 40,
                          text_col: str = "text"):
    """`kwic_snippets_batch` over the corpus — map-only, match-bounded
    output."""
    return ds.map_batches(
        lambda b: kwic_snippets_batch(b, term, window, text_col),
        batch_format="pyarrow",
    )
