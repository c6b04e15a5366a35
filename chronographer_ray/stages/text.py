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
_WS = re.compile(r"\s+")


def text_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc stats: char_count, word_count, stop_hits, punct_count.

    Counts are exact-integer (float ratios are left to the consumer) so the
    DuckDB oracle matches bit-for-bit.
    """
    texts = batch[text_col].to_pylist()
    char_count, word_count, stop_hits, punct_count = [], [], [], []
    for t in texts:
        t = t or ""
        toks = t.split()
        char_count.append(len(t))
        word_count.append(len(toks))
        stop_hits.append(sum(1 for w in toks if w in STOPWORDS))
        punct_count.append(sum(1 for c in t if c in PUNCT))
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    out = out.append_column("char_count", pa.array(char_count, pa.int64()))
    out = out.append_column("word_count", pa.array(word_count, pa.int64()))
    out = out.append_column("stop_hits", pa.array(stop_hits, pa.int64()))
    out = out.append_column("punct_count", pa.array(punct_count, pa.int64()))
    return out


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n-gram-free heuristic language ID: 'en' iff any stopword token occurs.

    Deliberately simple & deterministic (the corpus is synthetic); a real
    n-gram model drops into the same kernel shape.
    """
    texts = batch[text_col].to_pylist()
    langs = []
    for t in texts:
        toks = (t or "").split()
        langs.append("en" if any(w in STOPWORDS for w in toks) else "unk")
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    return out.append_column("lang_pred", pa.array(langs, pa.string()))


def normalize_text(t: str) -> str:
    return _WS.sub(" ", (t or "").lower()).strip()


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
    can mirror it with ``regexp_extract_all``)."""
    texts = batch[text_col].to_pylist()
    ws = [len((t or "").split()) for t in texts]
    bpe = [len(_BPE_ISH.findall(t or "")) for t in texts]
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    out = out.append_column("ws_tokens", pa.array(ws, pa.int64()))
    return out.append_column("bpe_tokens", pa.array(bpe, pa.int64()))


_WINNOW_B = np.uint64(1099511628211)  # FNV prime — k-gram polynomial base


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
    fingerprint share a k-gram region, robust to small edits."""
    pows = _WINNOW_B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    fps = [
        _winnow_one(normalize_text(t or ""), k, w, pows)
        for t in batch[text_col].to_pylist()
    ]
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    return out.append_column(
        "fingerprints", pa.array(fps, pa.list_(pa.int64()))
    )
