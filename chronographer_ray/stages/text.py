"""Text-analysis kernels: token counting, quality signals, language ID,
document fingerprinting.

All kernels are SQL-mirrorable by construction (the DuckDB oracles in
``__ray_entry__.oracle_sql`` compute the same values), vectorized per batch,
and run as plain ``map_batches`` tasks — no state, no shuffle.
"""
from __future__ import annotations

import hashlib
import re

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


def winnowing_batch(batch: pa.Table, text_col: str = "text",
                    k: int = 5, w: int = 4) -> pa.Table:
    """Rolling-hash document fingerprinting (winnowing): crc32 over
    character k-grams of the normalized text, then the minimum hash of each
    w-window (rightmost on ties), consecutive duplicates collapsed — the
    standard local-fingerprint scheme; two documents sharing any fingerprint
    share a k-gram region, robust to small edits."""
    import zlib

    import numpy as np

    fps: list[list[int]] = []
    for t in batch[text_col].to_pylist():
        s = normalize_text(t or "")
        if len(s) < k:
            fps.append([zlib.crc32(s.encode("utf-8"))] if s else [])
            continue
        hashes = np.array(
            [zlib.crc32(s[i : i + k].encode("utf-8")) for i in range(len(s) - k + 1)],
            dtype=np.int64,
        )
        if hashes.size <= w:
            fps.append([int(hashes.min())])
            continue
        picks: list[int] = []
        last = -1
        for start in range(hashes.size - w + 1):
            win = hashes[start : start + w]
            pos = start + int(np.where(win == win.min())[0][-1])  # rightmost min
            if pos != last:
                picks.append(int(hashes[pos]))
                last = pos
        fps.append(picks)
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    return out.append_column(
        "fingerprints", pa.array(fps, pa.list_(pa.int64()))
    )
