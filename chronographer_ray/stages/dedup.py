"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shapes (all streaming, shuffle only on small derived keys):

- exact:     fingerprint per batch (map_batches) → groupby(fingerprint)
             min(doc_id)/count — the shuffle key is a uniform hash, so no
             salting needed; content-key dedup (D1/D7) with skewed keys uses
             the same two-stage pattern with a crc salt column first.
- minhash:   shingle → k-permutation signature per doc (vectorized numpy)
             → explode to (band, band_hash, doc_id) rows → groupby bands →
             candidate pairs → exact-Jaccard verify.
- simhash:   64-bit sign-sum fingerprint per doc; near-dup = small Hamming
             distance within same 16-bit block bucket.
- ngram:     inverted shingle index → per-shingle doc pairs → groupby pair →
             intersection counts → Jaccard.
- embedding: blocked (by label / IVF cell) pairwise cosine.

Deterministic throughout: hashes are crc32/md5-derived, permutation
parameters come from a fixed-seed RandomState.
"""
from __future__ import annotations

import hashlib
import logging
import zlib
from itertools import combinations

import numpy as np
import pyarrow as pa

from .text import ascii_tokens, normalize_text

logger = logging.getLogger(__name__)

_RS = np.random.RandomState(42)
_N_PERM = 64
_PERM_A = _RS.randint(1, 2**31 - 1, size=_N_PERM).astype(np.uint64)
_PERM_B = _RS.randint(0, 2**31 - 1, size=_N_PERM).astype(np.uint64)
_MERSENNE = np.uint64((1 << 61) - 1)


def shingles(text: str, n: int = 3) -> list[str]:
    toks = ascii_tokens(text)
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _hash_shingles(sh: list[str]) -> np.ndarray:
    return np.array([zlib.crc32(s.encode("utf-8")) for s in sh], dtype=np.uint64)


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    """k=64 minhash signature (uint64) via universal hashing of crc shingles."""
    h = _hash_shingles(shingles(text, n))
    if h.size == 0:
        return np.full(_N_PERM, np.uint64(_MERSENNE))
    # (a*h + b) mod p, min over shingles, vectorized (n_shingles × n_perm)
    vals = (h[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) % _MERSENNE
    return vals.min(axis=0)


_SH_C1 = np.uint64(0x9E3779B97F4A7C15)
_SH_C2 = np.uint64(0xC2B2AE3D27D4EB4F)
# one odd multiplier PER OFFSET (splitmix64 of 1..32): alternating two
# constants made the n>=4 mix symmetric under swapping even/odd offset
# PAIRS — (a,b,c,d,e) and (c,d,a,b,e) collided, which the 5-gram
# boilerplate detector hit immediately on the small-vocab corpus
_SH_CONSTS = None


def _sh_consts(n: int) -> np.ndarray:
    global _SH_CONSTS
    if _SH_CONSTS is None or _SH_CONSTS.size < n:
        from .sampling import splitmix64

        _SH_CONSTS = splitmix64(np.arange(1, max(n, 32) + 1)) | np.uint64(1)
    return _SH_CONSTS


def _shingle_hashes_fast(tok_ids: np.ndarray, tok_crc: np.ndarray, n: int = 3) -> np.ndarray:
    """Rolling-hash n-gram shingle hashes from token-id arrays: crc32 is paid
    once per DISTINCT token (via ``tok_crc``), the per-shingle mix is pure
    numpy (`h_i*c1 ⊕ h_{i+1}*c2 ⊕ h_{i+2}` mod 2^64) — no per-shingle string
    allocation. Used by the batch/scale minhash path; the string-crc variant
    above stays for the reference-parity single-doc API."""
    h = tok_crc[tok_ids]
    if h.size < n:
        return np.array([h.sum()], dtype=np.uint64) if h.size else np.array([], np.uint64)
    # one distinct odd multiplier per offset (no symmetry for any n)
    m = h.size - n + 1
    consts = _sh_consts(n)
    out = np.zeros(m, dtype=np.uint64)
    for j in range(n):
        out ^= h[j : j + m] * consts[j]
    return out


def tokenize_batch(texts: list) -> tuple[dict, list]:
    """ONE tokenization pass shared by every signature kernel: batch-level
    vocabulary (token → id) + per-doc token-id lists. Tokenizing separately
    in minhash and simhash doubled the dominant allocation cost."""
    vocab: dict[str, int] = {}
    doc_tok: list[list[int]] = []
    for t in texts:
        ids = []
        for tok in ascii_tokens(t):
            i = vocab.get(tok)
            if i is None:
                i = vocab[tok] = len(vocab)
            ids.append(i)
        doc_tok.append(ids)
    return vocab, doc_tok


def tokenize_batch_flat(col, return_vocab: bool = False):
    """Arrow-vectorized tokenization: whole-batch lower + whitespace split
    + dictionary-encode, returning flat token-id/crc arrays instead of
    per-doc Python lists. Token semantics are identical to
    ``normalize_text(t).split()`` (the `tokenize_batch` contract) — the
    id SPACE differs (dictionary order vs insertion order), which every
    consumer is invariant to because ids are only ever mapped through
    per-distinct-token crc32 or counted.

    Returns ``(ids, offsets, tok_crc)``: ``ids[offsets[i]:offsets[i+1]]``
    are doc i's token ids (zero-copy numpy views), ``tok_crc[id]`` the
    token's crc32. The Python cost is one crc32 per DISTINCT token; the
    per-token path (dict lookup per token) measured ~4× slower on the
    1M-doc quality probe.
    """
    import pyarrow.compute as pc

    if isinstance(col, list):
        col = pa.array([t or "" for t in col], pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # ascii_split_whitespace (not regex replace+split): 4× faster, same
    # ASCII whitespace class as the old RE2 \s+ path and the DuckDB
    # oracles (Unicode-only whitespace like NEL/NBSP stays IN-token, as
    # before). NOT utf8_split_whitespace: its classification of U+0085
    # proved nondeterministic across processes (fuzz-caught — same array,
    # different split). Edge runs emit '' tokens, masked below.
    toks = pc.ascii_split_whitespace(pc.utf8_lower(col))
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    enc = pc.dictionary_encode(flat)
    ids = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    tok_crc = np.array(
        [zlib.crc32(t.encode("utf-8")) for t in vocab], dtype=np.uint64
    ) if vocab else np.array([], np.uint64)
    # empty docs: split('') yields [''] — mask the lone empty token so the
    # doc reads as 0 tokens, matching ''.split() == []
    if vocab and "" in vocab:
        empty_id = vocab.index("")
        keep = ids != empty_id
        # rebuild offsets over the filtered stream
        doc_idx = np.repeat(
            np.arange(len(offsets) - 1), np.diff(offsets)
        )[keep]
        counts = np.bincount(doc_idx, minlength=len(offsets) - 1)
        offsets = np.concatenate(([0], np.cumsum(counts)))
        ids = ids[keep]
    if return_vocab:
        return ids, offsets, tok_crc, vocab
    return ids, offsets, tok_crc


def shingle_hashes_flat(ids: np.ndarray, offsets: np.ndarray,
                        tok_crc: np.ndarray, n: int = 3):
    """Whole-batch rolling n-gram hashes over the FLAT token stream from
    `tokenize_batch_flat`: one mix pass for every doc at once, then a mask
    drops windows that cross a doc boundary (docs are contiguous in the
    flat stream, so each doc's shingles stay a contiguous slice).

    Returns ``(sh, doc_idx)`` — shingle hash + owning doc index per valid
    window, equal to concatenating `_shingle_hashes_fast` over docs with
    >= n tokens (shorter docs contribute NOTHING here, unlike the per-doc
    function's join-all fallback: callers must pre-filter min_tokens >= n).
    """
    h = tok_crc[ids]
    if h.size < n:
        return np.array([], np.uint64), np.array([], np.int64)
    m = h.size - n + 1
    consts = _sh_consts(n)
    out = np.zeros(m, dtype=np.uint64)
    for j in range(n):
        out ^= h[j : j + m] * consts[j]
    lens = np.diff(offsets)
    doc_idx_full = np.repeat(np.arange(lens.size), lens)
    starts = doc_idx_full[:m]
    # window starting at p stays inside its doc iff p + n - 1 < doc end
    valid = (np.arange(m) + n - 1) < offsets[starts + 1]
    return out[valid], starts[valid]


def minhash_signatures_fast(texts: list, n: int = 3,
                            tokenized: tuple | None = None) -> np.ndarray:
    """Vectorized per-batch minhash: batch-level token vocabulary (crc per
    distinct token), rolling-hash shingles, one (shingles × 64) min-reduce
    per doc. Returns (len(texts), 64) uint64."""
    vocab, doc_tok = tokenized if tokenized is not None else tokenize_batch(texts)
    tok_crc = np.array(
        [zlib.crc32(t.encode("utf-8")) for t in vocab], dtype=np.uint64
    ) if vocab else np.array([], np.uint64)
    out = np.full((len(texts), _N_PERM), np.uint64(_MERSENNE))
    # per-doc matrix + min: a ~170×64 uint64 matrix is L2-resident, which
    # beats batched segment-min variants (np.minimum.reduceat over pooled
    # chunks measured 1.4-7× slower — the modulo pass is bandwidth-bound and
    # big chunks fall out of cache)
    for i, ids in enumerate(doc_tok):
        sh = _shingle_hashes_fast(np.asarray(ids, dtype=np.int64), tok_crc, n)
        if sh.size == 0:
            continue
        vals = (sh[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) % _MERSENNE
        out[i] = vals.min(axis=0)
    return out


def minhash_signatures_from_flat(
    ids: np.ndarray, offsets: np.ndarray, tok_crc: np.ndarray, n: int = 3
) -> np.ndarray:
    """`minhash_signatures_fast` over `tokenize_batch_flat` output — value-
    identical signatures (parity-tested) without the per-token Python dict
    loop: shingle hashes come from ONE whole-batch rolling pass
    (`shingle_hashes_flat`), only the 64-perm min-mix stays per-doc (the
    per-doc uint64 matrix is L2-resident; pooled reduceat measured slower).
    Short docs (0 < tokens < n) reproduce the per-doc fallback shingle
    (sum of token hashes); empty docs keep the MERSENNE sentinel row."""
    n_docs = len(offsets) - 1
    out = np.full((n_docs, _N_PERM), np.uint64(_MERSENNE))
    sh, doc_idx = shingle_hashes_flat(ids, offsets, tok_crc, n)
    if sh.size:
        # doc_idx is non-decreasing: per-doc slices via boundary search
        starts = np.searchsorted(doc_idx, np.arange(n_docs), side="left")
        ends = np.searchsorted(doc_idx, np.arange(n_docs), side="right")
        for d in np.unique(doc_idx):
            s = sh[starts[d] : ends[d]]
            vals = (s[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) % _MERSENNE
            out[d] = vals.min(axis=0)
    lens = np.diff(offsets)
    for d in np.where((lens > 0) & (lens < n))[0]:
        h = tok_crc[ids[offsets[d] : offsets[d + 1]]]
        vals = (h.sum() * _PERM_A + _PERM_B) % _MERSENNE
        out[d] = vals
    return out


def minhash_bands_from_signatures(
    sigs: np.ndarray, doc_id_col, bands: int = 16, rows: int = 4
) -> pa.Table:
    """Band-mix + explode a (n, 64) signature matrix into LSH bucket rows —
    the shared tail of `minhash_bands_batch` and the flat flagship path."""
    import pyarrow.compute as pc

    assert bands * rows == _N_PERM
    n = sigs.shape[0]
    sg = sigs.reshape(n, bands, rows)
    bh = np.zeros((n, bands), dtype=np.uint64)
    for r in range(rows):
        bh = bh * _SH_C1 ^ sg[:, :, r]
    band_hash = (bh >> np.uint64(1)).astype(np.int64)  # top bit off → int64-safe
    idx = np.repeat(np.arange(n, dtype=np.int64), bands)
    if isinstance(doc_id_col, pa.ChunkedArray):
        doc_id_col = doc_id_col.combine_chunks()
    return pa.table(
        {
            "doc_id": pc.take(doc_id_col, pa.array(idx)),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(band_hash.reshape(-1)),
        }
    )


def minhash_bands_batch(
    batch: pa.Table, text_col: str = "text", bands: int = 16, rows: int = 4,
    tokenized: tuple | None = None,
) -> pa.Table:
    """Explode each doc into (band, band_hash, doc_id) LSH bucket rows.

    Vectorized end-to-end: fast batch signatures, numpy band mixing (no
    per-band crc/string work), and a ``take`` on the doc_id column so any
    id dtype passes through."""
    sigs = minhash_signatures_fast(batch[text_col].to_pylist(), tokenized=tokenized)
    return minhash_bands_from_signatures(sigs, batch["doc_id"], bands, rows)


def jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = set(shingles(a, n)), set(shingles(b, n))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


_POW2_64 = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def _token_signs(tok: str) -> np.ndarray:
    """±1 vector (64) for one token: crc32 pair → 64 bits → signs."""
    h1 = zlib.crc32(tok.encode("utf-8"))
    h2 = zlib.crc32((tok + "\x00salt").encode("utf-8"))
    h = (np.uint64(h1) << np.uint64(32)) | np.uint64(h2)
    bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    return np.where(bits.astype(bool), 1, -1).astype(np.int64)


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (crc32 pairs → 64 bits)."""
    toks = ascii_tokens(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        acc += _token_signs(t)
    return int((acc > 0).astype(np.uint64) @ _POW2_64)


def simhash_values(texts: list, tokenized: tuple | None = None) -> list[int]:
    """Vectorized SimHash: per-batch token vocabulary → one ±1 matrix row per
    DISTINCT token, per-doc signature = matrix-gather sum (token multiplicity
    preserved). ~10× over the per-token loop — sign vectors are computed once
    per distinct token, and the bit-pack is one uint64 dot product."""
    vocab, doc_tok = tokenized if tokenized is not None else tokenize_batch(texts)
    signs = np.empty((max(len(vocab), 1), 64), dtype=np.int64)
    for tok, i in vocab.items():
        signs[i] = _token_signs(tok)
    vals = []
    for ids in doc_tok:
        if not ids:
            vals.append(0)
            continue
        acc = signs[np.asarray(ids, dtype=np.int64)].sum(axis=0)
        vals.append(int((acc > 0).astype(np.uint64) @ _POW2_64))
    return vals


def simhash_values_from_flat(
    ids: np.ndarray, offsets: np.ndarray, tok_crc: np.ndarray, vocab: list
) -> list[int]:
    """`simhash_values` over `tokenize_batch_flat(..., return_vocab=True)`
    output — value-identical fingerprints (parity-tested) with the sign
    matrix built in ONE vectorized pass over the distinct-token vocabulary
    (the per-token `_token_signs` loop allocated three small arrays per
    distinct token — the flagship's allocator hot spot at 32 workers).
    Only the salted second crc32 stays a per-distinct-token Python call."""
    if not vocab:
        return [0] * (len(offsets) - 1)
    h2 = np.array(
        [zlib.crc32((t + "\x00salt").encode("utf-8")) for t in vocab],
        dtype=np.uint64,
    )
    return simhash_values_from_hashes(ids, offsets, (tok_crc << np.uint64(32)) | h2)


def simhash_values_from_hashes(
    ids: np.ndarray, offsets: np.ndarray, h64: np.ndarray
) -> list[int]:
    """Hash-agnostic SimHash tail: sign matrix from the per-distinct-token
    64-bit hashes ``h64``, per-doc signature = gather-sum + bit-pack. The
    production path injects the crc32-pair hash; the oracle variant injects
    md5 first-8-bytes (``md5_number_upper``-compatible) so a DuckDB query
    reproduces the fingerprints bit-for-bit."""
    n_docs = len(offsets) - 1
    if h64.size == 0:
        return [0] * n_docs
    bits = (h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    signs = np.where(bits.astype(bool), 1, -1).astype(np.int64)  # (V, 64)
    vals = []
    for d in range(n_docs):
        seg = ids[offsets[d] : offsets[d + 1]]
        if seg.size == 0:
            vals.append(0)
            continue
        acc = signs[seg].sum(axis=0)
        vals.append(int((acc > 0).astype(np.uint64) @ _POW2_64))
    return vals


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    ids, offsets, tok_crc, vocab = tokenize_batch_flat(
        batch[text_col], return_vocab=True
    )
    vals = simhash_values_from_flat(ids, offsets, tok_crc, vocab)
    out = batch.select(["doc_id"])
    # int64 can't hold the uint64 top bit safely → hex-string column
    return out.append_column("simhash", pa.array([f"{v:016x}" for v in vals], pa.string()))


def minhash_oracle_constants(n: int = 3) -> tuple[list, list, list]:
    """Constants the SQL oracle embeds as literals: the rolling-mix
    multipliers (splitmix64(1..n) | 1) and the 64 (a, b) permutation
    parameters — fixed at import from RandomState(42)."""
    return (
        [int(c) for c in _sh_consts(n)[:n]],
        [int(a) for a in _PERM_A],
        [int(b) for b in _PERM_B],
    )


def md5_token_hashes(vocab: list) -> np.ndarray:
    """First 8 md5 bytes per distinct token as little-endian uint64 —
    bit-identical to DuckDB's ``md5_number_upper(token)``. Gives the
    signature kernels a SQL-expressible hash injection for the oracle
    variants below (production stays on crc32: ~6× cheaper, not
    SQL-reachable)."""
    if not vocab:
        return np.array([], np.uint64)
    buf = b"".join(hashlib.md5(t.encode("utf-8")).digest()[:8] for t in vocab)
    return np.frombuffer(buf, dtype="<u8").astype(np.uint64)


def minhash_md5_batch(batch: pa.Table, text_col: str = "text", n: int = 3) -> pa.Table:
    """(doc_id, perm, sig) exploded MinHash signatures from the PRODUCTION
    kernel (`minhash_signatures_from_flat`: same flat tokenizer, rolling
    n-gram mix, perm mult-add mod 2^61-1, min-reduce, short-doc and
    empty-doc fallbacks) with md5 token hashes injected, so the DuckDB
    oracle (HUGEINT mulmod-2^64 + ``md5_number_upper``) reproduces every
    signature value bit-for-bit. sig < 2^61 so int64 is exact."""
    import pyarrow.compute as pc

    ids, offsets, _, vocab = tokenize_batch_flat(batch[text_col], return_vocab=True)
    sigs = minhash_signatures_from_flat(ids, offsets, md5_token_hashes(vocab), n)
    n_docs = sigs.shape[0]
    idx = np.repeat(np.arange(n_docs, dtype=np.int64), _N_PERM)
    doc_id = batch["doc_id"]
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    return pa.table(
        {
            "doc_id": pc.take(doc_id, pa.array(idx)),
            "perm": pa.array(np.tile(np.arange(_N_PERM, dtype=np.int64), n_docs)),
            "sig": pa.array(sigs.reshape(-1).astype(np.int64)),
        }
    )


def minhash_bands_md5_batch(batch: pa.Table, text_col: str = "text",
                            bands: int = 16, rows: int = 4) -> pa.Table:
    """(doc_id, band, band_hash) LSH bucket rows from the production band
    fold (`bh = bh*C1 XOR sig` per row, top bit dropped) over md5-injected
    signatures — the banding step itself under a bit-exact SQL oracle."""
    ids, offsets, _, vocab = tokenize_batch_flat(batch[text_col], return_vocab=True)
    sigs = minhash_signatures_from_flat(ids, offsets, md5_token_hashes(vocab))
    return minhash_bands_from_signatures(sigs, batch["doc_id"], bands, rows)


def simhash_md5_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """SimHash fingerprints from the production sign-sum kernel with md5
    token hashes injected (`simhash_values_from_hashes`) — the DuckDB
    oracle rebuilds each doc's 64 bit-sums and bit-packs them to the same
    hex string."""
    ids, offsets, _, vocab = tokenize_batch_flat(batch[text_col], return_vocab=True)
    vals = simhash_values_from_hashes(ids, offsets, md5_token_hashes(vocab))
    out = batch.select(["doc_id"])
    return out.append_column(
        "simhash", pa.array([f"{v:016x}" for v in vals], pa.string())
    )


def _hamming_matrix(vals: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distances of uint64 fingerprints (n×n), via
    unpackbits popcount — no Python bit loops."""
    x = vals[:, None] ^ vals[None, :]  # (n, n) uint64
    return np.unpackbits(x.view(np.uint8).reshape(len(vals), len(vals), 8), axis=2).sum(
        axis=2, dtype=np.int32
    )


def simhash_pairs_dataset(ds, text_col: str = "text", max_hamming: int = 3,
                          n_bands: int = 4):
    """Distributed SimHash near-dup pairs (Hamming ≤ ``max_hamming``).

    Pigeonhole banding: split the 64-bit fingerprint into ``n_bands``
    16-bit bands — any pair within Hamming distance ``n_bands - 1`` matches
    EXACTLY on at least one band, so candidate generation is a
    ``groupby(band, band_bits)`` (no all-pairs pass); within each bucket the
    full Hamming check runs as one vectorized popcount matrix; duplicate
    pair reports (pairs agreeing on several bands) collapse via a grouped
    count. Requires ``max_hamming < n_bands`` for exact recall (3 < 4 here).
    """
    import pandas as pd

    from ray.data.aggregate import Count

    band_shift = 64 // n_bands

    def band_rows(b: pa.Table) -> pa.Table:
        f_ids, f_offsets, f_crc, f_vocab = tokenize_batch_flat(
            b[text_col], return_vocab=True
        )
        vals = np.array(
            simhash_values_from_flat(f_ids, f_offsets, f_crc, f_vocab),
            dtype=np.uint64,
        )
        n = len(vals)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bands = np.repeat(np.arange(n_bands, dtype=np.int32), n)
        shift = (bands.astype(np.uint64)) * np.uint64(band_shift)
        tiled = np.tile(vals, n_bands)
        bits = (tiled >> shift) & np.uint64((1 << band_shift) - 1)
        return pa.table(
            {
                "band": pa.array(bands),
                "band_bits": pa.array(bits.astype(np.int64)),
                "doc_id": pa.array(np.tile(ids, n_bands)),
                "sh": pa.array(tiled.astype(np.int64)),  # uint64 bit pattern
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"d1": pd.Series([], dtype="int64"),
                                 "d2": pd.Series([], dtype="int64")})
        order = np.argsort(g["doc_id"].to_numpy())
        ids = g["doc_id"].to_numpy()[order]
        vals = g["sh"].to_numpy().astype(np.uint64)[order]
        dist = _hamming_matrix(vals)
        iu = np.triu_indices(len(ids), k=1)
        mask = dist[iu] <= max_hamming
        return pd.DataFrame(
            {"d1": pd.Series(ids[iu[0][mask]], dtype="int64"),
             "d2": pd.Series(ids[iu[1][mask]], dtype="int64")}
        )

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "band_bits"])
        .map_groups(bucket_pairs, batch_format="pandas")
    ).materialize()
    if pairs.count() == 0:  # empty results lose their schema downstream
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"d1": pa.array([], pa.int64()), "d2": pa.array([], pa.int64())})
        )
    return (
        pairs.groupby(["d1", "d2"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


# ------------------------------------------------------------------ Ray ops
def exact_dedup_dataset(ds, text_col: str = "text"):
    """Exact dedup over a Dataset: (survivor per fingerprint, group sizes).

    Returns the groups Dataset ``(fingerprint, keeper, n_dups)``.
    """
    from ray.data.aggregate import Count, Min

    from .text import fingerprint_batch

    fps = ds.map_batches(
        lambda b: fingerprint_batch(b, text_col), batch_format="pyarrow"
    )
    return fps.groupby("fingerprint").aggregate(
        Min("doc_id", alias_name="keeper"), Count(alias_name="n_dups")
    )


def minhash_candidates_dataset(ds, text_col: str = "text", bands: int = 16,
                               rows: int = 4, bucket_cap: int | None = 1024,
                               token_hash: str = "crc32"):
    """MinHash-LSH candidate pairs Dataset ``(d1, d2)`` (d1 < d2), distinct.

    ``token_hash="md5"`` injects the SQL-expressible md5 token hash
    (`md5_token_hashes`) into the otherwise-identical pipeline so the DuckDB
    oracle can reproduce the banding end-to-end; crc32 is the production
    default (cheaper, not SQL-reachable).

    Band shape sets the similarity threshold s ≈ (1/bands)^(1/rows): the
    16×4 default targets near-dups (s≈0.5); 32×2 is a high-recall setting
    for small eval corpora (more candidate pairs to verify).

    ``bucket_cap`` is the skew valve: a band bucket holding k docs emits
    k(k-1)/2 pairs, so one boilerplate flood (k=10⁶) would emit 5·10¹¹
    rows from a single group. Buckets larger than the cap are dropped
    WITH a logged count (no silent truncation). Ordering assumption this
    encodes: EXACT dedup runs before near-dedup (the standard pipeline
    order — ``exact_dedup_dataset`` is cheaper and removes identical-text
    cliques, which are the one case where every band floods at once and
    capping would lose the pairs entirely); what remains over the cap is
    near-identical boilerplate whose members still meet in their other,
    finer bands. ``None`` disables the cap (exact LSH semantics, used by
    the recall tests).
    """
    import pandas as pd

    n_bands, n_rows = bands, rows

    def bands_flat(b: pa.Table) -> pa.Table:
        # flat Arrow tokenization (value-identical to minhash_bands_batch,
        # parity-tested) — no per-token Python dict loop in the hot stage
        if token_hash == "md5":
            f_ids, f_offsets, _, vocab = tokenize_batch_flat(
                b[text_col], return_vocab=True
            )
            f_h = md5_token_hashes(vocab)
        else:
            f_ids, f_offsets, f_h = tokenize_batch_flat(b[text_col])
        sigs = minhash_signatures_from_flat(f_ids, f_offsets, f_h)
        return minhash_bands_from_signatures(sigs, b["doc_id"], n_bands, n_rows)

    bands = ds.map_batches(bands_flat, batch_format="pyarrow")

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one group per band (32 groups): vectorized self-merge on the bucket
        # hash instead of per-bucket python — pairs appear once per matching
        # band and are deduped by the final groupby
        g = g[["band_hash", "doc_id"]].drop_duplicates()
        if bucket_cap is not None:
            sizes = g["band_hash"].value_counts()
            hot = sizes[sizes > bucket_cap]
            if len(hot):
                logger.warning(
                    "minhash LSH: dropping %d band bucket(s) over cap=%d "
                    "(largest=%d docs) — boilerplate flood; run exact "
                    "dedup first so identical-text cliques never reach "
                    "this stage", len(hot), bucket_cap, int(hot.iloc[0]),
                )
                g = g[~g["band_hash"].isin(hot.index)]
        m = g.merge(g, on="band_hash")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return m.rename(columns={"doc_id_x": "d1", "doc_id_y": "d2"})[
            ["d1", "d2"]
        ].drop_duplicates()

    _ = combinations  # kept for the per-bucket reference variant
    pairs = bands.groupby("band").map_groups(band_pairs, batch_format="pandas")
    return pairs.groupby(["d1", "d2"]).count()


def dedup_dataset(ds, keys: list[str], n_buckets: int = 16):
    """D1/D7 at scale: two-stage exact dedup on arbitrary key columns.

    Stage 1 (map-side combine): dedup inside each batch — a hub key with
    millions of duplicates collapses to ≤1 row per block BEFORE the shuffle,
    so no reducer sees the raw hot-key fanout (the salting strategy of
    SURVEY §7.4 realized as local pre-aggregation).
    Stage 2: int-bucket exchange (``bucketed_group_apply``) + per-bucket
    vectorized ``drop_duplicates`` — a direct ``groupby(keys)`` sorts the
    full wide-string key tuples (measured 72 s vs ~4 s at 2.2M triples);
    hashing to 16 int buckets moves the same rows at int-sort cost.
    """
    from ..functions.shuffles import bucketed_group_apply

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        df = b.select(keys).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pre = ds.map_batches(local, batch_format="pyarrow")
    return bucketed_group_apply(
        pre,
        keys,
        # Arrow distinct: group_by with no aggregates yields unique keys
        lambda t: t.group_by(keys).aggregate([]),
        n_buckets=n_buckets,
        batch_format="pyarrow",
    )


def shingle_explode_batch(batch: pa.Table, text_col: str = "text",
                          min_tokens: int = 3) -> pa.Table:
    """(doc_id, shingle, n_sh) rows — distinct shingles per doc, each row
    carrying the doc's TOTAL distinct-shingle count — for docs with
    ≥ ``min_tokens`` tokens (the n-gram Jaccard substrate).

    ``n_sh`` rides along because a document's text lives in exactly one
    input row, so its full shingle set is visible inside one batch: the
    per-doc size the Jaccard denominator needs later is free here, where a
    separate ``groupby(doc_id).count()`` + join-back pays a full extra
    shuffle plus two ``Dataset.join``s."""
    import pyarrow.compute as pc

    keep_idx: list[int] = []
    shingle_col: list[str] = []
    counts: list[int] = []
    for i, t in enumerate(batch[text_col].to_pylist()):
        toks = ascii_tokens(t)
        if len(toks) < min_tokens:
            continue
        ss = sorted(set(shingles(t)))
        keep_idx.append(i)
        counts.append(len(ss))
        shingle_col.extend(ss)
    ids = pc.take(batch["doc_id"], pa.array(keep_idx, pa.int64()))
    rep = np.repeat(np.arange(len(keep_idx), dtype=np.int64), counts)
    cnt = np.asarray(counts, dtype=np.int64)
    return pa.table(
        {
            "doc_id": pc.take(ids, pa.array(rep)),
            "shingle": pa.array(shingle_col, pa.string()),
            "n_sh": pa.array(np.repeat(cnt, cnt)),
        }
    )


def _shingle_pair_counts(ds, text_col: str, min_tokens: int,
                         df_cap: int | None, n_buckets: int):
    """Shared candidate-pair core of the set-overlap dedup family →
    Dataset (d1, d2, n_inter, n1, n2) with d1 < d2: distinct-shingle
    intersection size per doc pair plus both docs' UNCAPPED shingle-set
    sizes. ``ngram_jaccard_dataset`` divides by the union,
    ``ngram_containment_dataset`` by each side — same two exchanges."""
    import pandas as pd

    from ..functions.shuffles import bucketed_group_apply

    sh = ds.map_batches(
        lambda b: shingle_explode_batch(b, text_col, min_tokens),
        batch_format="pyarrow",
    )
    if df_cap is not None:
        import ray

        def df_counts(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            g = t.group_by("shingle").aggregate([("doc_id", "count")])
            return g.filter(pc.greater(g["doc_id_count"], df_cap)) \
                    .select(["shingle"])

        hot = bucketed_group_apply(
            sh.select_columns(["shingle", "doc_id"]), ["shingle"],
            df_counts, n_buckets=n_buckets, batch_format="pyarrow",
        ).to_pandas()
        # no hot shingles → every bucket emitted an empty table and the
        # collected frame is column-less; guard the column access
        hot_ref = ray.put(
            set(hot["shingle"]) if "shingle" in hot.columns else set()
        )

        def drop_hot(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            hs = ray.get(hot_ref)
            if not hs:
                return b
            mask = pc.invert(
                pc.is_in(b["shingle"], value_set=pa.array(sorted(hs), pa.string()))
            )
            return b.filter(mask)

        sh = sh.map_batches(drop_hot, batch_format="pyarrow")

    # stage 1: shingle-hash buckets. A shingle lives in exactly one bucket,
    # so the per-bucket self-merge pair counts are clean partials of the
    # global intersection; both docs' sizes tag along as pair constants.
    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return (
            m.groupby(["doc_id_x", "doc_id_y"], as_index=False)
            .agg(n_part=("shingle", "size"), n1=("n_sh_x", "first"),
                 n2=("n_sh_y", "first"))
            .rename(columns={"doc_id_x": "d1", "doc_id_y": "d2"})
        )

    pairs = bucketed_group_apply(
        sh, ["shingle"], bucket_pairs, n_buckets=n_buckets,
        batch_format="pandas",
    )

    # stage 2: pair-hash buckets; Arrow group-sum combine of the partials
    # (a pair appears once per bucket its shared shingles hash into).
    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["d1", "d2"]).aggregate(
            [("n_part", "sum"), ("n1", "min"), ("n2", "min")]
        )
        return g.select(["d1", "d2", "n_part_sum", "n1_min", "n2_min"]) \
                .rename_columns(["d1", "d2", "n_inter", "n1", "n2"])

    return bucketed_group_apply(
        pairs, ["d1", "d2"], combine, n_buckets=n_buckets,
        batch_format="pyarrow",
    )


def _typed_empty_pairs(ds, value_col: str, id_cols: tuple[str, str]):
    """One empty block typed (id, id, float64) so zero-pair runs keep a
    schema (every bucket of an empty run emits a column-less table)."""
    import ray.data as rd

    sch = ds.schema()
    doc_t = dict(zip(sch.names, sch.types)).get("doc_id", pa.int64())
    return rd.from_arrow(
        pa.table(
            {
                id_cols[0]: pa.array([], doc_t),
                id_cols[1]: pa.array([], doc_t),
                value_col: pa.array([], pa.float64()),
            }
        )
    )


def ngram_jaccard_dataset(ds, text_col: str = "text", tau: float = 0.5,
                          min_tokens: int = 3, df_cap: int | None = 256,
                          n_buckets: int = 16):
    """Distributed n-gram Jaccard pairs ≥ τ — nothing driver-side, exactly
    two int-bucket exchanges:

    shingle explode (each row carrying its doc's total shingle count) →
    (optional) document-frequency cap → shingle-hash bucket exchange with a
    vectorized in-bucket self-merge emitting per-bucket partial pair counts
    that carry BOTH docs' sizes → pair-hash bucket exchange summing the
    partials (``bucketed_group_apply``; Ray's sort-based multi-key
    ``groupby([d1, d2]).aggregate(Sum)`` stalls pathologically on ~10⁶ pair
    rows — measured >170 s vs <2 s for the identical combine through the
    int-bucket path) → Jaccard filter. Carrying ``n_sh`` through the pair
    emission removes the sizes aggregate and the two ``Dataset.join``s
    (and the schemaless-empty-block repair they required) of the round-1
    shape.

    ``df_cap`` drops shingles appearing in more than ``df_cap`` docs — the
    skew valve: a stop-phrase shingle shared by k docs emits k² pairs, and
    capping df bounds per-bucket fanout (standard near-dup practice). It is
    ON by default (256 — a shingle in >256 docs is boilerplate, not
    similarity signal, and contributes ≥65k pairs); pass ``None`` for exact
    semantics (the oracle query does, at test scale). The Jaccard
    denominator always uses the UNCAPPED per-doc sizes, so capping only
    under-counts intersections — it can never inflate a pair's Jaccard
    above its exact value.
    """
    inter = _shingle_pair_counts(ds, text_col, min_tokens, df_cap, n_buckets)

    def jac(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ni = pc.cast(b["n_inter"], pa.float64())
        denom = pc.subtract(
            pc.add(pc.cast(b["n1"], pa.float64()),
                   pc.cast(b["n2"], pa.float64())),
            ni,
        )
        out = pa.table(
            {"d1": b["d1"], "d2": b["d2"], "jac": pc.divide(ni, denom)}
        )
        return out.filter(pc.greater_equal(out["jac"], tau))

    out = inter.map_batches(jac, batch_format="pyarrow")

    # zero-pair runs otherwise surface schema-less (every bucket emits an
    # empty table); union a typed empty block so ``schema()`` /
    # ``iter_batches`` consumers always see (d1, d2, jac). ``to_pandas()``
    # on an all-empty dataset still yields a column-less frame — that is
    # Ray's own empty-concat behavior, not fixable here without the eager
    # count()+materialize barrier this rewrite removed. schema() below is
    # metadata-backed — no execution — and the union adds one empty block.
    return out.union(_typed_empty_pairs(ds, "jac", ("d1", "d2")))


def ngram_containment_dataset(ds, text_col: str = "text", tau: float = 0.8,
                              min_tokens: int = 3, df_cap: int | None = 256,
                              n_buckets: int = 16):
    """Directed shingle-set containment pairs ≥ τ → (src, dst, containment):
    C(src → dst) = |S(src) ∩ S(dst)| / |S(src)| (Broder 1997, "On the
    resemblance and containment of documents"). Containment catches the
    asymmetric near-dups Jaccard misses — a short document wholly embedded
    in a much longer one (quote farms, boilerplate-wrapped reposts) has
    C ≈ 1 while its Jaccard is tiny — which is why corpus curation runs
    both resemblance AND containment sweeps.

    Same dataflow as :func:`ngram_jaccard_dataset` (the shared
    ``_shingle_pair_counts`` core: two int-bucket exchanges, ``df_cap``
    hot-shingle valve, per-doc sizes riding with the pairs); the only
    difference is the final map-only score, which emits each unordered
    pair in BOTH directions and keeps the directions clearing τ. Like the
    Jaccard denominator, |S(src)| is always the UNCAPPED size, so capping
    can only under-count containment, never inflate it."""
    inter = _shingle_pair_counts(ds, text_col, min_tokens, df_cap, n_buckets)

    def contain(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ni = pc.cast(b["n_inter"], pa.float64())
        fwd = pa.table({
            "src": b["d1"], "dst": b["d2"],
            "containment": pc.divide(ni, pc.cast(b["n1"], pa.float64())),
        })
        rev = pa.table({
            "src": b["d2"], "dst": b["d1"],
            "containment": pc.divide(ni, pc.cast(b["n2"], pa.float64())),
        })
        out = pa.concat_tables([fwd, rev])
        return out.filter(pc.greater_equal(out["containment"], tau))

    out = inter.map_batches(contain, batch_format="pyarrow")
    return out.union(_typed_empty_pairs(ds, "containment", ("src", "dst")))


def shared_kgram_dataset(ds, k: int = 5, min_df: int = 2,
                         text_col: str = "text"):
    """Boilerplate / repeated-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": exact
    substring duplication at k-token granularity): flag every doc whose
    text contains a k-gram that also appears in >= min_df docs, with the
    count of such shared k-grams.

    Shape — two int-bucket exchanges, nothing driver-side:
    1. map: distinct (doc_id, kgram_hash) pairs per doc (Arrow tokenize +
       one rolling-hash pass, `_batch_distinct_pairs` machinery);
    2. kgram-hash bucket exchange: document frequency per hash (pairs are
       per-doc distinct, so count == df), keep hashes with df >= min_df;
    3. ``Dataset.join`` pairs back to the hot hashes, then a doc-keyed
       grouped count -> (doc_id, n_shared).
    """
    from ray.data.aggregate import Count

    from ..functions.shuffles import bucketed_group_apply

    def pairs_batch(b: pa.Table) -> pa.Table:
        from .decontam import _batch_distinct_pairs

        sh, doc_idx = _batch_distinct_pairs(b[text_col], k, k)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx], pa.int64()),
                # int64 view: the mix is uniform, the sign bit carries no
                # information, and int keys keep the exchanges/join native
                "h": pa.array(sh.astype(np.int64), pa.int64()),
            }
        )

    pairs = ds.map_batches(pairs_batch, batch_format="pyarrow")

    def df_count(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        agg = t.group_by("h").aggregate([("doc_id", "count")])
        agg = agg.rename_columns(["h", "df"])
        return agg.filter(pc.greater_equal(agg["df"], min_df)).select(["h"])

    hot = bucketed_group_apply(pairs, ["h"], df_count, batch_format="pyarrow")
    flagged = pairs.join(hot, join_type="inner", num_partitions=8, on=("h",))
    return (
        flagged.groupby("doc_id")
        .aggregate(Count(alias_name="n_shared"))
    )


# ------------------------------------------------------ paragraph dedup
def duplicated_paragraphs_dataset(ds, text_col: str = "text",
                                  sep: str = ". ", min_df: int = 2,
                                  n_buckets: int = 16):
    """Corpus-wide duplicated-paragraph table → (para, c): every paragraph
    (``sep``-delimited span) occurring ≥ ``min_df`` times. Map-side
    per-batch counts collapse within-batch repeats before one int-bucket
    exchange (CCNet-style boilerplate discovery, one granularity below
    `shared_kgram_dataset`'s k-gram spans)."""
    import pyarrow.compute as pc

    from ..functions.shuffles import bucketed_group_apply

    def partial(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern(pc.fill_null(b[text_col], ""), sep)
        )
        t = pa.table({"para": flat}).append_column(
            "c", pa.array(np.ones(len(flat), dtype=np.int64))
        )
        g = t.group_by("para").aggregate([("c", "sum")])
        return g.rename_columns(["para", "c"])

    def merge(g: pa.Table) -> pa.Table:
        s = g.group_by("para").aggregate([("c", "sum")])
        s = s.rename_columns(["para", "c"])
        return s.filter(pc.greater_equal(s["c"], min_df))

    return bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["para"], merge, n_buckets=n_buckets, batch_format="pyarrow",
    )


def paragraph_dedup_dataset(ds, text_col: str = "text", sep: str = ". ",
                            min_df: int = 2, n_buckets: int = 16):
    """CCNet-style paragraph dedup: REMOVE every paragraph that occurs
    ≥ ``min_df`` times corpus-wide and reassemble each document's
    remaining text in original order → (doc_id, text).

    Two passes: `duplicated_paragraphs_dataset` finds the dup set (tiny —
    it is the corpus's boilerplate vocabulary; broadcast via ``ray.put``;
    at 10^12 docs swap the exact set for `stages/bloom.py` + exact
    verify), then a MAP-ONLY pass splits, masks via vectorized
    ``pc.is_in``, and rejoins per row. Paragraph identity is the exact
    span string (SQL-mirrorable); order is preserved by construction —
    the mask/rebuild never crosses rows."""
    import ray

    import pyarrow.compute as pc

    dup = duplicated_paragraphs_dataset(
        ds, text_col=text_col, sep=sep, min_df=min_df, n_buckets=n_buckets
    ).to_pandas()
    dup_ref = ray.put(
        pa.array(sorted(dup["para"].tolist()) if len(dup) else [], pa.string())
    )

    def scrub(b: pa.Table) -> pa.Table:
        dset = ray.get(dup_ref)
        lists = pc.split_pattern(pc.fill_null(b[text_col], ""), sep)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        keep = pc.invert(pc.is_in(flat, value_set=dset)).to_numpy(
            zero_copy_only=False
        )
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        vals = flat.to_pandas().to_numpy()
        texts = []
        start = 0
        for n in lens:  # per-doc join of the kept spans (object work is
            sl = slice(start, start + n)  # inherent to string reassembly)
            texts.append(sep.join(vals[sl][keep[sl]]))
            start += n
        return pa.table({
            "doc_id": b["doc_id"],
            text_col: pa.array(texts, pa.string()),
        })

    return ds.map_batches(scrub, batch_format="pyarrow")


# ------------------------------------------------- duplicated-span removal
def _span_tokenize(col):
    """ORIGINAL-case ASCII-whitespace tokenization with the same geometry
    as `tokenize_batch_flat` (lower only changes token CONTENT, never
    whitespace, so positions line up): returns ``(toks, offsets, ids,
    vocab)`` where ``toks`` are the original flat tokens (for reassembly),
    ``ids``/``vocab`` index the LOWERED token space (for hashing), and
    '' tokens from empty docs are masked out of all three."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.ascii_split_whitespace(pc.fill_null(col, ""))
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lists.flatten()
    enc = pc.dictionary_encode(pc.utf8_lower(flat))
    ids = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    toks = flat.to_pandas().to_numpy()
    if vocab and "" in vocab:
        empty_id = vocab.index("")
        keep = ids != empty_id
        doc_idx = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))[keep]
        counts = np.bincount(doc_idx, minlength=len(offsets) - 1)
        offsets = np.concatenate(([0], np.cumsum(counts)))
        ids, toks = ids[keep], toks[keep]
    return toks, offsets, ids, vocab


def _span_window_hashes(col, n: int, method: str):
    """Per-window rolling hashes + owning-doc index + flat geometry for a
    batch: the shared front half of both duplicated-span passes. Window
    hash space is the production rolling mix (`shingle_hashes_flat`) over
    crc32 token hashes (``method='crc'``, scale path) or md5-injected
    token hashes (``method='md5'``, bit-identical to the DuckDB oracle's
    ``md5_number_upper`` + HUGEINT mulmod arithmetic)."""
    toks, offsets, ids, vocab = _span_tokenize(col)
    if method == "md5":
        th = md5_token_hashes(vocab)
    elif method == "crc":
        th = np.array(
            [zlib.crc32(t.encode("utf-8")) for t in vocab], dtype=np.uint64
        ) if vocab else np.array([], np.uint64)
    else:
        raise ValueError(f"unknown span hash method: {method}")
    wh, doc_idx = shingle_hashes_flat(ids, offsets, th, n)
    return toks, offsets, (wh >> np.uint64(1)).astype(np.int64), doc_idx


def duplicated_span_vocab_dataset(ds, n: int = 5, min_count: int = 2,
                                  text_col: str = "text",
                                  method: str = "crc", n_buckets: int = 16):
    """Corpus-wide duplicated n-token span table → (wh, c): every n-token
    window whose exact (lowered) content occurs >= ``min_count`` times
    corpus-wide, keyed by rolling hash (Lee et al. 2022 exact-substring
    duplication, the span-level sibling of `shared_kgram_dataset`'s
    per-doc counts). Map-side np.unique partials collapse within-batch
    repeats before ONE int-bucket exchange — spans never move, only
    (int64 hash, count) rows."""
    import pyarrow.compute as pc

    from ..functions.shuffles import bucketed_group_apply

    def partial(b: pa.Table) -> pa.Table:
        _, _, wh, _ = _span_window_hashes(b[text_col], n, method)
        u, c = np.unique(wh, return_counts=True)
        return pa.table({
            "wh": pa.array(u, pa.int64()),
            "c": pa.array(c.astype(np.int64), pa.int64()),
        })

    def merge(g: pa.Table) -> pa.Table:
        s = g.group_by("wh").aggregate([("c", "sum")])
        s = s.rename_columns(["wh", "c"])
        return s.filter(pc.greater_equal(s["c"], min_count))

    return bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["wh"], merge, n_buckets=n_buckets, batch_format="pyarrow",
    )


def _dup_span_ref(ds, n, min_count, text_col, method, n_buckets):
    """Build + broadcast the sorted duplicated-window-hash vocabulary.

    Driver-side bound: the dup-span vocab is the corpus's repeated
    boilerplate at n-token granularity — the same bound as
    `paragraph_dedup_dataset`'s dup set; at 10^12 docs swap the exact
    array for a bloom prefilter (`stages/bloom.py`) + exact verify join,
    keeping this pass map-only."""
    import ray

    dup = duplicated_span_vocab_dataset(
        ds, n=n, min_count=min_count, text_col=text_col,
        method=method, n_buckets=n_buckets,
    ).to_pandas()
    # all-empty datasets come back as a column-less frame (Ray caveat)
    wh = (dup["wh"].to_numpy().astype(np.int64)
          if "wh" in dup.columns else np.array([], np.int64))
    return ray.put(np.sort(wh))


def dup_span_coverage_dataset(ds, n: int = 5, min_count: int = 2,
                              text_col: str = "text", method: str = "crc",
                              n_buckets: int = 16):
    """Per-doc duplicated-span coverage → (doc_id, total_tokens,
    dup_windows, dup_tokens): how many n-token windows of the doc are
    corpus-level duplicates and how many TOKENS the union of those
    windows covers (interval-union via a whole-batch difference array —
    overlapping windows never double-count). The measurement half of
    Lee et al. exact-substring dedup; `span_scrub_dataset` is the
    removal half. Second pass is map-only against the broadcast vocab."""
    import ray

    dup_ref = _dup_span_ref(ds, n, min_count, text_col, method, n_buckets)

    def stats(b: pa.Table) -> pa.Table:
        vocab = ray.get(dup_ref)
        _, offsets, wh, doc_idx = _span_window_hashes(b[text_col], n, method)
        n_docs = len(offsets) - 1
        if vocab.size:
            pos = np.searchsorted(vocab, wh)
            isdup = (pos < vocab.size) & (
                vocab[np.minimum(pos, vocab.size - 1)] == wh
            )
        else:
            isdup = np.zeros(wh.size, bool)
        dup_windows = np.bincount(doc_idx[isdup], minlength=n_docs)
        # interval union over the flat stream: +1 at each dup-window start,
        # -1 just past its end (windows never cross doc boundaries, so the
        # running sum is 0 at every doc boundary by construction)
        total = int(offsets[-1])
        lens = np.diff(offsets)
        starts_flat = (
            np.repeat(offsets[:-1], np.maximum(lens - n + 1, 0))
            + np.concatenate([np.arange(max(m, 0)) for m in (lens - n + 1)])
            if n_docs else np.array([], np.int64)
        )
        diff = np.zeros(total + 1, np.int64)
        dup_starts = starts_flat[isdup]
        np.add.at(diff, dup_starts, 1)
        np.add.at(diff, dup_starts + n, -1)
        covered = np.cumsum(diff[:-1]) > 0
        flat_doc = np.repeat(np.arange(n_docs), lens)
        dup_tokens = np.bincount(flat_doc[covered], minlength=n_docs)
        return pa.table({
            "doc_id": b["doc_id"],
            "total_tokens": pa.array(lens.astype(np.int64), pa.int64()),
            "dup_windows": pa.array(dup_windows.astype(np.int64), pa.int64()),
            "dup_tokens": pa.array(dup_tokens.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def span_scrub_dataset(ds, n: int = 5, min_count: int = 2,
                       text_col: str = "text", method: str = "crc",
                       n_buckets: int = 16):
    """Exact-substring REMOVAL (Lee et al. 2022 step 2): drop every token
    covered by any corpus-level duplicated n-token window and reassemble
    the remaining ORIGINAL-case tokens in order → (doc_id, text). Same
    two-pass shape as `dup_span_coverage_dataset`; hashing happens on the
    lowered token space, reassembly keeps the original tokens."""
    import ray

    dup_ref = _dup_span_ref(ds, n, min_count, text_col, method, n_buckets)

    def scrub(b: pa.Table) -> pa.Table:
        vocab = ray.get(dup_ref)
        toks, offsets, wh, _ = _span_window_hashes(b[text_col], n, method)
        n_docs = len(offsets) - 1
        lens = np.diff(offsets)
        isdup = (
            np.isin(wh, vocab, assume_unique=False)
            if vocab.size else np.zeros(wh.size, bool)
        )
        starts_flat = (
            np.repeat(offsets[:-1], np.maximum(lens - n + 1, 0))
            + np.concatenate([np.arange(max(m, 0)) for m in (lens - n + 1)])
            if n_docs else np.array([], np.int64)
        )
        total = int(offsets[-1])
        diff = np.zeros(total + 1, np.int64)
        dup_starts = starts_flat[isdup]
        np.add.at(diff, dup_starts, 1)
        np.add.at(diff, dup_starts + n, -1)
        kept = np.cumsum(diff[:-1]) == 0
        texts = []
        for i in range(n_docs):
            sl = slice(int(offsets[i]), int(offsets[i + 1]))
            texts.append(" ".join(toks[sl][kept[sl]]))
        return pa.table({
            "doc_id": b["doc_id"],
            text_col: pa.array(texts, pa.string()),
        })

    return ds.map_batches(scrub, batch_format="pyarrow")


def cross_corpus_neardup_dataset(train, eval_ds, text_col: str = "text",
                                 bands: int = 16, rows: int = 4,
                                 token_hash: str = "crc32",
                                 eval_bucket_cap: int | None = 1024):
    """Fuzzy benchmark decontamination → (doc_id, n_eval_matches): for each
    TRAIN document, the number of DISTINCT eval/benchmark documents that
    share ≥ 1 MinHash-LSH band bucket with it. The near-dup complement of
    `decontam.decontam_report`'s exact n-gram overlap — LSH candidacy
    catches lightly-paraphrased benchmark leakage that exact shingle
    matching misses (the GPT-3 appendix-C / Dodge et al. 2021 C4 audit
    concern).

    Shape — broadcast, zero exchanges: the eval corpus is benchmark-sized
    (MBs against a 100 TB train side), so its (band, band_hash, doc_id)
    bucket table ships ONCE via ``ray.put`` and the train side is a pure
    map: band rows per batch (`minhash_bands_from_signatures`), an
    in-batch merge against the broadcast table, distinct + count per doc.
    A doc's band rows never leave its batch, so in-batch distinct IS
    global distinct and the whole operator streams at read bandwidth.
    If the eval side outgrows a broadcast (cross-corpus dedup of two
    comparable corpora), tag sides and run the band-bucket exchange of
    `minhash_candidates_dataset` over the union instead — same banding,
    one exchange.

    ``eval_bucket_cap`` drops (band, band_hash) buckets holding more than
    that many EVAL docs (logged): an eval-side boilerplate bucket would
    flag every train doc sharing the boilerplate, not actual leakage.
    ``token_hash="md5"`` selects the SQL-reproducible token hash
    (`md5_token_hashes`) for the DuckDB oracle; crc32 is the production
    default."""
    import pandas as pd
    import ray

    def bands_flat(b: pa.Table) -> pa.Table:
        if token_hash == "md5":
            f_ids, f_offsets, _, vocab = tokenize_batch_flat(
                b[text_col], return_vocab=True
            )
            f_h = md5_token_hashes(vocab)
        else:
            f_ids, f_offsets, f_h = tokenize_batch_flat(b[text_col])
        sigs = minhash_signatures_from_flat(f_ids, f_offsets, f_h)
        return minhash_bands_from_signatures(sigs, b["doc_id"], bands, rows)

    # eval side: benchmark-sized by contract — collected once, broadcast
    eb = eval_ds.map_batches(bands_flat, batch_format="pyarrow").to_pandas()
    eb = eb.rename(columns={"doc_id": "eval_id"})
    if eval_bucket_cap is not None and len(eb):
        sizes = eb.groupby(["band", "band_hash"])["eval_id"].transform("size")
        hot = sizes > eval_bucket_cap
        if hot.any():
            logger.warning(
                "cross-corpus LSH: dropping %d eval band rows in buckets "
                "over cap=%d — eval-side boilerplate, not leakage signal",
                int(hot.sum()), eval_bucket_cap,
            )
            eb = eb[~hot]
    eb_ref = ray.put(eb)

    def probe(b: pa.Table) -> pa.Table:
        ev = ray.get(eb_ref)
        tb = bands_flat(b).to_pandas()
        m = tb.merge(ev, on=["band", "band_hash"])[["doc_id", "eval_id"]]
        m = m.drop_duplicates()  # a doc's bands all live in THIS batch
        out = m.groupby("doc_id", as_index=False).size()
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy()),
            "n_eval_matches": pa.array(out["size"].to_numpy(np.int64)),
        })

    return train.map_batches(probe, batch_format="pyarrow")
