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

import zlib
from itertools import combinations

import numpy as np
import pyarrow as pa

from .text import normalize_text

_RS = np.random.RandomState(42)
_N_PERM = 64
_PERM_A = _RS.randint(1, 2**31 - 1, size=_N_PERM).astype(np.uint64)
_PERM_B = _RS.randint(0, 2**31 - 1, size=_N_PERM).astype(np.uint64)
_MERSENNE = np.uint64((1 << 61) - 1)


def shingles(text: str, n: int = 3) -> list[str]:
    toks = normalize_text(text).split()
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


def minhash_bands_batch(
    batch: pa.Table, text_col: str = "text", bands: int = 16, rows: int = 4
) -> pa.Table:
    """Explode each doc into (band, band_hash, doc_id) LSH bucket rows."""
    assert bands * rows == _N_PERM
    doc_ids, band_ids, band_hashes = [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch[text_col].to_pylist()):
        sig = minhash_signature(text or "")
        for b in range(bands):
            chunk = sig[b * rows : (b + 1) * rows]
            bh = zlib.crc32(chunk.tobytes())
            doc_ids.append(doc_id)
            band_ids.append(b)
            band_hashes.append(bh)
    return pa.table(
        {
            "doc_id": doc_ids,
            "band": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
        }
    )


def jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = set(shingles(a, n)), set(shingles(b, n))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (crc32 pairs → 64 bits)."""
    toks = normalize_text(text).split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h1 = zlib.crc32(t.encode("utf-8"))
        h2 = zlib.crc32((t + "\x00salt").encode("utf-8"))
        h = (np.uint64(h1) << np.uint64(32)) | np.uint64(h2)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in np.nonzero(acc > 0)[0]:
        out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = [simhash64(t or "") for t in batch[text_col].to_pylist()]
    out = batch.select(["doc_id"])
    # store as two int64 halves? int64 can't hold uint64 top bit safely → use
    # decimal-free approach: mask to 63 bits is lossy; keep as string hex.
    return out.append_column("simhash", pa.array([f"{v:016x}" for v in vals], pa.string()))


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


def minhash_candidates_dataset(ds, text_col: str = "text", bands: int = 16, rows: int = 4):
    """MinHash-LSH candidate pairs Dataset ``(d1, d2)`` (d1 < d2), distinct.

    Band shape sets the similarity threshold s ≈ (1/bands)^(1/rows): the
    16×4 default targets near-dups (s≈0.5); 32×2 is a high-recall setting
    for small eval corpora (more candidate pairs to verify).
    """
    import pandas as pd

    n_bands, n_rows = bands, rows
    bands = ds.map_batches(
        lambda b: minhash_bands_batch(b, text_col, n_bands, n_rows),
        batch_format="pyarrow",
    )

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one group per band (32 groups): vectorized self-merge on the bucket
        # hash instead of per-bucket python — pairs appear once per matching
        # band and are deduped by the final groupby
        g = g[["band_hash", "doc_id"]].drop_duplicates()
        m = g.merge(g, on="band_hash")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return m.rename(columns={"doc_id_x": "d1", "doc_id_y": "d2"})[
            ["d1", "d2"]
        ].drop_duplicates()

    _ = combinations  # kept for the per-bucket reference variant
    pairs = bands.groupby("band").map_groups(band_pairs, batch_format="pandas")
    return pairs.groupby(["d1", "d2"]).count()


def dedup_dataset(ds, keys: list[str]):
    """D1/D7 at scale: two-stage exact dedup on arbitrary key columns.

    Stage 1 (map-side combine): dedup inside each batch — a hub key with
    millions of duplicates collapses to ≤1 row per block BEFORE the shuffle,
    so no reducer sees the raw hot-key fanout (the salting strategy of
    SURVEY §7.4 realized as local pre-aggregation).
    Stage 2: global groupby(keys) keeping one row.
    """
    from ray.data.aggregate import Count

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        df = b.select(keys).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pre = ds.map_batches(local, batch_format="pyarrow")
    return pre.groupby(keys).aggregate(Count(alias_name="_n")).drop_columns(["_n"])
