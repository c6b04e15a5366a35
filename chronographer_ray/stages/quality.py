"""Repetition-based quality filtering (Gopher/C4-style): per-document
duplicate-n-gram fraction and top-token concentration, with a composite
keep decision.

Repetition is the strongest cheap predictor of low-quality generated /
boilerplate text (Rae et al. 2021 "Gopher" §A1.1 repetition rules;
Raffel et al. 2020 C4 filters). Two signals per document:

- ``dup_trigram_frac`` = 1 - distinct_trigrams / total_trigrams —
  near-zero for natural prose, high for looped/template text;
- ``top_token_frac``   = count(most frequent token) / n_tokens —
  catches single-token floods the trigram signal can miss.

Pure ``map_batches`` and fully vectorized — Arrow tokenization
(`tokenize_batch_flat`), one whole-batch rolling-hash pass
(`shingle_hashes_flat`), then per-doc distinct/top counts via ONE lexsort
+ ONE composite-key `np.unique` over the flat streams (no per-doc Python
at all; the per-doc-loop version measured 10.1 s for 1M docs, this one
~3 s). No shuffle, no state — the filter streams at read bandwidth,
which is what a 100 TB hygiene pass needs.

No reference-file counterpart (LLM-pipeline charter, SURVEY §2.9).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import shingle_hashes_flat, tokenize_batch_flat

# Gopher-flavored defaults: docs repeating >30% of their trigrams or
# spending >20% of tokens on one word are dropped.
MAX_DUP_TRIGRAM_FRAC = 0.3
MAX_TOP_TOKEN_FRAC = 0.2


def repetition_stats_batch(batch: pa.Table, text_col: str = "text",
                           min_tokens: int = 3,
                           max_dup: float = MAX_DUP_TRIGRAM_FRAC,
                           max_top: float = MAX_TOP_TOKEN_FRAC) -> pa.Table:
    """(doc_id, n_tokens, dup_trigram_frac, top_token_frac, keep_doc) for
    docs with >= min_tokens tokens (shorter docs carry no trigram signal
    and are the length filter's job, not this one's)."""
    ids, offsets, tok_crc = tokenize_batch_flat(batch[text_col])
    lens = np.diff(offsets)
    ndocs = lens.size
    keep = lens >= max(min_tokens, 3)
    sh, tri_doc = shingle_hashes_flat(ids, offsets, tok_crc)

    # distinct trigrams per doc: lexsort (doc, hash) pairs, count group heads
    order = np.lexsort((sh, tri_doc))
    sd, ss = tri_doc[order], sh[order]
    head = np.ones(sd.size, dtype=bool)
    if sd.size > 1:
        head[1:] = (sd[1:] != sd[:-1]) | (ss[1:] != ss[:-1])
    dist_tri = np.bincount(sd[head], minlength=ndocs)
    total_tri = np.maximum(lens - 2, 0)

    # top-token count per doc: composite (doc << 32 | token_id) group count
    doc_of_tok = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
    key = (doc_of_tok << np.int64(32)) | ids
    uk, counts = np.unique(key, return_counts=True)
    top_cnt = np.zeros(ndocs, dtype=np.int64)
    np.maximum.at(top_cnt, (uk >> np.int64(32)).astype(np.int64), counts)

    safe_tri = np.maximum(total_tri, 1)
    dup = (1.0 - dist_tri / safe_tri)[keep]
    top = (top_cnt / np.maximum(lens, 1))[keep]
    return pa.table(
        {
            "doc_id": pa.array(
                batch["doc_id"].to_numpy(zero_copy_only=False)[keep], pa.int64()
            ),
            "n_tokens": pa.array(lens[keep], pa.int64()),
            "dup_trigram_frac": pa.array(dup, pa.float64()),
            "top_token_frac": pa.array(top, pa.float64()),
            "keep_doc": pa.array((dup <= max_dup) & (top <= max_top)),
        }
    )


def repetition_filter_dataset(ds, text_col: str = "text",
                              batch_size: int = 128, **kw):
    """Full stats table; compose with a keep_doc filter to drop.

    ``batch_size=128`` keeps each batch's lexsort working set (~2 uint64
    arrays of ~13k trigrams) L2-resident: with 32 workers saturating one
    memory bus, cache-resident sorts measured 2.8 s for 1M docs vs 24 s
    at whole-block batches (the same kernel, 8.5× apart purely on batch
    size — see BASELINE.md round-2 notes)."""
    return ds.map_batches(
        lambda b: repetition_stats_batch(b, text_col, **kw),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


# ------------------------------------------------- hashed linear classifier
WEIGHT_BUCKETS = 1 << 20
_KNUTH_C = 2654435761  # Knuth multiplicative constant (TAOCP vol. 3 §6.4)


def _bucket_weights(h: np.ndarray, weight_buckets: int = WEIGHT_BUCKETS
                    ) -> np.ndarray:
    """int64 weight in [-8, 8] per feature hash: bucket into the bounded
    weight table (the hashing trick — Weinberger et al. 2009, "Feature
    hashing for large scale multitask learning"), then a Knuth
    multiplicative mix stands in for the trained coefficient. All integer
    (< 2^52, no overflow) so the DuckDB oracle reproduces every weight:
    ``CAST((((md5_number_upper(f) % B) * 2654435761) % 4294967296) % 17
    AS BIGINT) - 8``."""
    b = h % np.uint64(weight_buckets)
    return ((b * np.uint64(_KNUTH_C)) % np.uint64(1 << 32)
            % np.uint64(17)).astype(np.int64) - 8


def hashed_classifier_batch(batch: pa.Table, text_col: str = "text",
                            weight_buckets: int = WEIGHT_BUCKETS) -> pa.Table:
    """fastText-shaped quality classifier → (doc_id, n_features, score,
    label): linear model over hashed unigram + adjacent-bigram features
    (Joulin et al. 2017, "Bag of tricks for efficient text
    classification"), score = Σ weight[bucket(f)] over ALL feature
    occurrences, label = score > 0.

    This is the SHAPE of model-based quality filtering (CCNet/DCLM-style
    fastText gates) with the trained weight table replaced by a
    deterministic hash-derived one, so the whole scorer — tokenize, hash,
    bucket, sum — is reproducible in SQL and driver-certifiable. Swapping
    in real trained weights is a broadcast table lookup in the same spot.

    Map-only, zero exchanges: per batch, ONE md5 per DISTINCT token and
    per DISTINCT bigram (dictionary-encoded; the flat token stream never
    sees per-occurrence hashing), weights gathered by code, per-doc sums
    via ``np.add.at`` on int64 (bit-exact — no float accumulation). Docs
    with zero features (empty/whitespace text) are dropped, matching the
    oracle's GROUP BY over the feature stream. md5 is the SQL bridge
    (``md5_number_upper``); a production deployment swaps xxhash into
    `_bucket_weights`'s input with the identical dataflow."""
    from .dedup import md5_token_hashes

    ids, offsets, _, vocab = tokenize_batch_flat(
        batch[text_col], return_vocab=True
    )
    n_docs = batch.num_rows
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(offsets))
    score = np.zeros(n_docs, np.int64)
    n_feat = np.zeros(n_docs, np.int64)
    if len(ids):
        uni_w = _bucket_weights(md5_token_hashes(vocab), weight_buckets)
        np.add.at(score, doc_idx, uni_w[ids])
        n_feat += np.bincount(doc_idx, minlength=n_docs)
        # adjacent bigrams within a doc: distinct-code pairs hashed once
        same = doc_idx[1:] == doc_idx[:-1]
        if same.any():
            lo, hi = ids[:-1][same], ids[1:][same]
            codes = lo * np.int64(len(vocab)) + hi
            ucodes, inv = np.unique(codes, return_inverse=True)
            va = np.array(vocab, dtype=object)
            bigrams = [
                f"{a} {b}"
                for a, b in zip(va[ucodes // len(vocab)],
                                va[ucodes % len(vocab)])
            ]
            bi_w = _bucket_weights(md5_token_hashes(bigrams), weight_buckets)
            bi_doc = doc_idx[:-1][same]
            np.add.at(score, bi_doc, bi_w[inv])
            n_feat += np.bincount(bi_doc, minlength=n_docs)
    keep = n_feat > 0
    kept_idx = pa.array(np.flatnonzero(keep))
    import pyarrow.compute as pc

    return pa.table({
        "doc_id": pc.take(batch["doc_id"], kept_idx),
        "n_features": pa.array(n_feat[keep]),
        "score": pa.array(score[keep]),
        "label": pa.array(score[keep] > 0),
    })


def classifier_score_dataset(ds, text_col: str = "text",
                             weight_buckets: int = WEIGHT_BUCKETS):
    """`hashed_classifier_batch` over the corpus — pure map, streams at
    read bandwidth (the model-gate stage of a hygiene funnel)."""
    return ds.map_batches(
        lambda b: hashed_classifier_batch(b, text_col, weight_buckets),
        batch_format="pyarrow",
    )
