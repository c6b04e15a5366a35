"""Repetition quality filter: signal correctness on constructed docs,
threshold semantics, short-doc exclusion."""
import pyarrow as pa

from chronographer_ray.stages.quality import repetition_stats_batch


def _stats(texts):
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = repetition_stats_batch(t)
    return {r["doc_id"]: r for r in out.to_pylist()}


def test_repeated_text_flagged():
    s = _stats(
        [
            "one two three " * 20,          # 0: pure loop -> dup ~1
            " ".join(f"w{i}" for i in range(60)),  # 1: all-distinct prose
            "spam " * 50,                    # 2: single-token flood
            "hi",                            # 3: < 3 tokens, excluded
        ]
    )
    assert 3 not in s
    assert s[0]["dup_trigram_frac"] > 0.9 and not s[0]["keep_doc"]
    assert s[1]["dup_trigram_frac"] == 0.0 and s[1]["keep_doc"]
    assert s[2]["top_token_frac"] == 1.0 and not s[2]["keep_doc"]


def test_top_token_fraction_exact():
    # 10 tokens, 'a' appears 3 times -> 0.3; trigrams all distinct
    s = _stats(["a b c a d e a f g h"])
    r = s[0]
    assert r["n_tokens"] == 10
    assert abs(r["top_token_frac"] - 0.3) < 1e-12
    assert r["dup_trigram_frac"] == 0.0
    # 0.3 > MAX_TOP_TOKEN_FRAC (0.2) -> dropped despite zero repetition
    assert not r["keep_doc"]


def test_thresholds_are_parameters():
    t = pa.table({"doc_id": [0], "text": ["a b c a d e a f g h"]})
    out = repetition_stats_batch(t, max_top=0.5)
    assert out["keep_doc"].to_pylist() == [True]


def test_hashed_classifier_matches_reference_sums():
    """Per-doc score equals the straightforward per-feature recomputation
    (unigrams + adjacent bigrams, md5 bucket, Knuth-mix weight)."""
    import hashlib

    import pyarrow as pa

    from chronographer_ray.stages.quality import (
        WEIGHT_BUCKETS,
        hashed_classifier_batch,
    )

    def w(feature: str) -> int:
        h = int.from_bytes(hashlib.md5(feature.encode()).digest()[:8],
                           "little")
        b = h % WEIGHT_BUCKETS
        return (b * 2654435761) % (1 << 32) % 17 - 8

    texts = ["The quick brown fox", "fox Fox FOX", "", "  ", "one"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    out = hashed_classifier_batch(t).to_pandas().set_index("doc_id")
    for i, txt in enumerate(texts):
        toks = txt.lower().split()
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not feats:
            assert i not in out.index
            continue
        assert out.loc[i, "score"] == sum(w(f) for f in feats)
        assert out.loc[i, "n_features"] == len(feats)
        assert bool(out.loc[i, "label"]) == (sum(w(f) for f in feats) > 0)


def test_classifier_score_dataset_streams(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.quality import classifier_score_dataset

    ds = rd.from_items(
        [{"doc_id": i, "text": f"doc number {i} words here"}
         for i in range(50)]
    )
    out = classifier_score_dataset(ds).to_pandas()
    assert len(out) == 50
    assert set(out.columns) == {"doc_id", "n_features", "score", "label"}
