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
