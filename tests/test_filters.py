"""Unit tests for the Arrow filter kernels (M1-M6) — semantics mirror the
reference's src/interface.py behavior on inline tables."""
import pyarrow as pa

from chronographer_ray.stages import filters as F


def t(rows):
    return pa.table(
        {
            "subject": [r[0] for r in rows],
            "predicate": [r[1] for r in rows],
            "object": [r[2] for r in rows],
        }
    )


BASE = t(
    [
        ("http://ex.org/a", "http://ex.org/p1", "http://ex.org/b"),
        ("http://ex.org/a", "http://ex.org/p2", "http://other.org/c"),
        ("http://ex.org/Category:X", "http://ex.org/p1", "http://ex.org/b"),
        ("http://ex.org/a", "http://ex.org/p3", "http://ex.org/img.svg"),
        ("http://ex.org/a", "http://ex.org/p4", '"literal value"@en'),
    ]
)


def test_pred_filter_keep_and_drop():
    keep = F.filter_predicates(BASE, ["http://ex.org/p1"], keep=True)
    assert keep.num_rows == 2
    drop = F.filter_predicates(BASE, ["http://ex.org/p1"], keep=False)
    assert drop.num_rows == 3


def test_pred_filter_empty_set():
    assert F.filter_predicates(BASE, [], keep=False).num_rows == BASE.num_rows
    assert F.filter_predicates(BASE, [], keep=True).num_rows == 0


def test_namespace_filter_keeps_plain_literals_and_in_ns():
    tab = t(
        [
            ("http://ex.org/a", "p", "http://ex.org/b"),      # in-ns: kept
            ("http://ex.org/a", "p", "http://other.org/c"),   # other ns: dropped
            ("http://ex.org/a", "p", '"quoted"@en'),          # quoted literal: dropped
            ("http://ex.org/a", "p", "plain literal"),        # plain literal: kept
        ]
    )
    out = F.filter_namespace(tab, "http://ex.org")
    objs = out["object"].to_pylist()
    assert objs == ["http://ex.org/b", "plain literal"]


def test_node_pattern_filter_drops_prefix_and_svg():
    out = F.filter_node_patterns(BASE, ["http://ex.org/Category:"])
    subs = out["subject"].to_pylist()
    objs = out["object"].to_pylist()
    assert "http://ex.org/Category:X" not in subs
    assert "http://ex.org/img.svg" not in objs


def test_date_normalizer_truncation():
    col = pa.array(
        [
            '"1789-07-14"^^<http://www.w3.org/2001/XMLSchema#date>',
            '"1789-07-14T12:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>',
            '"1789"^^<http://www.w3.org/2001/XMLSchema#integer>',
            "http://ex.org/untouched",
        ]
    )
    out = F.normalize_date_literals(col).to_pylist()
    assert out == ["1789-07-14", "1789-07-14", "1789", "http://ex.org/untouched"]


def test_invalid_literal_filter():
    tab = t([("s", "p", '"Unknown"@'), ("s", "p", "keep")])
    out = F.filter_invalid_literals_and_normalize(tab)
    assert out["object"].to_pylist() == ["keep"]


def test_dedup_exact_keeps_first():
    tab = t([("a", "p", "b"), ("a", "p", "b"), ("a", "p", "c")])
    out = F.dedup_exact(tab, ["subject", "predicate", "object"])
    assert out.num_rows == 2


def test_is_in_filter_semi_anti():
    assert F.is_in_filter(BASE, "predicate", {"http://ex.org/p1"}, keep=True).num_rows == 2
    assert F.is_in_filter(BASE, "predicate", {"http://ex.org/p1"}, keep=False).num_rows == 3
    assert F.is_in_filter(BASE, "predicate", set(), keep=True).num_rows == 0
    assert F.is_in_filter(BASE, "predicate", set(), keep=False).num_rows == BASE.num_rows


def test_winnowing_fingerprints_overlap_under_edits():
    import pyarrow as pa

    from chronographer_ray.stages.text import winnowing_batch

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = a.replace("lazy", "hazy")  # one small edit
    c = "completely different content with no shared regions at all"
    t = winnowing_batch(pa.table({"doc_id": [1, 2, 3], "text": [a, b, c]}))
    f1, f2, f3 = (set(x) for x in t["fingerprints"].to_pylist())
    assert f1 and f2 and f3
    # identical input → identical fingerprints (determinism)
    t2 = winnowing_batch(pa.table({"doc_id": [1], "text": [a]}))
    assert set(t2["fingerprints"].to_pylist()[0]) == f1
    # one edit keeps most fingerprints; unrelated text shares almost none
    assert len(f1 & f2) / len(f1 | f2) > 0.5
    assert len(f1 & f3) / len(f1 | f3) < 0.1


def test_tfidf_topk_two_pass():
    import math

    import ray.data as rd

    from chronographer_ray.stages.text import tfidf_topk_dataset

    docs = [
        {"doc_id": 1, "text": "Apple apple   banana"},
        {"doc_id": 2, "text": "banana cherry"},
        {"doc_id": 3, "text": "cherry durian durian durian"},
        {"doc_id": 4, "text": "   "},  # excluded from N and output
    ]
    # split across blocks so pass-1 df partials actually merge in the shuffle
    ds = rd.from_items(docs, override_num_blocks=3)
    out = tfidf_topk_dataset(ds, k=1).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [1, 2, 3]
    ln3, ln15 = math.log(3), math.log(1.5)
    assert out.loc[1, "term"] == "apple"
    assert abs(out.loc[1, "tfidf"] - round(2 * ln3, 6)) < 1e-9
    # doc 2: banana and cherry tie (both tf=1, df=2) — term-asc tie-break
    assert out.loc[2, "term"] == "banana"
    assert abs(out.loc[2, "tfidf"] - round(ln15, 6)) < 1e-9
    assert out.loc[3, "term"] == "durian"
    assert abs(out.loc[3, "tfidf"] - round(3 * ln3, 6)) < 1e-9
    # k=2 keeps both tied terms of doc 2, ordered deterministically
    out2 = tfidf_topk_dataset(rd.from_items(docs), k=2).to_pandas()
    d2 = out2[out2["doc_id"] == 2].sort_values("term")
    assert list(d2["term"]) == ["banana", "cherry"]


def test_winnowing_batch_matches_per_doc_reference():
    """The whole-batch kernel must be bit-identical to _winnow_one on
    randomized inputs covering all three length regimes + empties."""
    import random

    import numpy as np
    import pyarrow as pa

    from chronographer_ray.stages.text import (
        _WINNOW_B,
        _winnow_one,
        normalize_text,
        winnowing_batch,
    )

    rng = random.Random(7)
    words = ["aa", "bb", "cat", "dog", "fish", "x"]
    texts = []
    for i in range(200):
        n = rng.choice([0, 1, 2, 3, 5, 8, 12, 40])
        texts.append(" ".join(rng.choice(words) for _ in range(n)))
    texts += ["", "   ", "ab", "abcd", "abcde", "abcdefgh", "abcdefghi"]
    # non-ASCII whitespace: U+00A0/U+2003 are NOT in the RE2/DuckDB \s
    # class — they must survive normalization (incl. at the edges) on both
    # the whole-batch kernel and the per-doc reference path
    texts += ["\u00a0padded\u00a0with nbsp\u00a0", "inner\u00a0nbsp word",
              "\u2003em-space\u2003edges\u2003", "\tmixed \u00a0 tab\t"]

    got = winnowing_batch(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))["fingerprints"].to_pylist()

    pows = _WINNOW_B ** np.arange(4, -1, -1, dtype=np.uint64)
    want = [_winnow_one(normalize_text(t), 5, 4, pows) for t in texts]
    assert got == want

    # third side of the triangle: the oracle's normalization expression
    # (DuckDB trim+regexp_replace, the exact winnow_sql prefix) must agree
    # with normalize_text on the non-ASCII-whitespace cases too
    import duckdb

    # DuckDB's bare trim() strips Unicode Zs (NBSP, em-space) while RE2 \s
    # and the kernels are ASCII-only — so every oracle trims ' ' explicitly
    for t_ in texts[-4:]:
        dnorm = duckdb.execute(
            "SELECT trim(regexp_replace(lower($1), '\\s+', ' ', 'g'), ' ')",
            [t_],
        ).fetchone()[0]
        assert dnorm == normalize_text(t_), repr(t_)
