"""Duplicated-span (exact-substring, Lee et al. 2022) operators:
coverage measurement + scrub, crc/md5 twin parity, interval-union edge
cases (overlapping windows, doc boundaries, short/empty docs)."""
import numpy as np
import pyarrow as pa
import pytest

from chronographer_ray.stages.dedup import (
    dup_span_coverage_dataset,
    duplicated_span_vocab_dataset,
    span_scrub_dataset,
)


def _docs():
    return pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "The quick brown fox jumps over the lazy dog",
            "a quick brown fox jumps over me now",
            "short doc",
            "",
            "The quick brown fox jumps over the lazy dog",
        ]),
    })


@pytest.mark.parametrize("method", ["crc", "md5"])
def test_coverage_planted(ray_session, method):
    import ray.data as rd

    cov = (
        dup_span_coverage_dataset(rd.from_arrow(_docs()), n=5, min_count=2,
                                  method=method)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert cov["total_tokens"].tolist() == [9, 8, 2, 0, 9]
    # doc0/doc4 are exact dups: all 5 windows dup, all 9 tokens covered.
    # doc1 shares ONE lowered 5-gram ("quick brown fox jumps over").
    assert cov["dup_windows"].tolist() == [5, 1, 0, 0, 5]
    assert cov["dup_tokens"].tolist() == [9, 5, 0, 0, 9]


def test_scrub_removes_covered_tokens(ray_session):
    import ray.data as rd

    scr = (
        span_scrub_dataset(rd.from_arrow(_docs()), n=5, min_count=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # original case preserved in the remainder; dup docs scrub to empty
    assert scr["text"].tolist() == ["", "a me now", "short doc", "", ""]


def test_overlapping_windows_union_not_double_counted(ray_session):
    import ray.data as rd

    # one 6-token repeated run => two overlapping dup 5-windows covering
    # exactly 6 tokens (not 10)
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta END0",
            "alpha beta gamma delta epsilon zeta END1",
        ]),
    })
    cov = (
        dup_span_coverage_dataset(rd.from_arrow(t), n=5, min_count=2)
        .to_pandas().sort_values("doc_id")
    )
    assert cov["dup_windows"].tolist() == [2, 2]
    assert cov["dup_tokens"].tolist() == [6, 6]


def test_within_doc_repeat_counts(ray_session):
    import ray.data as rd

    # the duplicated window occurs twice INSIDE one doc: corpus count >= 2
    # holds without any second doc
    t = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["a b c d e X a b c d e"]),
    })
    cov = (
        dup_span_coverage_dataset(rd.from_arrow(t), n=5, min_count=2)
        .to_pandas()
    )
    assert cov["dup_windows"].tolist() == [2]
    assert cov["dup_tokens"].tolist() == [10]


def test_crc_md5_twins_agree_on_corpus(ray_session):
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    out = {}
    for m in ("crc", "md5"):
        out[m] = (
            dup_span_coverage_dataset(ds, n=5, min_count=2, method=m)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
    # hash spaces differ; the detected duplicate STRUCTURE must not
    for col in ("total_tokens", "dup_windows", "dup_tokens"):
        assert out["crc"][col].tolist() == out["md5"][col].tolist()
    assert int(out["crc"]["dup_windows"].sum()) > 0  # corpus has real dups


def test_vocab_min_count_threshold(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "p q r s t tail0", "p q r s t tail1", "p q r s t tail2",
        ]),
    })
    ds = rd.from_arrow(t)
    assert duplicated_span_vocab_dataset(ds, n=5, min_count=2).count() == 1
    assert duplicated_span_vocab_dataset(ds, n=5, min_count=4).count() == 0


def test_empty_vocab_passthrough(ray_session):
    import ray.data as rd

    # min_count unreachable -> empty dup vocab (Ray returns a column-less
    # frame for all-empty datasets; regression for the driver-side guard)
    ds = rd.from_arrow(_docs())
    cov = dup_span_coverage_dataset(ds, n=5, min_count=10**9).to_pandas()
    assert cov["dup_windows"].sum() == 0 and cov["dup_tokens"].sum() == 0
    scr = (
        span_scrub_dataset(ds, n=5, min_count=10**9)
        .to_pandas().sort_values("doc_id")
    )
    # scrub with nothing to remove == whitespace-normalized original
    orig = _docs().to_pandas().sort_values("doc_id")
    assert scr["text"].tolist() == [
        " ".join(t.split()) for t in orig["text"].tolist()
    ]
