"""Benchmark decontamination: broadcast benchmark shingle set, map-only
training scan, overlap counts vs a brute-force string-shingle oracle."""
import numpy as np
import pyarrow as pa

from chronographer_ray.stages.decontam import (
    collect_benchmark_hashes,
    decontam_overlap_dataset,
    decontam_report,
)
from chronographer_ray.stages.dedup import shingles


def _docs():
    # doc 7 and 17 are "benchmark" (doc_id % 10 == 7)
    return [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "a completely unrelated sentence about ray data"},
        {"doc_id": 3, "text": "quick brown fox running fast"},
        {"doc_id": 4, "text": "short"},  # < 3 tokens: never flagged
        {"doc_id": 7, "text": "the quick brown fox sat still"},
        {"doc_id": 17, "text": "benchmark only phrase nothing shared"},
    ]


def _brute_force(docs):
    bench_sh = set()
    for d in docs:
        if d["doc_id"] % 10 == 7:
            bench_sh |= set(shingles(d["text"]))
    out = {}
    for d in docs:
        if d["doc_id"] % 10 == 7 or len(d["text"].split()) < 3:
            continue
        n = len(set(shingles(d["text"])) & bench_sh)
        if n:
            out[d["doc_id"]] = n
    return out


def test_decontam_matches_bruteforce(ray_session):
    import ray
    import ray.data as rd

    docs = _docs()
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in decontam_report(rd.from_items(docs)).take_all()
    }
    assert got == _brute_force(docs)
    # doc 1 and 3 share "quick brown fox" trigram with benchmark doc 7
    assert 1 in got and 3 in got and 2 not in got and 4 not in got


def test_decontam_empty_benchmark(ray_session):
    import ray
    import ray.data as rd

    ds = rd.from_items([{"doc_id": 1, "text": "one two three four"}])
    ref = ray.put(np.array([], np.uint64))
    assert decontam_overlap_dataset(ds, ref).take_all() == []


def test_collect_benchmark_hashes_distinct(ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [
            {"doc_id": 7, "text": "alpha beta gamma delta"},
            {"doc_id": 17, "text": "alpha beta gamma"},  # shared shingle
        ]
    )
    h = collect_benchmark_hashes(ds)
    # trigrams: {alpha-beta-gamma, beta-gamma-delta} + {alpha-beta-gamma}
    # -> 2 distinct hashes, sorted ascending
    assert h.size == 2 and h[0] < h[1]
