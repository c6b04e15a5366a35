"""Sequence packing: prefix-sum correctness, block-layout invariance,
sparse ids, capacity chunking."""
import numpy as np

from chronographer_ray.stages.packing import sequence_pack_dataset


def _check_prefix(rows, capacity):
    rows = sorted(rows, key=lambda r: r["doc_id"])
    off = 0
    for r in rows:
        assert r["tok_offset"] == off
        assert r["bin_id"] == off // capacity
        off += r["n_tokens"]


def test_pack_matches_serial_prefix_sum(ray_session):
    import ray.data as rd

    docs = [{"doc_id": i, "text": " ".join(["w"] * (1 + i % 7))} for i in range(100)]
    rows = sequence_pack_dataset(rd.from_items(docs), capacity=16).take_all()
    assert len(rows) == 100
    _check_prefix(rows, 16)


def test_pack_layout_invariant_and_sparse_ids(ray_session):
    import ray.data as rd

    # sparse, unordered ids across oddly-sized blocks
    ids = [5, 900, 17, 3, 44, 101, 512, 77, 600, 9]
    docs = [{"doc_id": i, "text": " ".join(["t"] * (1 + i % 5))} for i in ids]
    a = sequence_pack_dataset(rd.from_items(docs), capacity=4).take_all()
    b = sequence_pack_dataset(
        rd.from_items(docs).repartition(7), capacity=4
    ).take_all()
    key = lambda rs: sorted((r["doc_id"], r["tok_offset"], r["bin_id"]) for r in rs)
    assert key(a) == key(b)
    _check_prefix(a, 4)


def test_pack_single_range(ray_session):
    import ray.data as rd

    docs = [{"doc_id": i, "text": "a b c"} for i in range(5)]
    rows = sequence_pack_dataset(rd.from_items(docs), capacity=1000, n_ranges=1).take_all()
    _check_prefix(rows, 1000)
    assert all(r["bin_id"] == 0 for r in rows)
    assert sorted(r["tok_offset"] for r in rows) == [0, 3, 6, 9, 12]
