"""Inverted index: postings correctness, AND/OR search semantics,
partition pruning (only query-term partitions opened), resumable build."""
import glob
import json
import os
import shutil
import zlib

import pyarrow as pa

from chronographer_ray.stages.invindex import (
    _term_parts,
    build_inverted_index,
    search_index,
)


def _docs():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "alpha beta gamma alpha",
            "alpha beta",
            "gamma delta",
            "",
        ]),
    })


def _build(tmp_path, n_parts=8):
    import ray.data as rd

    root = str(tmp_path / "idx")
    build_inverted_index(rd.from_arrow(_docs()), root, n_parts=n_parts)
    return root


def test_and_or_semantics_and_tf_scores(ray_session, tmp_path):
    root = _build(tmp_path)
    both = search_index(root, ["alpha", "beta"], mode="and",
                        n_parts=8).to_pandas()
    got = dict(zip(both["doc_id"], both["score"]))
    assert got == {1: 3, 2: 2}  # doc1: alpha x2 + beta; doc2: 1+1
    any_ = search_index(root, ["alpha", "delta"], mode="or",
                        n_parts=8).to_pandas()
    got = dict(zip(any_["doc_id"], any_["score"]))
    assert got == {1: 2, 2: 1, 3: 1}


def test_unknown_term_and_empty(ray_session, tmp_path):
    root = _build(tmp_path)
    out = search_index(root, ["alpha", "zzz-not-there"], mode="and",
                       n_parts=8).to_pandas()
    assert len(out) == 0


def test_search_prunes_partitions(ray_session, tmp_path):
    # deleting every NON-query partition must not affect the search:
    # proof the probe never opens them
    root = _build(tmp_path)
    keep = set(_term_parts(["alpha"], 8))
    for d in glob.glob(os.path.join(root, "data", "part=*")):
        if int(d.rsplit("=", 1)[1]) not in keep:
            shutil.rmtree(d)
    out = search_index(root, ["alpha"], n_parts=8).to_pandas()
    assert dict(zip(out["doc_id"], out["score"])) == {1: 2, 2: 1}


def test_build_is_resumable(ray_session, tmp_path):
    import ray.data as rd

    root = _build(tmp_path)
    # simulate a crashed build: one partition loses its manifest
    parts = sorted(glob.glob(os.path.join(root, "data", "part=*")))
    victim = parts[0]
    os.remove(os.path.join(victim, "manifest.json"))
    before = {
        d: sorted(os.listdir(d)) for d in parts if d != victim
    }
    m = build_inverted_index(rd.from_arrow(_docs()), root, n_parts=8)
    assert m["complete"]
    # finished partitions untouched (same files), victim rebuilt
    for d, files in before.items():
        assert sorted(os.listdir(d)) == files
    assert os.path.exists(os.path.join(victim, "manifest.json"))
    out = search_index(root, ["alpha", "beta"], mode="and",
                       n_parts=8).to_pandas()
    assert dict(zip(out["doc_id"], out["score"])) == {1: 3, 2: 2}
