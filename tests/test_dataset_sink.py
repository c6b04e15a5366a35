"""Resumable dataset sink: partition manifests, idempotent retry, skip of
finished partitions (byte-untouched), completeness."""
import glob
import json
import os

import pyarrow as pa


def _docs(n=400):
    return [{"doc_id": i, "text": f"doc {i} body"} for i in range(n)]


def _mtimes(root):
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(root, "data", "part=*", "*.parquet"))
    }


def test_write_resume_skips_finished(ray_session, tmp_path):
    import ray.data as rd

    from chronographer_ray.state.dataset_sink import (
        finished_partitions,
        read_resumable,
        write_resumable,
    )

    root = str(tmp_path / "sink")
    n_parts = 8
    m1 = write_resumable(rd.from_items(_docs()), root, "doc_id", n_parts)
    assert m1["complete"] and m1["total_rows"] == 400
    assert finished_partitions(root, n_parts) == set(range(n_parts))
    before = _mtimes(root)

    # simulate a mid-run crash: half the partitions lose their manifest
    # (their data files are stale orphans that must NOT duplicate on retry)
    for i in range(0, n_parts, 2):
        os.remove(os.path.join(root, "data", f"part={i}", "manifest.json"))

    m2 = write_resumable(rd.from_items(_docs()), root, "doc_id", n_parts)
    assert m2["complete"] and m2["total_rows"] == 400

    after = _mtimes(root)
    # finished partitions: identical files, untouched on disk
    for p, t in before.items():
        part_i = int(p.split("part=")[1].split(os.sep)[0])
        if part_i % 2 == 1:
            assert after[p] == t

    # full read-back: same key multiset, no dups, no losses
    got = sorted(
        r["doc_id"] for r in read_resumable(root).select_columns(["doc_id"]).take_all()
    )
    assert got == list(range(400))


def test_string_keys_and_manifest_shape(ray_session, tmp_path):
    import ray.data as rd

    from chronographer_ray.state.dataset_sink import write_resumable

    root = str(tmp_path / "sink_str")
    rows = [{"k": f"key{i % 13}", "v": i} for i in range(100)]
    m = write_resumable(rd.from_items(rows), root, "k", n_parts=4)
    assert m["complete"] and m["total_rows"] == 100
    with open(os.path.join(root, "data", "part=0", "manifest.json")) as f:
        pm = json.load(f)
    assert set(pm) == {"rows", "files"}
