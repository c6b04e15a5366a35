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


def _ref_bm25(docs: pa.Table, terms: list[str], topk: int = 20):
    """Reference scorer in plain Python, same op order as the kernel."""
    texts = docs["text"].to_pylist()
    ids = docs["doc_id"].to_pylist()
    toks = [t.lower().split() for t in texts]
    n_docs = len(ids)
    total_len = sum(len(t) for t in toks)
    avglen = float(total_len) / n_docs
    term_sorted = sorted(set(terms))
    df = {t: sum(1 for tk in toks if t in tk) for t in term_sorted}
    out = {}
    for i, tk in enumerate(toks):
        score = 0.0
        for t in term_sorted:
            tf = tk.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = ((n_docs - df[t]) + 0.5) / (df[t] + 0.5)
            score = score + idf * (
                (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(tk) / avglen))))
        if score > 0:
            out[ids[i]] = score
    ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    return ranked


def test_bm25_ranking_and_scores(ray_session, tmp_path):
    import ray.data as rd

    from chronographer_ray.stages.invindex import bm25_search, build_bm25_index

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "alpha beta alpha alpha",          # high tf for alpha
            "alpha beta",                      # short, both terms
            "alpha " + "filler " * 50,         # long doc penalized
            "beta beta",                       # rare-term doc
            "",                                # empty
        ]),
    })
    root = str(tmp_path / "bm25")
    build_bm25_index(rd.from_arrow(docs), root, n_parts=8)
    got = bm25_search(root, ["alpha", "beta"], topk=20,
                      n_parts=8).to_pandas()
    want = _ref_bm25(docs, ["alpha", "beta"])
    assert list(zip(got["doc_id"], got["score"])) == want
    # length normalization: doc 2 (short) outranks doc 3 (long) on alpha
    pos = {d: i for i, d in enumerate(got["doc_id"])}
    assert pos[2] < pos[3]


def test_bm25_no_matching_terms(ray_session, tmp_path):
    import ray.data as rd

    from chronographer_ray.stages.invindex import bm25_search, build_bm25_index

    root = str(tmp_path / "bm25e")
    build_bm25_index(rd.from_arrow(_docs()), root, n_parts=8)
    got = bm25_search(root, ["zzznope"], n_parts=8).to_pandas()
    assert len(got) == 0


def test_phrase_search(ray_session, tmp_path):
    import ray.data as rd

    from chronographer_ray.stages.invindex import (
        build_positional_index,
        phrase_search,
    )

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "the cat sat on the mat",
            "cat sat cat sat cat",      # "cat sat" twice, "cat sat cat" twice
            "sat the cat",              # words present, wrong order
            "THE CAT sat",              # case-folded match
            "",
        ]),
    })
    root = str(tmp_path / "pidx")
    build_positional_index(rd.from_arrow(docs), root, n_parts=8)

    out = phrase_search(root, ["cat", "sat"]).to_pandas()
    got = dict(zip(out["doc_id"], out["n_matches"]))
    assert got == {1: 1, 2: 2, 4: 1}

    # repeated word in the phrase
    out2 = phrase_search(root, ["cat", "sat", "cat"]).to_pandas()
    got2 = dict(zip(out2["doc_id"], out2["n_matches"]))
    assert got2 == {2: 2}

    # absent phrase → empty with typed schema
    out3 = phrase_search(root, ["dog", "sat"]).to_pandas()
    assert len(out3) == 0


def test_cli_positional_index(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd  # noqa: F401  (ray session for CLI fns)

    from chronographer_ray.__main__ import cmd_index

    docs_path = str(tmp_path / "docs.parquet")
    pq.write_table(_docs(), docs_path)

    class A:
        pass

    a = A()
    a.op = "build-pos"
    a.docs = docs_path
    a.root = str(tmp_path / "pidx")
    a.id_col, a.text_col = "doc_id", "text"
    a.parts = 8
    a.terms, a.mode, a.head = [], "and", 20
    cmd_index(a)

    b = A()
    b.op = "phrase"
    b.root = a.root
    b.id_col = "doc_id"
    b.parts = 32  # wrong on purpose: manifest must override
    b.terms = ["alpha", "beta"]
    b.mode, b.head = "and", 20
    b.text_col = "text"
    cmd_index(b)  # prints doc 1 and 2 (both contain "alpha beta")
