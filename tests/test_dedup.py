"""Dedup family: exact fingerprints, minhash/LSH recall, simhash locality,
n-gram jaccard."""
import pyarrow as pa

from chronographer_ray.stages.dedup import (
    jaccard,
    minhash_signature,
    shingles,
    simhash64,
)
from chronographer_ray.stages.text import fingerprint_batch

DOC_A = "the quick brown fox jumps over the lazy dog again and again"
DOC_A2 = "THE quick   brown fox jumps over the lazy dog again and again"  # ws/case only
DOC_B = "the quick brown fox jumps over the lazy cat again and again"  # 1 word changed
DOC_C = "completely different content about ray data pipelines at scale"


def test_fingerprint_normalizes_case_and_whitespace():
    t = pa.table({"doc_id": [1, 2], "text": [DOC_A, DOC_A2]})
    fp = fingerprint_batch(t)["fingerprint"].to_pylist()
    assert fp[0] == fp[1]


def test_shingles_and_jaccard():
    assert jaccard(DOC_A, DOC_A) == 1.0
    assert jaccard(DOC_A, DOC_A2) == 1.0
    assert 0.3 < jaccard(DOC_A, DOC_B) < 1.0
    assert jaccard(DOC_A, DOC_C) == 0.0
    assert shingles("one two") == ["one two"]
    assert shingles("") == []


def test_minhash_similarity_tracks_jaccard():
    sig_a = minhash_signature(DOC_A)
    sig_a2 = minhash_signature(DOC_A2)
    sig_b = minhash_signature(DOC_B)
    sig_c = minhash_signature(DOC_C)
    assert (sig_a == sig_a2).all()
    est_ab = (sig_a == sig_b).mean()
    est_ac = (sig_a == sig_c).mean()
    assert est_ab > 0.3
    assert est_ac < 0.1


def test_simhash_locality():
    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    ha, ha2, hb, hc = (simhash64(d) for d in (DOC_A, DOC_A2, DOC_B, DOC_C))
    assert ha == ha2
    assert hamming(ha, hb) < hamming(ha, hc)


def test_exact_dedup_dataset_groups(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.dedup import exact_dedup_dataset

    docs = rd.from_arrow(
        pa.table({"doc_id": [3, 1, 2, 4], "text": [DOC_A, DOC_A2, DOC_B, DOC_C]})
    )
    groups = exact_dedup_dataset(docs).to_pandas().set_index("fingerprint")
    assert len(groups) == 3
    dup_group = groups[groups["n_dups"] == 2]
    assert len(dup_group) == 1
    assert dup_group["keeper"].iloc[0] == 1  # min doc_id survives


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.dedup import minhash_candidates_dataset

    docs = rd.from_arrow(
        pa.table(
            {"doc_id": ["a", "b", "c", "d"], "text": [DOC_A, DOC_A2, DOC_B, DOC_C]}
        )
    )
    pairs = minhash_candidates_dataset(docs, bands=32, rows=2).to_pandas()
    got = set(zip(pairs["d1"], pairs["d2"]))
    assert ("a", "b") in got  # identical after normalization
    assert ("a", "c") in got or ("b", "c") in got  # near-dup caught by some band
    assert not any("d" in p for p in got)  # unrelated doc never a candidate


def test_minhash_lsh_bucket_cap(ray_session):
    """The band-bucket cap drops flood buckets (identical-text clique with
    a tiny cap → zero pairs, documenting the exact-dedup-first ordering
    assumption) and leaves sub-cap corpora untouched."""
    import ray.data as rd

    from chronographer_ray.stages.dedup import minhash_candidates_dataset

    flood = rd.from_arrow(
        pa.table({"doc_id": list(range(6)), "text": [DOC_A] * 6})
    )
    capped = minhash_candidates_dataset(flood, bands=32, rows=2, bucket_cap=3)
    assert capped.count() == 0  # every band floods at once for identical text
    uncapped = minhash_candidates_dataset(flood, bands=32, rows=2, bucket_cap=None)
    assert uncapped.count() == 15  # all 6-choose-2 pairs

    mixed = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": [DOC_A, DOC_B, DOC_C]})
    )
    with_cap = minhash_candidates_dataset(mixed, bands=32, rows=2, bucket_cap=1024)
    got = set(zip(*[with_cap.to_pandas()[c] for c in ("d1", "d2")]))
    assert (1, 2) in got  # near-dups below the cap are unaffected


def test_simhash_pairs_match_bruteforce_hamming(ray_session):
    """Banded SimHash pair finder ≡ brute-force Hamming≤3 over all pairs
    (pigeonhole guarantees exact recall at radius < n_bands)."""
    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.dedup import simhash_pairs_dataset, simhash_values

    # LONG docs with one-word edits: simhash bit majorities over ~200 tokens
    # are stable under a single substitution, so true Hamming≤3 pairs exist
    base = " ".join(f"word{i}" for i in range(200))
    texts = [
        base,
        base.replace("word7 ", "sword7 "),     # one-token edit → tiny distance
        base,                                   # exact duplicate → distance 0
        " ".join(f"other{i}" for i in range(200)),  # unrelated vocab
        base.replace("word3 ", "bird3 ").replace("word11 ", "herd11 "),
        "short unrelated text",
    ]
    docs = pa.table({"doc_id": list(range(len(texts))), "text": texts})

    vals = np.array(simhash_values(texts), dtype=np.uint64)
    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if bin(int(vals[i] ^ vals[j])).count("1") <= 3:
                want.add((i, j))

    got = simhash_pairs_dataset(rd.from_arrow(docs)).to_pandas()
    assert set(zip(got["d1"], got["d2"])) == want
    assert want  # the fixture must actually produce near-dup pairs


def test_ngram_jaccard_dataset_df_cap(ray_session):
    """df_cap drops hot shingles (the skew valve) — a pair connected only
    through a capped shingle disappears; exact pairs survive."""
    import ray.data as rd

    from chronographer_ray.stages.dedup import ngram_jaccard_dataset

    docs = [
        {"doc_id": 1, "text": "alpha beta gamma delta"},
        {"doc_id": 2, "text": "alpha beta gamma epsilon"},
        {"doc_id": 3, "text": "alpha beta gamma zeta"},
        {"doc_id": 4, "text": "unrelated words entirely here"},
    ]
    ds = rd.from_items(docs)
    full = ngram_jaccard_dataset(ds, tau=0.3, df_cap=None).to_pandas()
    assert {(1, 2), (1, 3), (2, 3)} <= set(zip(full["d1"], full["d2"]))
    # 'alpha beta gamma' appears in 3 docs → df_cap=2 removes it
    capped = ngram_jaccard_dataset(ds, tau=0.3, df_cap=2).to_pandas()
    assert capped.empty


def test_md5_variant_kernels_edge_cases_and_consistency():
    """The md5-injected oracle variants run the production kernels: empty
    docs get the Mersenne sentinel / zero fingerprint, short docs the
    sum-shingle fallback, and near-dup texts agree on more signature
    positions than unrelated texts (the minhash property the crc path is
    used for)."""
    import pyarrow as pa

    from chronographer_ray.stages.dedup import (
        _MERSENNE,
        minhash_md5_batch,
        simhash_md5_batch,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    batch = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [base, base + " tail", "totally different words here now",
                     "two tokens", ""],
        }
    )
    mh = minhash_md5_batch(batch).to_pandas()
    assert len(mh) == 5 * 64
    sig = {d: g.sort_values("perm")["sig"].to_numpy() for d, g in mh.groupby("doc_id")}
    near = (sig[1] == sig[2]).mean()
    far = (sig[1] == sig[3]).mean()
    assert near > far
    assert (sig[5] == int(_MERSENNE)).all()          # empty doc sentinel
    assert (sig[4] < int(_MERSENNE)).all()           # short-doc fallback ran
    sh = simhash_md5_batch(batch).to_pandas()
    assert sh.loc[sh.doc_id == 5, "simhash"].item() == "0" * 16
    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")
    s = dict(zip(sh.doc_id, sh.simhash))
    assert ham(s[1], s[2]) < ham(s[1], s[3])


def test_paragraph_dedup_removes_boilerplate_preserves_order(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.dedup import (
        duplicated_paragraphs_dataset,
        paragraph_dedup_dataset,
    )

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "alpha unique one. SHARED FOOTER. omega unique one",
            "beta unique two. SHARED FOOTER. psi unique two",
            "gamma only here",
        ], pa.string()),
    })
    ds = rd.from_arrow(docs)
    dup = duplicated_paragraphs_dataset(ds, min_df=2).to_pandas()
    assert dict(zip(dup["para"], dup["c"])) == {"SHARED FOOTER": 2}
    out = paragraph_dedup_dataset(ds, min_df=2).to_pandas()
    got = dict(zip(out["doc_id"], out["text"]))
    assert got == {
        0: "alpha unique one. omega unique one",
        1: "beta unique two. psi unique two",
        2: "gamma only here",
    }


def test_paragraph_dedup_all_dropped_is_empty_text(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.dedup import paragraph_dedup_dataset

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["SAME", "SAME"], pa.string()),
    })
    out = paragraph_dedup_dataset(rd.from_arrow(docs), min_df=2).to_pandas()
    assert sorted(out["text"]) == ["", ""]


def test_paragraph_dedup_null_text(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.dedup import paragraph_dedup_dataset

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["hello world", None], pa.string()),
    })
    out = paragraph_dedup_dataset(rd.from_arrow(docs), min_df=2).to_pandas()
    got = dict(zip(out["doc_id"], out["text"]))
    assert got == {0: "hello world", 1: ""}


def test_ngram_containment_asymmetric(ray_session):
    """A short doc fully embedded in a long one: containment short→long is
    1.0 while Jaccard stays below any dedup threshold — the case the
    directed sweep exists for. Direction matters: long→short is small."""
    import ray.data as rd

    from chronographer_ray.stages.dedup import (
        ngram_containment_dataset,
        ngram_jaccard_dataset,
    )

    short = "the quick brown fox jumps"
    long = (
        "intro sentence first. " + short +
        " and then a very long tail of completely unrelated filler words "
        "follows here so the union is much larger than the short set"
    )
    ds = rd.from_items([
        {"doc_id": 1, "text": short},
        {"doc_id": 2, "text": long},
    ])
    cont = ngram_containment_dataset(ds, tau=0.9, df_cap=None).to_pandas()
    pairs = set(zip(cont["src"], cont["dst"]))
    assert (1, 2) in pairs and (2, 1) not in pairs
    assert cont.loc[cont["src"] == 1, "containment"].iloc[0] == 1.0
    jac = ngram_jaccard_dataset(ds, tau=0.5, df_cap=None).to_pandas()
    assert jac.empty  # resemblance misses what containment catches


def test_ngram_containment_empty_input_keeps_schema(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.dedup import ngram_containment_dataset

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()), "text": ["only one doc here"],
    }))
    out = ngram_containment_dataset(ds, tau=0.5)
    assert {f.name for f in out.schema().base_schema} == {
        "src", "dst", "containment"}
    assert out.count() == 0


def test_cross_corpus_neardup_flags_paraphrased_leak(ray_session):
    """A train doc that lightly paraphrases an eval doc shares band buckets
    (flagged); an unrelated train doc does not. crc32 and md5 token-hash
    variants agree on WHICH docs are flagged."""
    import ray.data as rd

    from chronographer_ray.stages.dedup import cross_corpus_neardup_dataset

    eval_doc = ("what is the capital of france paris is the capital and "
                "largest city of france on the seine river")
    leak = ("what is the capital of france paris is the capital and "
            "largest city of france on the seine")  # near-dup of eval_doc
    clean = "ray data streams arrow blocks through an object store pipeline"
    train = rd.from_items([
        {"doc_id": 1, "text": leak},
        {"doc_id": 2, "text": clean},
    ])
    ev = rd.from_items([{"doc_id": 107, "text": eval_doc}])
    for th in ("crc32", "md5"):
        out = cross_corpus_neardup_dataset(train, ev, token_hash=th).to_pandas()
        assert set(out["doc_id"]) == {1}
        assert int(out["n_eval_matches"].iloc[0]) == 1


def test_cross_corpus_neardup_eval_bucket_cap(ray_session):
    """An eval-side boilerplate bucket (many eval docs, identical text) is
    dropped by the cap instead of flagging every train doc."""
    import ray.data as rd

    from chronographer_ray.stages.dedup import cross_corpus_neardup_dataset

    boiler = "copyright notice all rights reserved terms of service apply"
    ev = rd.from_items(
        [{"doc_id": 100 + i, "text": boiler} for i in range(5)]
    )
    train = rd.from_items([{"doc_id": 1, "text": boiler}])
    capped = cross_corpus_neardup_dataset(train, ev, eval_bucket_cap=3)
    assert capped.count() == 0
    uncapped = cross_corpus_neardup_dataset(
        train, ev, eval_bucket_cap=None).to_pandas()
    assert int(uncapped["n_eval_matches"].iloc[0]) == 5


def test_kwic_snippets_codepoint_exact(ray_session):
    """Non-ASCII prefix must not shift the window: pos and snippet are
    codepoint-based (the Arrow find_substring byte-offset trap)."""
    import ray.data as rd

    from chronographer_ray.stages.text import kwic_snippets_dataset

    ds = rd.from_items([
        {"doc_id": 1, "text": "éé needle in a haystack"},
        {"doc_id": 2, "text": "no match here"},
        {"doc_id": 3, "text": "x" * 100 + "needle tail"},
    ])
    out = (kwic_snippets_dataset(ds, term="needle", window=5)
           .to_pandas().set_index("doc_id"))
    assert list(out.index) == [1, 3]
    assert out.loc[1, "pos"] == 3          # codepoints, not bytes (5)
    assert out.loc[1, "snippet"] == "éé needle i"[0:10]
    assert out.loc[3, "pos"] == 100
    assert out.loc[3, "snippet"] == "x" * 5 + "needl"
