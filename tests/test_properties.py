"""Property-based tests (hypothesis) — invariants the example-based suite
can't sweep: arbitrary unicode text through the dedup/text kernels, random
tables through the two-stage dedup, random date literals through the
normalizer. The reference has no property tests (SURVEY §5); these guard the
rebuild's vectorized kernels against edge cases the synthetic corpus never
produces."""
import string

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from chronographer_ray.stages.dedup import (
    jaccard,
    minhash_signature,
    minhash_signatures_fast,
    shingles,
    simhash64,
    simhash_values,
)
from chronographer_ray.stages.filters import normalize_date_literals
from chronographer_ray.stages.text import fingerprint_batch, normalize_text

TEXT = st.text(
    alphabet=string.ascii_lowercase + string.digits + " .,\t\né中", max_size=300
)


@given(st.lists(TEXT, max_size=20))
@settings(max_examples=50, deadline=None)
def test_simhash_batch_equals_scalar(texts):
    """The vectorized batch-vocabulary SimHash must equal the per-doc scalar
    reference implementation on arbitrary text."""
    assert simhash_values(list(texts)) == [simhash64(t) for t in texts]


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_minhash_signature_is_permutation_min(text):
    """Signature values never exceed the Mersenne modulus and are invariant
    under shingle duplication (min over a multiset == min over the set)."""
    sig = minhash_signature(text)
    assert (sig <= (1 << 61) - 1).all()
    doubled = text + " " + text
    assert minhash_signature(text).shape == minhash_signature(doubled).shape


@given(st.lists(TEXT, min_size=1, max_size=10))
@settings(max_examples=50, deadline=None)
def test_minhash_fast_identical_docs_share_signature(texts):
    """Identical docs always get identical fast signatures (the LSH banding
    soundness precondition)."""
    doubled = list(texts) + list(texts)
    sigs = minhash_signatures_fast(doubled)
    n = len(texts)
    for i in range(n):
        assert (sigs[i] == sigs[n + i]).all()


@given(TEXT, TEXT)
@settings(max_examples=100, deadline=None)
def test_jaccard_bounds_and_identity(a, b):
    j = jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert jaccard(a, a) == 1.0
    assert j == jaccard(b, a)


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_fingerprint_normalization_idempotent(text):
    """normalize_text is idempotent ⇒ fingerprints are whitespace-stable."""
    once = normalize_text(text)
    assert normalize_text(once) == once
    b1 = pa.table({"doc_id": [1], "text": [text]})
    b2 = pa.table({"doc_id": [1], "text": [" ".join(text.split())]})
    f1 = fingerprint_batch(b1)["fingerprint"].to_pylist()
    f2 = fingerprint_batch(b2)["fingerprint"].to_pylist()
    assert f1 == f2


@given(st.lists(st.integers(1000, 9999), min_size=0, max_size=10))
@settings(max_examples=50, deadline=None)
def test_date_normalizer_truncation_rule(years):
    """XSD date literals truncate to YYYY-MM-DD (reference slice [1:11]),
    bare values pass through unchanged."""
    lits = [f'"{y}-01-02"^^<http://www.w3.org/2001/XMLSchema#date>' for y in years]
    plain = [f"v{y}" for y in years]
    out = normalize_date_literals(pa.chunked_array([pa.array(lits + plain)]))
    got = out.to_pylist()
    assert got[: len(years)] == [f"{y}-01-02" for y in years]
    assert got[len(years):] == plain


@given(st.lists(TEXT, min_size=2, max_size=8))
@settings(max_examples=30, deadline=None)
def test_shingle_count_linear(texts):
    for t in texts:
        toks = normalize_text(t).split()
        sh = shingles(t)
        if len(toks) >= 3:
            assert len(sh) == len(toks) - 2
        elif toks:
            assert sh == [" ".join(toks)]
        else:
            assert sh == []


SPAN = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["text", "image", "audio", "video"]),
        "text": st.text(max_size=60),
        "media_ref": st.text(max_size=20),
        "offset": st.integers(0, 2**31 - 1),
    }
)
DOC = st.fixed_dictionaries(
    {"doc_id": st.text(min_size=1, max_size=12), "spans": st.lists(SPAN, max_size=6)}
)


@given(st.lists(DOC, min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_linker_span_passthrough_property(docs):
    """The graft's per-row invariant under ARBITRARY span structures: the
    linker's output spans column is byte-identical to its input (kind, text,
    media_ref, offset, order), mentions only appended."""
    from chronographer_ray.data.synth import DOC_SCHEMA
    from chronographer_ray.data.synth import entity_label_map
    from chronographer_ray.stages.linker import MentionLinker

    batch = pa.Table.from_pylist(
        [{"doc_id": d["doc_id"], "spans": d["spans"]} for d in docs],
        schema=DOC_SCHEMA,
    )
    out = MentionLinker(entity_label_map())(batch)
    assert out["doc_id"].to_pylist() == batch["doc_id"].to_pylist()
    assert out["spans"].to_pylist() == batch["spans"].to_pylist()
    assert out.schema.field("mentions") is not None


@given(st.lists(TEXT, max_size=20))
@settings(max_examples=50, deadline=None)
def test_tokenize_flat_equals_loop_tokenizer(texts):
    """The Arrow-vectorized flat tokenizer must produce the same per-doc
    token CRC sequences as the Python-loop tokenizer (ids live in
    different spaces — insertion vs dictionary order — so compare through
    the crc mapping, which is what every consumer reads)."""
    import numpy as np
    import zlib

    from chronographer_ray.stages.dedup import tokenize_batch, tokenize_batch_flat

    texts = list(texts)
    ids, offsets, tok_crc = tokenize_batch_flat(texts)
    vocab, doc_tok = tokenize_batch(texts)
    inv = list(vocab)
    for i in range(len(texts)):
        flat_crc = tok_crc[ids[offsets[i]:offsets[i + 1]]].tolist()
        loop_crc = [zlib.crc32(inv[j].encode("utf-8")) for j in doc_tok[i]]
        assert flat_crc == loop_crc


@given(st.lists(TEXT, max_size=20))
@settings(max_examples=50, deadline=None)
def test_shingle_flat_equals_per_doc(texts):
    """Whole-batch rolling-hash shingles must equal the per-doc kernel
    concatenated over docs with >= 3 tokens."""
    import numpy as np

    from chronographer_ray.stages.dedup import (
        _shingle_hashes_fast,
        shingle_hashes_flat,
        tokenize_batch_flat,
    )

    texts = list(texts)
    ids, offsets, tok_crc = tokenize_batch_flat(texts)
    sh, doc_idx = shingle_hashes_flat(ids, offsets, tok_crc)
    for i in range(len(texts)):
        seg = ids[offsets[i]:offsets[i + 1]]
        got = sh[doc_idx == i].tolist()
        if seg.size >= 3:
            exp = _shingle_hashes_fast(seg.astype("int64"), tok_crc).tolist()
            assert got == exp
        else:
            assert got == []


@given(st.lists(TEXT, max_size=10))
@settings(max_examples=50, deadline=None)
def test_pii_redaction_idempotent(texts):
    """Redacting already-redacted text is a no-op: placeholders never
    re-match any pattern."""
    import pyarrow as pa

    from chronographer_ray.stages.pii import redact_batch

    t = pa.table({"doc_id": list(range(len(texts))), "text": list(texts)})
    once = redact_batch(t)
    again = redact_batch(
        pa.table({"doc_id": once["doc_id"], "text": once["clean_text"]})
    )
    assert again["clean_text"].to_pylist() == once["clean_text"].to_pylist()
    assert all(n == 0 for n in again["n_redactions"].to_pylist())


@given(st.lists(TEXT, max_size=16))
@settings(max_examples=40, deadline=None)
def test_flat_signatures_equal_per_doc_api(texts):
    """The flat flagship kernels (minhash signatures, LSH band rows,
    simhash) must be VALUE-IDENTICAL to the per-doc reference API — the
    production dedup queries and the headline bench run the flat path."""
    import numpy as np
    import pyarrow as pa

    from chronographer_ray.stages.dedup import (
        minhash_bands_batch,
        minhash_bands_from_signatures,
        minhash_signatures_fast,
        minhash_signatures_from_flat,
        simhash_values,
        simhash_values_from_flat,
        tokenize_batch_flat,
    )

    texts = list(texts)
    ids, offsets, tok_crc, vocab = tokenize_batch_flat(texts, return_vocab=True)
    sigs = minhash_signatures_from_flat(ids, offsets, tok_crc)
    assert np.array_equal(sigs, minhash_signatures_fast(texts))
    assert simhash_values_from_flat(ids, offsets, tok_crc, vocab) == simhash_values(
        texts
    )
    if texts:
        b = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array([t or "" for t in texts], pa.string()),
            }
        )
        assert minhash_bands_from_signatures(sigs, b["doc_id"]).equals(
            minhash_bands_batch(b)
        )


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=60), min_size=0, max_size=4),
    st.data(),
)
def test_chunking_covers_every_token_in_order(ray_session, doc_lens, data):
    size = data.draw(st.integers(min_value=2, max_value=10))
    stride = data.draw(st.integers(min_value=1, max_value=size))
    """Every token appears in ≥1 chunk; concatenating stride-prefixes +
    the final chunk reconstructs the doc; window arithmetic matches the
    definition for arbitrary (size, stride)."""
    import ray.data as rd

    from chronographer_ray.stages.text import chunk_documents_dataset

    docs = pa.table({
        "doc_id": pa.array(range(len(doc_lens)), pa.int64()),
        "text": pa.array(
            [" ".join(f"t{d}_{i}" for i in range(n)) for d, n in
             enumerate(doc_lens)],
            pa.string()),
    })
    out = chunk_documents_dataset(
        rd.from_arrow(docs), size=size, stride=stride
    ).to_pandas()
    for d, n in enumerate(doc_lens):
        rows = out[out["doc_id"] == d].sort_values("chunk_idx")
        toks = [f"t{d}_{i}" for i in range(n)]
        if n == 0:
            assert len(rows) == 0
            continue
        import math
        assert len(rows) == 1 + math.ceil(max(n - size, 0) / stride)
        rebuilt = []
        for _, r in rows.iterrows():
            w = r["chunk"].split(" ")
            assert w == toks[r["chunk_idx"] * stride:
                             r["chunk_idx"] * stride + size]
            assert r["n_tokens"] == len(w)
            rebuilt.extend(w[:stride] if r["chunk_idx"] < len(rows) - 1 else w)
        assert rebuilt[:n] == toks or sorted(set(rebuilt)) == sorted(set(toks))
