"""Distributed BPE trainer: differential parity vs a reference in-memory
Sennrich trainer, layout invariance, encoder semantics."""
import numpy as np
import pandas as pd
import pyarrow as pa


def _reference_bpe(word_counts: dict, n_merges: int):
    """Sennrich training loop over a word histogram, same tie-break as the
    distributed trainer (max count, then lexicographic (left, right))."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < 2:
            break
        merges.append((l, r, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _counts(texts):
    wc = {}
    for t in texts:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    return wc


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low newer low lowest",
]


def test_bpe_train_matches_reference(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.bpe import bpe_train

    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(TEXTS)])
    got = bpe_train(ds, n_merges=10)
    want = _reference_bpe(_counts(TEXTS), 10)
    assert [(l, r, n) for l, r, n in
            zip(got["left"], got["right"], got["n"])] == want
    # layout invariance: one row per block learns the same table
    got1 = bpe_train(ds.repartition(4), n_merges=10)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  got1.reset_index(drop=True))


def test_bpe_apply_merges_order():
    from chronographer_ray.stages.bpe import apply_merges

    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("e", "r"): 2}
    assert apply_merges(list("lower"), ranks) == ["low", "er"]
    assert apply_merges(list("low"), ranks) == ["low"]
    assert apply_merges(list("xyz"), ranks) == ["x", "y", "z"]


def test_bpe_encode_counts(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.bpe import (
        apply_merges,
        bpe_encode_dataset,
        bpe_train,
    )

    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(TEXTS)])
    merges = bpe_train(ds, n_merges=8)
    ranks = {(l, r): i for i, (l, r) in
             enumerate(zip(merges["left"], merges["right"]))}
    out = (bpe_encode_dataset(ds, merges).to_pandas()
           .set_index("doc_id").sort_index())
    for i, t in enumerate(TEXTS):
        words = t.lower().split()
        want = sum(len(apply_merges(list(w), ranks)) for w in words)
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "n_bpe_tokens"] == want
        # merges only ever shrink the symbol count
        assert out.loc[i, "n_bpe_tokens"] <= sum(len(w) for w in words)


def test_apply_merges_properties():
    """Hypothesis: applying a learned rank table is idempotent on its own
    output and never grows the symbol count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from chronographer_ray.stages.bpe import apply_merges

    letters = st.text(alphabet="abc", min_size=1, max_size=12)
    pairs = st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "ab", "bc", "ca"]),
                  st.sampled_from(["a", "b", "c", "ab", "bc", "ca"])),
        max_size=6, unique=True)

    @settings(max_examples=200, deadline=None)
    @given(word=letters, merge_list=pairs)
    def run(word, merge_list):
        ranks = {p: i for i, p in enumerate(merge_list)}
        once = apply_merges(list(word), ranks)
        assert len(once) <= len(word)
        assert "".join(once) == word            # lossless
        # idempotent at SYMBOL level: nothing left to merge in the output
        assert apply_merges(once, ranks) == once

    run()
