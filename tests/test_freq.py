"""Frequency-statistics stages: exact/CMS heavy hitters, PMI bigrams."""
import math

import pytest

import ray.data as rd


def _docs(rows, blocks=3):
    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(rows)],
        override_num_blocks=blocks,
    )


def test_heavy_hitters_exact_counts_and_tiebreak():
    from chronographer_ray.stages.freq import heavy_hitters_dataset

    ds = _docs(["b b b a a c", "a c  B", "   ", "zz zz"])
    out = heavy_hitters_dataset(ds, k=3).to_pandas()
    # a:3, b:4 (lowercased 'B' folds in), c:2, zz:2 → top3 = b, a, then the
    # c/zz tie resolves term-ascending
    assert list(out["term"]) == ["b", "a", "c"]
    assert list(out["n"]) == [4, 3, 2]


def test_cms_matches_exact_on_corpus():
    from chronographer_ray.stages.freq import (
        cms_heavy_hitters_dataset, heavy_hitters_dataset, term_counts_dataset,
    )

    ds = _docs([f"w{i % 7} filler{i} common common" for i in range(60)], blocks=4)
    exact = heavy_hitters_dataset(ds, k=8).to_pandas()
    approx = cms_heavy_hitters_dataset(ds, k=8).to_pandas()
    true = dict(zip(*[term_counts_dataset(ds).to_pandas()[c] for c in ("term", "n")]))
    # CMS never underestimates
    for t, e in zip(approx["term"], approx["n_est"]):
        assert e >= true[t]
    # at this width (2^16) vs tiny vocab, estimates are exact and the
    # top-k sets coincide
    assert list(approx["term"]) == list(exact["term"])
    assert list(approx["n_est"]) == list(exact["n"])


def test_cms_empty_corpus():
    from chronographer_ray.stages.freq import cms_heavy_hitters_dataset

    out = cms_heavy_hitters_dataset(_docs(["  ", ""])).to_pandas()
    assert len(out) == 0


def test_pmi_bigrams_manual():
    from chronographer_ray.stages.freq import pmi_bigrams_dataset

    # docs "x y z x y", "y x", "z" → tokens x:3 y:3 z:2 (T=8);
    # bigrams x_y:2, y_z:1, z_x:1, y_x:1 (B=5) → only x_y has count ≥ 2
    ds = _docs(["x y z x y", "y x", "z"], blocks=2)
    out = pmi_bigrams_dataset(ds, min_count=2).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["w1"], row["w2"], row["n"]) == ("x", "y", 2)
    expected = round(math.log((2 / 5) / ((3 / 8) * (3 / 8))), 6)
    assert row["pmi"] == pytest.approx(expected, abs=1e-9)


def test_pmi_join_path_matches_broadcast():
    from chronographer_ray.stages.freq import pmi_bigrams_dataset

    texts = ["x y z x y w q", "y x w w q y z", "z q x y", "w q"] * 3
    ds = _docs(texts, blocks=3)
    bcast = (pmi_bigrams_dataset(ds, min_count=2).to_pandas()
             .sort_values(["w1", "w2"]).reset_index(drop=True))
    # broadcast_vocab_limit=0 forces the distributed-join attach path
    joined = (pmi_bigrams_dataset(ds, min_count=2, broadcast_vocab_limit=0)
              .to_pandas().sort_values(["w1", "w2"]).reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(bcast, joined[bcast.columns])


def test_pmi_no_cross_doc_bigrams():
    from chronographer_ray.stages.freq import pmi_bigrams_dataset

    # "a b" only ever spans a doc boundary → must not count
    ds = _docs(["q a", "b q a", "b q"], blocks=1)
    out = pmi_bigrams_dataset(ds, min_count=1).to_pandas()
    assert "b" not in set(out[out["w1"] == "a"]["w2"])


def test_doc_df_score_matches_bruteforce(ray_session):
    """df_score = Σ bit_length(df) over a doc's DISTINCT tokens, df counted
    corpus-wide; empty docs dropped."""
    import ray.data as rd

    from chronographer_ray.stages.freq import doc_df_score_dataset

    texts = {
        1: "apple banana apple",          # distinct: apple banana
        2: "apple cherry",
        3: "banana banana apple",
        4: "",
    }
    ds = rd.from_items(
        [{"doc_id": k, "text": v} for k, v in texts.items()]
    )
    out = doc_df_score_dataset(ds).to_pandas().set_index("doc_id")
    df = {"apple": 3, "banana": 2, "cherry": 1}
    for k, v in texts.items():
        toks = set(v.split())
        if not toks:
            assert k not in out.index
            continue
        assert out.loc[k, "n_terms"] == len(toks)
        assert out.loc[k, "df_score"] == sum(df[t].bit_length() for t in toks)


def test_doc_df_score_join_path_identical(ray_session):
    """Forcing broadcast_vocab_limit=0 takes the distributed-join attach;
    output must be bit-identical to the broadcast path (the PMI gate
    contract)."""
    import ray.data as rd

    from chronographer_ray.stages.freq import doc_df_score_dataset

    ds = rd.from_items(
        [{"doc_id": i, "text": f"shared token{i % 7} word{i % 3} tail"}
         for i in range(60)]
    )
    a = (doc_df_score_dataset(ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (doc_df_score_dataset(ds, broadcast_vocab_limit=0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_term_category_assoc_matches_bruteforce(ray_session):
    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.freq import term_category_assoc_dataset

    docs = (
        [{"doc_id": i, "source": "a", "text": "apple apple banana"}
         for i in range(3)]
        + [{"doc_id": 10 + i, "source": "b", "text": "cherry banana"}
           for i in range(3)]
    )
    out = (term_category_assoc_dataset(
        rd.from_items(docs), category_col="source", min_count=3)
        .to_pandas().set_index(["term", "category"]))
    # counts: apple/a=6, banana/a=3, cherry/b=3, banana/b=3; N=15
    assert set(out.index) == {("apple", "a"), ("banana", "a"),
                              ("cherry", "b"), ("banana", "b")}

    def chi2(n11, t_tot, c_tot, nn):
        n10, n01 = t_tot - n11, c_tot - n11
        n00 = nn - t_tot - n01
        d = float(n11 * n00 - n10 * n01)
        return nn * (d * d) / (float(t_tot * (nn - t_tot))
                               * float(c_tot * (nn - c_tot)))

    assert out.loc[("apple", "a"), "chi2"] == chi2(6, 6, 9, 15)
    assert out.loc[("cherry", "b"), "chi2"] == chi2(3, 3, 6, 15)
    # banana is evenly spread but categories differ in size → small chi2
    assert out.loc[("banana", "a"), "chi2"] == chi2(3, 6, 9, 15)


def test_lm_score_matches_bruteforce(ray_session):
    """Add-one bigram LM: logP(w2|w1) = ln(c12+1) - ln(c1+V) with c1 the
    context count from the bigram table and V the distinct-token vocab;
    per-doc sum/ppl round-6. Docs with < 2 tokens emit no row."""
    import math

    import ray.data as rd

    from chronographer_ray.stages.freq import lm_score_dataset

    texts = {
        1: "the cat sat",
        2: "the cat ran",
        3: "cat the cat",
        4: "solo",          # 1 token → no bigram → no row
        5: "",              # empty → no row
    }
    ds = rd.from_items([{"doc_id": k, "text": v} for k, v in texts.items()])
    out = lm_score_dataset(ds).to_pandas().set_index("doc_id")

    # brute-force LM
    from collections import Counter

    bigrams = Counter()
    vocab = set()
    for v in texts.values():
        toks = v.lower().split()
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
    ctx = Counter()
    for (a, _), c in bigrams.items():
        ctx[a] += c
    V = len(vocab)
    for k, v in texts.items():
        toks = v.lower().split()
        if len(toks) < 2:
            assert k not in out.index
            continue
        lps = [math.log(bigrams[(a, b)] + 1) - math.log(ctx[a] + V)
               for a, b in zip(toks, toks[1:])]
        assert out.loc[k, "n_bigrams"] == len(lps)
        assert out.loc[k, "lm_logprob"] == round(sum(lps), 6)
        assert out.loc[k, "lm_ppl"] == round(
            math.exp(-sum(lps) / len(lps)), 6)


def test_lm_score_join_path_identical(ray_session):
    """broadcast_vocab_limit=0 forces the two tagged-union zip exchanges;
    output must be bit-identical to the broadcast path."""
    import pandas as pd
    import ray.data as rd

    from chronographer_ray.stages.freq import lm_score_dataset

    ds = rd.from_items(
        [{"doc_id": i,
          "text": f"alpha beta{i % 5} gamma{i % 3} alpha beta{i % 5}"}
         for i in range(80)]
    )
    a = (lm_score_dataset(ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (lm_score_dataset(ds, broadcast_vocab_limit=0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_zipf_fit_matches_numpy_regression(ray_session):
    """Slope/intercept equal a single-process ln-ln least squares over
    the exact top-N terms; vocab/token totals exact."""
    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.freq import zipf_fit_dataset

    rng = np.random.RandomState(2)
    # Zipfian corpus: term_i drawn with p ∝ 1/(i+1)
    p = 1.0 / np.arange(1, 51)
    p /= p.sum()
    docs = [" ".join(f"w{j}" for j in rng.choice(50, size=30, p=p))
            for _ in range(40)]
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(docs)])
    out = zipf_fit_dataset(ds, top_n=20).to_pandas().iloc[0]

    from collections import Counter

    c = Counter(w for t in docs for w in t.split())
    assert out["vocab_size"] == len(c)
    assert out["total_tokens"] == sum(c.values())
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    k = len(top)
    x = np.log(np.arange(1, k + 1, dtype=np.float64))
    y = np.log(np.array([n for _, n in top], np.float64))
    sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert out["n_top"] == k
    assert out["zipf_slope"] == round(slope, 6)
    assert out["zipf_intercept"] == round((sy - slope * sx) / k, 6)
    assert out["zipf_slope"] < -0.5      # Zipfian input → steep negative


def test_term_divergence_matches_bruteforce(ray_session):
    """KL/JS over add-one-smoothed unigram distributions of the two
    sides; identical corpora give ~0; totals/vocab exact ints."""
    import math

    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.freq import term_divergence_dataset

    docs = (
        [{"doc_id": i, "text": "alpha beta gamma alpha", "source": "src0"}
         for i in range(20)]
        + [{"doc_id": 100 + i, "text": "alpha delta delta", "source": "src1"}
           for i in range(30)]
    )
    ds = rd.from_items(docs).repartition(3)
    out = term_divergence_dataset(ds).to_pandas().iloc[0]

    from collections import Counter

    ca, cb = Counter(), Counter()
    for d in docs:
        side = ca if int(d["source"][3:]) % 2 == 0 else cb
        side.update(d["text"].split())
    vocab = sorted(set(ca) | set(cb))
    n_a, n_b, V = sum(ca.values()), sum(cb.values()), len(vocab)
    assert out["n_a"] == n_a and out["n_b"] == n_b and out["vocab"] == V
    p = np.array([(ca[t] + 1.0) / (n_a + V) for t in vocab])
    q = np.array([(cb[t] + 1.0) / (n_b + V) for t in vocab])
    m = 0.5 * (p + q)
    assert out["kl_ab"] == round(float(np.sum(p * np.log(p / q))), 6)
    assert out["kl_ba"] == round(float(np.sum(q * np.log(q / p))), 6)
    assert out["js"] == round(float(
        0.5 * (np.sum(p * np.log(p / m)) + np.sum(q * np.log(q / m)))), 6)
    assert out["js"] > 0

    same = rd.from_items(
        [{"doc_id": i, "text": "x y z", "source": f"src{i % 2}"}
         for i in range(40)])
    out2 = term_divergence_dataset(same).to_pandas().iloc[0]
    assert abs(out2["js"]) < 1e-6


def test_lm_score_pair_key_not_ambiguous(ray_session):
    """Regression: vectorized `+ "\\x00"` drops the NUL, which would make
    bigrams ("ab","c") and ("a","bc") share one broadcast key and swap
    their c12 counts. The corpora here contain exactly that colliding
    pair with different counts; broadcast and join paths must agree."""
    import pandas as pd
    import ray.data as rd

    from chronographer_ray.stages.freq import lm_score_dataset

    docs = ([{"doc_id": i, "text": "ab c x"} for i in range(5)]
            + [{"doc_id": 100 + i, "text": "a bc y"} for i in range(2)])
    ds = rd.from_items(docs)
    a = (lm_score_dataset(ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (lm_score_dataset(ds, broadcast_vocab_limit=0).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
