"""Fuzzy self-join (edit distance <= 1 via deletion neighborhoods):
kernel differential vs byte-level DP, end-to-end vs brute force, unicode
byte semantics, group_cap."""
import numpy as np
import pyarrow as pa

from chronographer_ray.stages.fuzzy import (
    _deletion_variants,
    _lev_le1_mask,
    fuzzy_pairs_dataset,
)


def _lev_bytes(a: str, b: str) -> int:
    x, y = a.encode("utf-8"), b.encode("utf-8")
    m, n = len(x), len(y)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (x[i - 1] != y[j - 1])
            )
    return d[n]


def test_kernel_differential_random():
    import random

    random.seed(3)
    pool = ["".join(random.choices("ab1", k=random.randint(0, 6)))
            for _ in range(200)]
    pool += ["Customer#00012", "Customer#00013", "ab", "ba", "", "a",
             "ünïc", "ünic", "é", "è", "éé", "ee"]
    A, B = [], []
    for i in range(len(pool)):
        for j in range(i + 1, len(pool)):
            ba = len(pool[i].encode()); bb = len(pool[j].encode())
            if pool[i] != pool[j] and abs(ba - bb) <= 1:
                A.append(pool[i]); B.append(pool[j])
    got = _lev_le1_mask(np.array(A, object), np.array(B, object))
    exp = np.array([_lev_bytes(a, b) <= 1 for a, b in zip(A, B)])
    assert (got == exp).all()


def test_neighborhood_complete_for_true_pairs():
    # every byte-lev<=1 pair of valid UTF-8 strings shares a deletion
    # variant (candidate generation can't miss)
    names = ["abc", "abd", "ab", "abcd", "xbc", "é", "è", "aé", "a"]
    vsets = {}
    for s in names:
        v, _ = _deletion_variants([s])
        vsets[s] = set(v)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if a != b and _lev_bytes(a, b) <= 1:
                assert vsets[a] & vsets[b], (a, b)


def test_end_to_end_brute_force(ray_session):
    import ray.data as rd

    names = [f"Customer#{i:05d}" for i in range(80)] + ["ab", "ba", "abc"]
    t = pa.table({"name": pa.array(names, pa.string())})
    out = fuzzy_pairs_dataset(rd.from_arrow(t)).to_pandas()
    got = set(zip(out["name_a"], out["name_b"]))
    exp = {
        (min(a, b), max(a, b))
        for i, a in enumerate(names) for b in names[i + 1:]
        if a != b and _lev_bytes(a, b) <= 1
    }
    assert got == exp
    assert ("ab", "ba") not in got  # shared-variant false positive killed


def test_unicode_byte_semantics(ray_session):
    import ray.data as rd

    t = pa.table({"name": pa.array(["é", "è", "éé", "ee", "e"], pa.string())})
    out = fuzzy_pairs_dataset(rd.from_arrow(t)).to_pandas()
    got = set(zip(out["name_a"], out["name_b"]))
    # é (C3A9) vs è (C3A8): one byte substitution -> pair;
    # e vs ee: one byte insert -> pair;
    # éé vs ee: 4 byte edits -> no pair; é vs e: 2 -> no pair
    assert got == {("è", "é"), ("e", "ee")}


def test_group_cap_bounds_fanout(ray_session):
    import ray.data as rd

    names = [f"x{i}" for i in range(10)]  # all share variant "x"
    t = pa.table({"name": pa.array(names, pa.string())})
    full = fuzzy_pairs_dataset(rd.from_arrow(t)).to_pandas()
    capped = fuzzy_pairs_dataset(rd.from_arrow(t), group_cap=3).to_pandas()
    assert len(full) == 45 and len(capped) == 3


def test_entity_resolution_clusters_and_singletons(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.fuzzy import entity_resolution_dataset

    # alpha~alphb (substitution), alphb~alphbb (insertion) — one chained
    # cluster; zeta is a singleton; duplicates must not multiply rows
    names = ["alpha", "alphb", "alphbb", "zeta", "alpha"]
    ds = rd.from_arrow(pa.table({"name": pa.array(names, pa.string())}))
    df = entity_resolution_dataset(ds).to_pandas().sort_values(
        "name").reset_index(drop=True)
    got = dict(zip(df["name"], df["canonical"]))
    assert got == {"alpha": "alpha", "alphb": "alpha",
                   "alphbb": "alpha", "zeta": "zeta"}
    assert len(df) == 4  # one row per DISTINCT name
