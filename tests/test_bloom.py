"""Bloom-filter semi-join: no false negatives, bounded fp rate, exactness."""
import numpy as np

import ray.data as rd


def test_bloom_no_false_negatives_and_fp_bounded():
    from chronographer_ray.stages.bloom import bloom_contains, build_bloom

    member_keys = np.arange(0, 30000, 3, dtype=np.int64)
    small = rd.from_items([{"k": int(x)} for x in member_keys],
                          override_num_blocks=5)
    words, m, k = build_bloom(small, "k")
    probe = np.arange(30000, dtype=np.int64)
    hit = bloom_contains(words, m, k, probe)
    member = np.zeros(30000, dtype=bool)
    member[::3] = True
    assert hit[member].all()  # never drops a real key
    fp = hit[~member].mean()
    assert fp < 0.05  # 10 bits/key, 7 hashes → ~1% theoretical


def test_bloom_semi_join_exact_vs_plain():
    from chronographer_ray.stages.bloom import bloom_semi_join

    big = rd.from_items(
        [{"bk": int(i % 500), "v": i} for i in range(4000)],
        override_num_blocks=6,
    )
    small = rd.from_items([{"k": i} for i in range(0, 500, 7)],
                          override_num_blocks=3)
    out = bloom_semi_join(big, small, on="bk", right_on="k").to_pandas()
    keys = set(range(0, 500, 7))
    expect = [(i % 500, i) for i in range(4000) if (i % 500) in keys]
    got = sorted(zip(out["bk"], out["v"]))
    assert got == sorted(expect)


def test_bloom_empty_small_side():
    from chronographer_ray.stages.bloom import bloom_semi_join

    big = rd.from_items([{"bk": i, "v": i} for i in range(100)])
    small = rd.from_items([{"k": 1}]).filter(lambda r: False)
    out = bloom_semi_join(big, small, on="bk", right_on="k").to_pandas()
    assert len(out) == 0
