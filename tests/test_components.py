"""Connected components (hash-min label propagation) and cluster dedup."""
import numpy as np
import pyarrow as pa
import pytest

from chronographer_ray.stages.components import (
    connected_components_dataset,
    dedup_survivors_dataset,
)


def _union_find_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Reference: min-id component labels via union-find."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict[int, list[int]] = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    return {n: min(members) for members in roots.values() for n in members}


def _cc(pairs: list[tuple[int, int]], local_threshold: int = 100_000) -> dict[int, int]:
    import ray.data as rd

    t = pa.table(
        {
            "d1": pa.array([p[0] for p in pairs], pa.int64()),
            "d2": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    df = connected_components_dataset(
        rd.from_arrow(t), local_threshold=local_threshold
    ).to_pandas()
    return dict(zip(df["node"], df["component"]))


import pytest as _pytest


@_pytest.mark.parametrize("thr", [100_000, 0])  # local AND distributed paths
def test_cc_chain_and_clique(ray_session, thr):
    # multi-hop chain (diameter 4) + clique + isolated pair
    pairs = [(5, 4), (4, 3), (3, 2), (2, 1), (10, 11), (10, 12), (11, 12), (20, 21)]
    got = _cc(pairs, local_threshold=thr)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_matches_union_find_random(ray_session):
    rng = np.random.RandomState(7)
    nodes = rng.choice(1000, size=120, replace=False)
    pairs = [
        (int(nodes[i]), int(nodes[j]))
        for i, j in rng.randint(0, len(nodes), size=(80, 2))
        if i != j
    ]
    assert _cc(pairs) == _union_find_components(pairs)
    # distributed fixpoint must agree on the same random graph
    assert _cc(pairs, local_threshold=0) == _union_find_components(pairs)


def test_cc_empty(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table({"d1": pa.array([], pa.int64()), "d2": pa.array([], pa.int64())})
    )
    assert connected_components_dataset(empty).count() == 0


def test_cc_duplicate_and_self_edges(ray_session):
    # repeated pairs and self-loops must not break the fixpoint
    got = _cc([(1, 2), (2, 1), (1, 2), (3, 3)])
    assert got == {1: 1, 2: 1, 3: 3}


def test_dedup_survivors(ray_session):
    import ray.data as rd

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(30), pa.int64()),
                  "text": ["x"] * 30})
    )
    pairs = rd.from_arrow(
        pa.table({"d1": pa.array([1, 2, 7], pa.int64()),
                  "d2": pa.array([2, 3, 8], pa.int64())})
    )
    kept = sorted(dedup_survivors_dataset(docs, pairs).to_pandas()["doc_id"])
    assert kept == [i for i in range(30) if i not in (2, 3, 8)]


def test_dedup_survivors_no_pairs(ray_session):
    import ray.data as rd

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": ["x"] * 5})
    )
    empty = rd.from_arrow(
        pa.table({"d1": pa.array([], pa.int64()), "d2": pa.array([], pa.int64())})
    )
    assert dedup_survivors_dataset(docs, empty).count() == 5


@pytest.mark.parametrize("n_buckets", [1, 4])
def test_cc_bucket_invariance(ray_session, n_buckets):
    import ray.data as rd

    pairs = rd.from_arrow(
        pa.table({"d1": pa.array([9, 8, 7], pa.int64()),
                  "d2": pa.array([8, 7, 6], pa.int64())})
    )
    df = connected_components_dataset(pairs, n_buckets=n_buckets).to_pandas()
    assert dict(zip(df["node"], df["component"])) == {6: 6, 7: 6, 8: 6, 9: 6}
