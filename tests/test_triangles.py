"""Degree-oriented distributed triangle counting: planted graphs,
normalization invariance (direction/multiplicity/self-loops), hub
orientation, brute-force differential on a seeded random graph."""
from itertools import combinations

import numpy as np
import pyarrow as pa
import pytest

from chronographer_ray.stages.graph import triangles_dataset


def _edges_table(pairs):
    return pa.table({
        "src": pa.array([a for a, _ in pairs], pa.string()),
        "dst": pa.array([b for _, b in pairs], pa.string()),
    })


def _run(ray_pairs, **kw):
    import ray.data as rd

    out = (
        triangles_dataset(rd.from_arrow(_edges_table(ray_pairs)), **kw)
        .to_pandas()
    )
    if "node" not in out.columns:  # all-empty dataset caveat
        return {}
    return dict(zip(out["node"], out["triangles"]))


def _brute(pairs):
    adj: dict[str, set] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict[str, int] = {}
    for x, y, z in combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_k4_every_node_in_three_triangles(ray_session):
    nodes = ["a", "b", "c", "d"]
    pairs = list(combinations(nodes, 2))
    assert _run(pairs) == {n: 3 for n in nodes}


def test_path_graph_has_none(ray_session):
    assert _run([("a", "b"), ("b", "c"), ("c", "d")]) == {}


def test_normalization_invariance(ray_session):
    base = [("a", "b"), ("b", "c"), ("a", "c")]
    noisy = base + [("b", "a"), ("c", "b"), ("a", "a"), ("a", "b")]
    assert _run(base) == _run(noisy) == {"a": 1, "b": 1, "c": 1}


def test_star_hub_with_one_closing_edge(ray_session):
    # hub h connected to 9 leaves; one leaf-leaf edge closes ONE triangle.
    # Degree orientation points both closing-edge endpoints at the hub —
    # the wedge comes from the low-degree corner, not the hub's O(d^2).
    pairs = [("h", f"l{i}") for i in range(9)] + [("l0", "l1")]
    assert _run(pairs) == {"h": 1, "l0": 1, "l1": 1}


def test_brute_force_differential_random_graph(ray_session):
    rs = np.random.RandomState(7)
    n = 40
    pairs = []
    for i in range(n):
        for j in range(i + 1, n):
            if rs.rand() < 0.15:
                pairs.append((f"n{i}", f"n{j}"))
    expect = _brute(pairs)
    assert expect  # the seed must actually plant triangles
    assert _run(pairs, n_buckets=4) == expect


def test_modes_identical(ray_session):
    # shuffle path (forced via node_threshold=0) must match broadcast
    rs = np.random.RandomState(9)
    pairs = []
    for i in range(30):
        for j in range(i + 1, 30):
            if rs.rand() < 0.2:
                pairs.append((f"m{i}", f"m{j}"))
    bcast = _run(pairs, mode="broadcast")
    shuf = _run(pairs, mode="shuffle")
    auto_small = _run(pairs, node_threshold=0)  # auto flips to shuffle
    assert bcast == shuf == auto_small
    assert bcast  # non-trivial input


def test_clustering_coefficient_k4_and_star(ray_session):
    from itertools import combinations as _comb

    from chronographer_ray.stages.graph import clustering_coefficient_dataset
    import ray.data as rd

    # K4: every node has degree 3 and 3 triangles -> coefficient 1.0;
    # star+chord: hub degree 4 with 1 triangle -> 2/(4*3) = 1/6
    pairs = list(_comb(["a", "b", "c", "d"], 2)) \
        + [("h", x) for x in ("p", "q", "r", "s")] + [("p", "q")]
    t = pa.table({
        "src": pa.array([x for x, _ in pairs], pa.string()),
        "dst": pa.array([y for _, y in pairs], pa.string()),
    })
    out = clustering_coefficient_dataset(rd.from_arrow(t)).to_pandas()
    got = {r.node: (r.triangles, r.degree, r.coefficient)
           for r in out.itertuples()}
    for n in "abcd":
        assert got[n] == (3, 3, 1.0)
    assert got["h"] == (1, 4, 2.0 / (4.0 * 3.0))
    assert got["p"] == (1, 2, 1.0)
    assert "r" not in got  # leaf in no triangle
