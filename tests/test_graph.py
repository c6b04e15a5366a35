"""Graph analytics: degree top-k, integer PageRank (both modes,
bit-identical), string-node components."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from chronographer_ray.stages.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    degree_topk_dataset,
    kg_components_dataset,
    pagerank_dataset,
)


def _triples(edges: list[tuple[str, str]], extra_literals: bool = True):
    import ray.data as rd

    rows = {"subject": [], "predicate": [], "object": []}
    for s, o in edges:
        rows["subject"].append(s)
        rows["predicate"].append("ex:linksTo")
        rows["object"].append(o)
    if extra_literals:
        # literal objects must be excluded from the graph
        rows["subject"].append(edges[0][0])
        rows["predicate"].append("rdfs:label")
        rows["object"].append("Some Label")
    return rd.from_arrow(pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()}))


def _ref_pagerank(edges: list[tuple[str, str]], iters: int = 3) -> dict[str, int]:
    """Reference: the integer recurrence in plain Python dicts."""
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN
    nodes = sorted({n for e in edges for n in e})
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: PR_SCALE for n in nodes}
    for _ in range(iters):
        s_in = {n: 0 for n in nodes}
        for s, o in edges:
            s_in[o] += r[s] // outdeg[s]
        r = {n: base + PR_DAMP_NUM * s_in[n] // PR_DAMP_DEN for n in nodes}
    return r


EDGES = [
    ("ex:a", "ex:b"), ("ex:a", "ex:c"), ("ex:b", "ex:c"), ("ex:c", "ex:a"),
    ("ex:d", "ex:c"), ("ex:d", "ex:hub"), ("ex:a", "ex:hub"),
    ("ex:b", "ex:hub"), ("ex:c", "ex:hub"),  # ex:hub is a pure sink
]


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_degree_topk(ray_session, mode):
    df = degree_topk_dataset(_triples(EDGES), k=3, mode=mode).to_pandas()
    # manual: degree = out+in over URI edges only
    deg = {}
    out = {}
    ind = {}
    for s, o in EDGES:
        out[s] = out.get(s, 0) + 1
        ind[o] = ind.get(o, 0) + 1
    for n in set(out) | set(ind):
        deg[n] = out.get(n, 0) + ind.get(n, 0)
    want = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(df["node"], df["degree"])) == want
    assert list(df.columns) == ["node", "out_deg", "in_deg", "degree"]
    hub = df[df["node"] == "ex:hub"]
    if len(hub):
        assert int(hub["out_deg"].iloc[0]) == 0


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_pagerank_matches_reference_recurrence(ray_session, mode):
    df = pagerank_dataset(_triples(EDGES), iters=3, mode=mode).to_pandas()
    got = dict(zip(df["node"], df["rank"]))
    assert got == _ref_pagerank(EDGES, iters=3)


def test_pagerank_modes_bit_identical(ray_session):
    a = pagerank_dataset(_triples(EDGES), iters=2, mode="broadcast").to_pandas()
    b = pagerank_dataset(_triples(EDGES), iters=2, mode="shuffle").to_pandas()
    assert dict(zip(a["node"], a["rank"])) == dict(zip(b["node"], b["rank"]))


def test_estimate_node_count(ray_session):
    from chronographer_ray.stages.graph import estimate_node_count, kg_edges

    n = estimate_node_count(kg_edges(_triples(EDGES)))
    assert n == len({x for e in EDGES for x in e})


def test_auto_mode_picks_shuffle_above_threshold(ray_session):
    """mode='auto' with a threshold below the node count must take the
    shuffle path (no driver-side node fold) and stay bit-identical to the
    broadcast plan (VERDICT r2 #3)."""
    from chronographer_ray.stages import graph as G

    want_pr = _ref_pagerank(EDGES, iters=2)
    # force the shuffle path: 5 distinct nodes > threshold 2
    df = pagerank_dataset(
        _triples(EDGES), iters=2, mode="auto", auto_node_threshold=2
    ).to_pandas()
    assert dict(zip(df["node"], df["rank"])) == want_pr
    # checkpointing is broadcast-only: the auto->shuffle flip must refuse it
    with pytest.raises(ValueError):
        pagerank_dataset(
            _triples(EDGES), iters=2, mode="auto", auto_node_threshold=2,
            checkpoint_dir="/tmp/should_not_be_used",
        )
    # and with a high threshold auto resolves to broadcast, same values
    df_b = pagerank_dataset(
        _triples(EDGES), iters=2, mode="auto",
        auto_node_threshold=G.AUTO_NODE_THRESHOLD,
    ).to_pandas()
    assert dict(zip(df_b["node"], df_b["rank"])) == want_pr

    d_lo = degree_topk_dataset(
        _triples(EDGES), k=3, mode="auto", auto_node_threshold=2
    ).to_pandas()
    d_hi = degree_topk_dataset(_triples(EDGES), k=3, mode="auto").to_pandas()
    assert d_lo.to_dict("records") == d_hi.to_dict("records")


def test_pagerank_mass_positive_and_sink_accumulates(ray_session):
    df = pagerank_dataset(_triples(EDGES), iters=3).to_pandas()
    assert (df["rank"] > 0).all()
    ranks = dict(zip(df["node"], df["rank"]))
    # the sink receives from 4 nodes, more than any other node's in-flow
    assert ranks["ex:hub"] == max(ranks.values())


def test_empty_edge_set(ray_session):
    """Triples with only literal objects → every op returns a typed empty
    result (regression: the broadcast pagerank hit Ray's column-less
    empty-to_pandas caveat)."""
    import ray.data as rd

    t = pa.table(
        {
            "subject": pa.array(["ex:a", "ex:b"], pa.string()),
            "predicate": pa.array(["rdfs:label"] * 2, pa.string()),
            "object": pa.array(["A", "B"], pa.string()),
        }
    )
    ds = rd.from_arrow(t)
    assert len(degree_topk_dataset(ds, k=5).to_pandas()) == 0
    assert len(degree_topk_dataset(ds, k=5, mode="shuffle").to_pandas()) == 0
    assert len(pagerank_dataset(ds).to_pandas()) == 0
    assert len(pagerank_dataset(ds, mode="shuffle").to_pandas()) == 0
    assert len(kg_components_dataset(ds).to_pandas()) == 0


def test_kg_components_string_nodes(ray_session):
    import ray.data as rd

    rows = [
        ("ex:c1", "ex:inNation", "ex:n1"),
        ("ex:c2", "ex:inNation", "ex:n1"),
        ("ex:n1", "ex:inRegion", "ex:r1"),
        ("ex:c3", "ex:inNation", "ex:n2"),
        ("ex:n2", "ex:inRegion", "ex:r2"),
        # noise predicate — must be ignored
        ("ex:c1", "ex:placedBy", "ex:c3"),
    ]
    t = pa.table(
        {
            "subject": pa.array([r[0] for r in rows], pa.string()),
            "predicate": pa.array([r[1] for r in rows], pa.string()),
            "object": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    df = kg_components_dataset(rd.from_arrow(t)).to_pandas()
    got = dict(zip(df["node"], df["component"]))
    assert got == {
        "ex:c1": "ex:c1", "ex:c2": "ex:c1", "ex:n1": "ex:c1", "ex:r1": "ex:c1",
        "ex:c3": "ex:c3", "ex:n2": "ex:c3", "ex:r2": "ex:c3",
    }


from hypothesis import given, settings
import hypothesis.strategies as st


@st.composite
def _digraphs(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    n_edges = draw(st.integers(min_value=1, max_value=16))
    edges = []
    for _ in range(n_edges):
        s = draw(st.integers(min_value=0, max_value=n - 1))
        o = draw(st.integers(min_value=0, max_value=n - 1))
        edges.append((f"ex:n{s}", f"ex:n{o}"))
    return edges


@settings(max_examples=8, deadline=None)
@given(_digraphs())
def test_pagerank_property_random_digraphs(ray_session, edges):
    """Broadcast pagerank == the plain-dict integer recurrence on random
    digraphs (self-loops and parallel edges included — parallel edges
    count double in out-degree and in-flow, matching SQL's bag
    semantics)."""
    df = pagerank_dataset(_triples(edges, extra_literals=False),
                          iters=2).to_pandas()
    got = dict(zip(df["node"], df["rank"]))
    assert got == _ref_pagerank(edges, iters=2)


def test_entity_similarity_jaccard(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.graph import entity_similarity_dataset

    rows = [
        # a and b share 2 of 3 neighbors; c shares 1 with a
        ("ex:a", "ex:linksTo", "ex:x"), ("ex:a", "ex:linksTo", "ex:y"),
        ("ex:a", "ex:linksTo", "ex:z"),
        ("ex:b", "ex:linksTo", "ex:x"), ("ex:b", "ex:linksTo", "ex:y"),
        ("ex:c", "ex:linksTo", "ex:z"), ("ex:c", "ex:linksTo", "ex:w"),
        # duplicate edge must not double-count
        ("ex:a", "ex:linksTo", "ex:x"),
        # hub neighbor above cap must be excluded everywhere
        ("ex:a", "ex:linksTo", "ex:hub"), ("ex:b", "ex:linksTo", "ex:hub"),
        ("ex:c", "ex:linksTo", "ex:hub"), ("ex:d", "ex:linksTo", "ex:hub"),
        # literal — not an edge
        ("ex:a", "rdfs:label", "Alpha"),
    ]
    t = pa.table({
        "subject": pa.array([r[0] for r in rows], pa.string()),
        "predicate": pa.array([r[1] for r in rows], pa.string()),
        "object": pa.array([r[2] for r in rows], pa.string()),
    })
    df = entity_similarity_dataset(
        rd.from_arrow(t), tau=0.2, hub_cap=3
    ).to_pandas()
    got = {(r.e1, r.e2): round(r.jac, 6) for r in df.itertuples()}
    # filtered sets: a={x,y,z}, b={x,y}, c={z,w} (hub excluded, |hub|=4>3)
    assert got == {
        ("ex:a", "ex:b"): round(2 / 3, 6),   # |∩|=2, |∪|=3
        ("ex:a", "ex:c"): round(1 / 4, 6),   # |∩|=1, |∪|=4
    }


def test_pagerank_checkpoint_resume(ray_session, tmp_path):
    """Interrupt-after-iteration-1 resume equals the uninterrupted run
    bit-for-bit (integer ranks)."""
    ck = str(tmp_path / "pr_ck")
    straight = pagerank_dataset(_triples(EDGES), iters=3).to_pandas()
    # leg 1: only one iteration completes (simulated preemption)
    pagerank_dataset(_triples(EDGES), iters=1, checkpoint_dir=ck).to_pandas()
    import os
    assert os.path.exists(os.path.join(ck, "ranks_1.parquet"))
    # leg 2: resume to 3 iterations from the same dir
    resumed = pagerank_dataset(_triples(EDGES), iters=3,
                               checkpoint_dir=ck).to_pandas()
    assert dict(zip(resumed["node"], resumed["rank"])) == \
        dict(zip(straight["node"], straight["rank"]))
    assert os.path.exists(os.path.join(ck, "ranks_3.parquet"))
    # idempotent re-run: everything checkpointed, zero extra iterations
    again = pagerank_dataset(_triples(EDGES), iters=3,
                             checkpoint_dir=ck).to_pandas()
    assert dict(zip(again["node"], again["rank"])) == \
        dict(zip(straight["node"], straight["rank"]))


def _ref_kcore(edges: list[tuple[str, str]], k: int, rounds: int):
    """Reference: synchronous peel in plain Python sets."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    surv = None
    for _ in range(rounds):
        deg: dict[str, int] = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        surv = {n for n, d in deg.items() if d >= k}
        und = {(a, b) for a, b in und if a in surv and b in surv}
    fin: dict[str, int] = {n: 0 for n in surv}
    for a, b in und:
        fin[a] += 1
        fin[b] += 1
    return fin


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_kcore_matches_reference_peel(ray_session, mode):
    from chronographer_ray.stages.graph import kcore_dataset

    # triangle core (a,b,c) + fringe chain d-e; duplicate + reversed
    # edges must collapse to one undirected edge
    edges = EDGES + [("ex:b", "ex:a"), ("ex:c", "ex:e"), ("ex:e", "ex:d")]
    df = kcore_dataset(_triples(edges), k=2, rounds=3, mode=mode).to_pandas()
    got = dict(zip(df["node"], df["core_deg"]))
    assert got == _ref_kcore(edges, k=2, rounds=3)


def test_kcore_auto_flips_to_shuffle(ray_session):
    from chronographer_ray.stages.graph import kcore_dataset

    df = kcore_dataset(
        _triples(EDGES), k=2, rounds=2, mode="auto", auto_node_threshold=2
    ).to_pandas()
    assert dict(zip(df["node"], df["core_deg"])) == _ref_kcore(
        EDGES, k=2, rounds=2)


def test_kcore_survivor_with_zero_final_degree(ray_session):
    """A node can survive round R (deg >= k over e_{R-1}) while every
    neighbor is peeled — it stays in the output with core_deg 0."""
    from chronographer_ray.stages.graph import kcore_dataset

    # hub with 2 leaves: round 1 peels the leaves (deg 1 < 2) but keeps
    # the hub (deg 2); induced subgraph leaves the hub isolated
    edges = [("ex:h", "ex:l1"), ("ex:h", "ex:l2")]
    df = kcore_dataset(_triples(edges), k=2, rounds=1).to_pandas()
    assert dict(zip(df["node"], df["core_deg"])) == {"ex:h": 0}
    assert _ref_kcore(edges, k=2, rounds=1) == {"ex:h": 0}


def _ref_lpa(edges: list[tuple[str, str]], rounds: int):
    """Reference: synchronous LPA with (count desc, label asc) argmax."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nb: dict[str, list[str]] = {}
    for a, b in und:
        nb.setdefault(a, []).append(b)
        nb.setdefault(b, []).append(a)
    lab = {n: n for n in nb}
    for _ in range(rounds):
        new = {}
        for v, us in nb.items():
            cnt: dict[str, int] = {}
            for u in us:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = new
    return lab


LPA_EDGES = [
    # two triangles bridged by one edge
    ("ex:a1", "ex:a2"), ("ex:a2", "ex:a3"), ("ex:a3", "ex:a1"),
    ("ex:b1", "ex:b2"), ("ex:b2", "ex:b3"), ("ex:b3", "ex:b1"),
    ("ex:a1", "ex:b1"),
]


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_label_propagation_matches_reference(ray_session, mode):
    from chronographer_ray.stages.graph import label_propagation_dataset

    df = label_propagation_dataset(
        _triples(LPA_EDGES), rounds=3, mode=mode).to_pandas()
    got = dict(zip(df["node"], df["community"]))
    assert got == _ref_lpa(LPA_EDGES, rounds=3)


def test_label_propagation_auto_flips_to_shuffle(ray_session):
    from chronographer_ray.stages.graph import label_propagation_dataset

    df = label_propagation_dataset(
        _triples(LPA_EDGES), rounds=2, mode="auto", auto_node_threshold=2
    ).to_pandas()
    assert dict(zip(df["node"], df["community"])) == _ref_lpa(
        LPA_EDGES, rounds=2)


def test_label_propagation_excludes_type_edges(ray_session):
    """rdf:type edges must not pull entities into class communities."""
    import ray.data as rd

    from chronographer_ray.stages.graph import label_propagation_dataset

    rows = {"subject": [], "predicate": [], "object": []}
    for s, o in LPA_EDGES:
        rows["subject"].append(s)
        rows["predicate"].append("ex:linksTo")
        rows["object"].append(o)
    for n in {x for e in LPA_EDGES for x in e}:
        rows["subject"].append(n)
        rows["predicate"].append("rdf:type")
        rows["object"].append("ex:Thing")
    ds = rd.from_arrow(pa.table(
        {k: pa.array(v, pa.string()) for k, v in rows.items()}))
    df = label_propagation_dataset(ds, rounds=2).to_pandas()
    assert "ex:Thing" not in set(df["community"])
    assert "ex:Thing" not in set(df["node"])


def _ref_hits(edges: list[tuple[str, str]], rounds: int,
              scale: int = 1_000_000):
    """Reference: the integer HITS recurrence in plain Python (exact
    ints, no overflow)."""
    de = {e for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in de for n in e})
    a = {n: scale for n in nodes}
    h = {n: scale for n in nodes}

    def half(src_scores, reverse):
        sums = {n: 0 for n in nodes}
        for s, d in de:
            if reverse:
                sums[s] += src_scores[d]
            else:
                sums[d] += src_scores[s]
        m = max(sums.values())
        if m > 0:
            sums = {n: v * scale // m for n, v in sums.items()}
        return sums

    for _ in range(rounds):
        a = half(h, reverse=False)   # authority: sum of in-edge hubs
        h = half(a, reverse=True)    # hub: sum of out-edge authorities
    return {n: (a[n], h[n]) for n in nodes}


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_hits_matches_reference(ray_session, mode):
    from chronographer_ray.stages.graph import hits_dataset

    df = hits_dataset(_triples(EDGES), rounds=2, mode=mode).to_pandas()
    got = {r["node"]: (r["authority"], r["hub"]) for _, r in df.iterrows()}
    assert got == _ref_hits(EDGES, rounds=2)
    # ex:hub is a pure sink: top authority, zero hub score
    assert got["ex:hub"][0] == max(v[0] for v in got.values())
    assert got["ex:hub"][1] == 0


def test_hits_auto_flips_to_shuffle(ray_session):
    from chronographer_ray.stages.graph import hits_dataset

    df = hits_dataset(
        _triples(EDGES), rounds=1, mode="auto", auto_node_threshold=2
    ).to_pandas()
    got = {r["node"]: (r["authority"], r["hub"]) for _, r in df.iterrows()}
    assert got == _ref_hits(EDGES, rounds=1)


def _ref_ppr(edges: list[tuple[str, str]], seeds: set[str],
             iters: int = 3) -> dict[str, int]:
    """Reference: integer PPR — restart mass only at the seeds."""
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN
    nodes = sorted({n for e in edges for n in e})
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: (PR_SCALE if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        s_in = {n: 0 for n in nodes}
        for s, o in edges:
            s_in[o] += r[s] // outdeg[s]
        r = {n: (base if n in seeds else 0) + PR_DAMP_NUM * s_in[n]
             // PR_DAMP_DEN for n in nodes}
    return r


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_personalized_pagerank(ray_session, mode):
    seeds = {"ex:a"}
    df = pagerank_dataset(_triples(EDGES), iters=3, mode=mode,
                          personalization=tuple(seeds)).to_pandas()
    got = dict(zip(df["node"], df["rank"]))
    assert got == _ref_ppr(EDGES, seeds, iters=3)
    # a node unreachable from the seed keeps rank 0
    assert got["ex:d"] == 0


def test_ppr_refuses_checkpoint(ray_session, tmp_path):
    with pytest.raises(ValueError):
        pagerank_dataset(_triples(EDGES), personalization=("ex:a",),
                         checkpoint_dir=str(tmp_path))


def test_degree_histogram(ray_session):
    from chronographer_ray.stages.graph import degree_histogram_dataset

    df = degree_histogram_dataset(_triples(EDGES)).to_pandas()
    deg: dict[str, int] = {}
    for s, o in EDGES:
        deg[s] = deg.get(s, 0) + 1
        deg[o] = deg.get(o, 0) + 1
    want: dict[int, int] = {}
    for d in deg.values():
        want[d] = want.get(d, 0) + 1
    assert dict(zip(df["degree"], df["n_nodes"])) == want
    assert int(df["n_nodes"].sum()) == len(deg)


def test_cli_graph_new_ops(ray_session, tmp_path):
    """CLI surface for kcore / communities / hits / seeded pagerank."""
    import pyarrow.parquet as pq

    from chronographer_ray.__main__ import cmd_graph

    rows = {"subject": [], "predicate": [], "object": []}
    for s, o in EDGES:
        rows["subject"].append(s)
        rows["predicate"].append("ex:linksTo")
        rows["object"].append(o)
    pq.write_table(
        pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()}),
        str(tmp_path / "kg.parquet"))

    class A:
        pass

    for op, extra in [("kcore", {"kcore_k": 2}),
                      ("communities", {}),
                      ("hits", {}),
                      ("pagerank", {"seeds": ["ex:a"]})]:
        a = A()
        a.op = op
        a.triples = str(tmp_path / "kg.parquet")
        a.out = str(tmp_path / f"out_{op}")
        a.iters = 2
        a.k = 5
        a.mode = "auto"
        a.predicates = ["ex:linksTo"]
        a.kcore_k = extra.get("kcore_k", 3)
        a.seeds = extra.get("seeds")
        cmd_graph(a)
        t = pq.read_table(str(tmp_path / f"out_{op}"))
        assert t.num_rows > 0


def _ref_bfs(edges, seeds, max_hops):
    """Reference BFS in plain Python (undirected, min hop distance)."""
    adj: dict[str, set[str]] = {}
    for s, o in edges:
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for r in range(1, max_hops + 1):
        nxt = set()
        for v in frontier:
            for u in adj.get(v, ()):
                if u not in dist:
                    dist[u] = r
                    nxt.add(u)
        frontier = nxt
        if not frontier:
            break
    return dist


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_bfs_distance(ray_session, mode):
    from chronographer_ray.stages.graph import bfs_distance_dataset

    df = bfs_distance_dataset(
        _triples(EDGES), seeds=["ex:d"], max_hops=2, mode=mode
    ).to_pandas()
    got = dict(zip(df["node"], df["dist"]))
    assert got == _ref_bfs(EDGES, ["ex:d"], 2)


def test_bfs_modes_identical_and_seed_not_in_graph(ray_session):
    from chronographer_ray.stages.graph import bfs_distance_dataset

    # chain so hops actually matter + an isolated seed
    chain = [("ex:n0", "ex:n1"), ("ex:n1", "ex:n2"), ("ex:n2", "ex:n3"),
             ("ex:n3", "ex:n4"), ("ex:x", "ex:y")]
    outs = {}
    for mode in ("broadcast", "shuffle"):
        df = bfs_distance_dataset(
            _triples(chain), seeds=["ex:n0", "ex:ghost"], max_hops=3,
            mode=mode,
        ).to_pandas().sort_values("node").reset_index(drop=True)
        outs[mode] = df
    pd.testing.assert_frame_equal(outs["broadcast"], outs["shuffle"])
    got = dict(zip(outs["broadcast"]["node"], outs["broadcast"]["dist"]))
    assert got == {"ex:n0": 0, "ex:ghost": 0, "ex:n1": 1, "ex:n2": 2,
                   "ex:n3": 3}


def test_bfs_excludes_predicates(ray_session):
    """rdf:type edges must not provide shortcuts through class hubs."""
    import ray.data as rd

    from chronographer_ray.stages.graph import bfs_distance_dataset

    rows = {
        "subject": ["ex:a", "ex:a", "ex:b"],
        "predicate": ["ex:linksTo", "rdf:type", "rdf:type"],
        "object": ["ex:c", "ex:T", "ex:T"],
    }
    ds = rd.from_arrow(
        pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()}))
    df = bfs_distance_dataset(ds, seeds=["ex:a"], max_hops=2).to_pandas()
    got = dict(zip(df["node"], df["dist"]))
    # without the exclusion ex:b would be reachable via ex:T in 2 hops
    assert got == {"ex:a": 0, "ex:c": 1}


def test_resource_allocation(ray_session):
    from chronographer_ray.stages.graph import (
        RA_SCALE,
        resource_allocation_dataset,
    )

    # z1 connects a,b,c (deg 3); z2 connects a,b (deg 2); duplicate triple
    edges = [("ex:z1", "ex:pa"), ("ex:z1", "ex:pb"), ("ex:z1", "ex:pc"),
             ("ex:z2", "ex:pa"), ("ex:z2", "ex:pb"), ("ex:z2", "ex:pa")]
    df = resource_allocation_dataset(_triples(edges)).to_pandas()
    got = {(r.e1, r.e2): r.ra for r in df.itertuples()}
    # deg: z1=3, z2=2, pa={z1,z2}=2, pb=2, pc=1
    w_z1, w_z2 = RA_SCALE // 3, RA_SCALE // 2
    w_pa = RA_SCALE // 2
    assert got[("ex:pa", "ex:pb")] == w_z1 + w_z2
    assert got[("ex:pa", "ex:pc")] == w_z1
    assert got[("ex:pb", "ex:pc")] == w_z1
    # pa/pb are shared neighbors of z1,z2 too: z1-z2 via pa and pb
    assert got[("ex:z1", "ex:z2")] == 2 * w_pa


def test_resource_allocation_hub_cap_and_min_score(ray_session):
    from chronographer_ray.stages.graph import (
        RA_SCALE,
        resource_allocation_dataset,
    )

    # hub with 3 neighbors is dropped at hub_cap=2; z2 (deg 2) survives
    edges = [("ex:hub", "ex:pa"), ("ex:hub", "ex:pb"), ("ex:hub", "ex:pc"),
             ("ex:z2", "ex:pa"), ("ex:z2", "ex:pb")]
    df = resource_allocation_dataset(
        _triples(edges), hub_cap=2).to_pandas()
    got = {(r.e1, r.e2): r.ra for r in df.itertuples()}
    # wedges through ex:hub are gone; pa-pb still share z2
    assert ("ex:pa", "ex:pc") not in got
    assert got[("ex:pa", "ex:pb")] == RA_SCALE // 2
    # pa (deg 2: hub,z2) and pb (deg 2) share BOTH hub and z2 as centers?
    # no: centers are hub (capped) and z2 only → hub-z2 pair via pa, pb
    assert got[("ex:hub", "ex:z2")] == 2 * (RA_SCALE // 2)
    # min_score prunes
    df2 = resource_allocation_dataset(
        _triples(edges), hub_cap=2, min_score=RA_SCALE).to_pandas()
    got2 = {(r.e1, r.e2): r.ra for r in df2.itertuples()}
    assert got2 == {("ex:hub", "ex:z2"): RA_SCALE}


def test_diff_datasets(ray_session):
    import ray.data as rd

    from chronographer_ray.build_ng.compare import diff_datasets

    def tbl(rows):
        return rd.from_arrow(pa.table({
            "subject": pa.array([r[0] for r in rows], pa.string()),
            "predicate": pa.array([r[1] for r in rows], pa.string()),
            "object": pa.array([r[2] for r in rows], pa.string()),
        }))

    left = tbl([("s1", "p", "o"), ("s2", "p", "o"), ("s2", "p", "o"),
                ("s3", "p", "o")])
    right = tbl([("s2", "p", "o"), ("s3", "p", "o2"), ("s4", "p", "o")])
    out = diff_datasets(left, right).to_pandas()
    got = {(r.subject, r.predicate, r.object): r.side
           for r in out.itertuples()}
    assert got == {
        ("s1", "p", "o"): "left_only",
        ("s3", "p", "o"): "left_only",
        ("s3", "p", "o2"): "right_only",
        ("s4", "p", "o"): "right_only",
    }
    assert len(out) == 4  # s2 duplicate collapsed, both-sides dropped


def test_assortativity(ray_session):
    import math

    from chronographer_ray.stages.graph import assortativity_dataset

    # star graph: hub connects to 3 leaves → perfectly disassortative
    star = [("ex:hub2", "ex:l1"), ("ex:hub2", "ex:l2"),
            ("ex:hub2", "ex:l3"), ("ex:l1", "ex:hub2")]  # dup collapses
    df = assortativity_dataset(_triples(star)).to_pandas()
    assert int(df["n_pairs"].iloc[0]) == 6  # 3 undirected edges × 2
    # reference arithmetic in plain python
    pairs = [(3, 1), (3, 1), (3, 1), (1, 3), (1, 3), (1, 3)]
    n = len(pairs)
    sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    sxx = sum(x * x for x, _ in pairs); syy = sum(y * y for _, y in pairs)
    r = (n * sxy - sx * sy) / (
        math.sqrt(float(n * sxx - sx * sx))
        * math.sqrt(float(n * syy - sy * sy)))
    assert df["r"].iloc[0] == r  # exactly -1.0 for a star
    assert r == -1.0

    # broadcast (the auto pick here) and shuffle modes are bit-identical,
    # including on a degree-regular graph (zero variance → r = 0.0 guard)
    cycle = [("ex:c1", "ex:c2"), ("ex:c2", "ex:c3"), ("ex:c3", "ex:c1")]
    for edges_ in (star, star + cycle, cycle):
        b = assortativity_dataset(
            _triples(edges_), mode="broadcast").to_pandas()
        s = assortativity_dataset(
            _triples(edges_), mode="shuffle").to_pandas()
        pd.testing.assert_frame_equal(b, s)
    assert assortativity_dataset(
        _triples(cycle), mode="broadcast").to_pandas()["r"].iloc[0] == 0.0


def test_cli_graph_assortativity_and_bfs(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from chronographer_ray.__main__ import cmd_graph

    rows = {"subject": [], "predicate": [], "object": []}
    for s, o in EDGES:
        rows["subject"].append(s)
        rows["predicate"].append("ex:linksTo")
        rows["object"].append(o)
    pq.write_table(
        pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()}),
        str(tmp_path / "kg.parquet"))

    class A:
        pass

    for op, seeds in [("assortativity", None), ("bfs", ["ex:a"])]:
        a = A()
        a.op = op
        a.triples = str(tmp_path / "kg.parquet")
        a.out = str(tmp_path / f"out_{op}")
        a.iters = 2
        a.k = 5
        a.mode = "auto"
        a.predicates = ["ex:linksTo"]
        a.kcore_k = 3
        a.seeds = seeds
        cmd_graph(a)
        t = pq.read_table(str(tmp_path / f"out_{op}"))
        assert t.num_rows > 0


def test_cooccurrence_pairs(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.freq import cooccurrence_pairs_dataset

    rows = [
        # group 1: items 1,2,3 (dup 2 collapses); group 2: 1,2; group 3: 1,2
        {"g": 10, "i": 1}, {"g": 10, "i": 2}, {"g": 10, "i": 2},
        {"g": 10, "i": 3},
        {"g": 20, "i": 1}, {"g": 20, "i": 2},
        {"g": 30, "i": 1}, {"g": 30, "i": 2},
        # oversized group (cap 3): contributes nothing
        {"g": 40, "i": 1}, {"g": 40, "i": 2}, {"g": 40, "i": 3},
        {"g": 40, "i": 4},
    ]
    out = cooccurrence_pairs_dataset(
        rd.from_items(rows, override_num_blocks=3),
        group_col="g", item_col="i", group_cap=3, min_support=2,
    ).to_pandas()
    got = {(r.item_a, r.item_b): r.n_groups for r in out.itertuples()}
    assert got == {(1, 2): 3}


def test_association_rules(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.freq import association_rules_dataset

    rows = [
        {"g": 1, "i": 1}, {"g": 1, "i": 2},
        {"g": 2, "i": 1}, {"g": 2, "i": 2},
        {"g": 3, "i": 1},  # item 1 in 3 baskets, item 2 in 2
    ]
    out = association_rules_dataset(
        rd.from_items(rows, override_num_blocks=2),
        group_col="g", item_col="i", min_support=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["item_a"], r["item_b"], r["n_groups"]) == (1, 2, 2)
    assert r["conf_a_to_b"] == 2 / 3   # P(2 | 1)
    assert r["conf_b_to_a"] == 1.0     # P(1 | 2)


def test_closeness_hand_graph_modes_identical(ray_session):
    """Path graph a—b—c—d from seed a: n_reached=4, total=1+2+3=6,
    closeness=0.5; isolated seed → (1, 0, 0.0). Broadcast and shuffle
    twins bit-identical."""
    import ray.data as rd

    from chronographer_ray.stages.graph import closeness_dataset

    triples = rd.from_items([
        {"subject": "ex:a", "predicate": "ex:linksTo", "object": "ex:b"},
        {"subject": "ex:b", "predicate": "ex:linksTo", "object": "ex:c"},
        {"subject": "ex:d", "predicate": "ex:linksTo", "object": "ex:c"},
        # rdf:type edge must not shortcut
        {"subject": "ex:a", "predicate": "rdf:type", "object": "ex:T"},
        {"subject": "ex:d", "predicate": "rdf:type", "object": "ex:T"},
    ])
    outs = {}
    for mode in ("broadcast", "shuffle"):
        df = (closeness_dataset(triples, ["ex:a", "ex:zz"], max_hops=3,
                                mode=mode)
              .to_pandas().sort_values("seed").reset_index(drop=True))
        outs[mode] = df
    a = outs["broadcast"]
    assert list(a["seed"]) == ["ex:a", "ex:zz"]
    assert list(a["n_reached"]) == [4, 1]
    assert list(a["total_dist"]) == [6, 0]
    assert a["closeness"].tolist() == [0.5, 0.0]
    import pandas as pd

    pd.testing.assert_frame_equal(outs["broadcast"], outs["shuffle"])


def test_closeness_hop_truncation(ray_session):
    """max_hops=1 sees only direct neighbors."""
    import ray.data as rd

    from chronographer_ray.stages.graph import closeness_dataset

    triples = rd.from_items([
        {"subject": "ex:a", "predicate": "ex:p", "object": "ex:b"},
        {"subject": "ex:b", "predicate": "ex:p", "object": "ex:c"},
    ])
    df = closeness_dataset(triples, ["ex:a"], max_hops=1).to_pandas()
    assert df["n_reached"].iloc[0] == 2 and df["total_dist"].iloc[0] == 1


def test_reciprocity_hand_graph(ray_session):
    """a→b and b→a reciprocal; a→c one-way: 4 distinct directed edges
    (incl. a duplicate-row collapse), 2 reciprocal, r=0.5. rdf:type and
    self-loops excluded; empty graph → r=0.0."""
    import ray.data as rd

    from chronographer_ray.stages.graph import reciprocity_dataset

    triples = rd.from_items([
        {"subject": "ex:a", "predicate": "ex:p", "object": "ex:b"},
        {"subject": "ex:b", "predicate": "ex:q", "object": "ex:a"},
        {"subject": "ex:a", "predicate": "ex:p", "object": "ex:c"},
        {"subject": "ex:c", "predicate": "ex:p", "object": "ex:d"},
        {"subject": "ex:c", "predicate": "ex:p", "object": "ex:d"},  # dup
        {"subject": "ex:a", "predicate": "rdf:type", "object": "ex:T"},
        {"subject": "ex:a", "predicate": "ex:p", "object": "ex:a"},  # loop
    ])
    out = reciprocity_dataset(triples).to_pandas()
    assert int(out["n_edges"].iloc[0]) == 4
    assert int(out["n_reciprocal"].iloc[0]) == 2
    assert out["r"].iloc[0] == 0.5

    empty = rd.from_items([
        {"subject": "ex:a", "predicate": "rdf:type", "object": "ex:T"},
    ])
    oe = reciprocity_dataset(empty).to_pandas()
    assert int(oe["n_edges"].iloc[0]) == 0 and oe["r"].iloc[0] == 0.0


# ---------------------------------------------------------------- modularity
def _ref_modularity(edges, communities):
    """Plain-python reference: undirected dedup, per-community
    (e_c, d_c, q_c = (4m e_c - d_c^2) / (4 m^2))."""
    und = {tuple(sorted(e)) for e in edges}
    m = len(und)
    deg: dict[str, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for c in sorted(set(communities.values())):
        members = {n for n, cc in communities.items() if cc == c}
        e_c = sum(1 for a, b in und if a in members and b in members)
        d_c = sum(deg[n] for n in members)
        out[c] = (e_c, d_c, (4 * m * e_c - d_c * d_c) / float(4 * m * m))
    return out


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_modularity_hand_graph(ray_session, mode):
    from chronographer_ray.stages.graph import (
        label_propagation_dataset,
        modularity_dataset,
    )

    # two triangles + one bridge — classic two-community shape
    edges = [("ex:a", "ex:b"), ("ex:b", "ex:c"), ("ex:c", "ex:a"),
             ("ex:d", "ex:e"), ("ex:e", "ex:f"), ("ex:f", "ex:d"),
             ("ex:c", "ex:d")]
    tr = _triples(edges)
    comm = dict(zip(*[label_propagation_dataset(tr, rounds=3)
                      .to_pandas()[c] for c in ("node", "community")]))
    ref = _ref_modularity(edges, comm)
    df = modularity_dataset(tr, rounds=3, mode=mode).to_pandas()
    got = {r["community"]: (r["n_intra"], r["deg_sum"], r["q_c"])
           for _, r in df.iterrows()}
    assert got == ref
    # Q = sum of q_c; for a good 2-community split it should be positive
    assert df["q_c"].sum() > 0


def test_modularity_modes_identical(ray_session):
    from chronographer_ray.stages.graph import modularity_dataset

    outs = {}
    for mode in ("broadcast", "shuffle"):
        outs[mode] = (modularity_dataset(_triples(EDGES), rounds=2,
                                         mode=mode)
                      .to_pandas().sort_values("community")
                      .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs["broadcast"], outs["shuffle"])


def test_modularity_empty_graph(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.graph import modularity_dataset

    ds = rd.from_arrow(pa.table({
        "subject": pa.array(["ex:a"], pa.string()),
        "predicate": pa.array(["rdfs:label"], pa.string()),
        "object": pa.array(["a literal"], pa.string()),
    }))
    out = modularity_dataset(ds)
    assert out.count() == 0
    # schema asserted on the Dataset (an all-empty Dataset loses its
    # schema through to_pandas — Ray-wide caveat, cf. phrase_search)
    assert out.schema().names == ["community", "n_intra", "deg_sum", "q_c"]


# ---------------------------------------------------------------- SSSP
def _wtriples(edges):
    """edges = [(src, pred, dst)] — predicate length IS the weight."""
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "subject": pa.array([e[0] for e in edges], pa.string()),
        "predicate": pa.array([e[1] for e in edges], pa.string()),
        "object": pa.array([e[2] for e in edges], pa.string()),
    }))


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_sssp_weights_beat_hops(ray_session, mode):
    from chronographer_ray.stages.graph import sssp_dataset

    # direct a-b costs 10, the 2-hop detour a-c-b costs 3+4=7
    tr = _wtriples([("ex:a", "p:12345678", "ex:b"),
                    ("ex:a", "p:1", "ex:c"),
                    ("ex:c", "p:12", "ex:b")])
    df = sssp_dataset(tr, seeds=["ex:a"], max_hops=3, mode=mode).to_pandas()
    got = dict(zip(df["node"], df["dist"]))
    assert got == {"ex:a": 0, "ex:b": 7, "ex:c": 3}
    assert set(df["seed"]) == {"ex:a"}


def test_sssp_hop_bound_and_parallel_edges(ray_session):
    from chronographer_ray.stages.graph import sssp_dataset

    tr = _wtriples([("ex:a", "p:12345678", "ex:b"),
                    ("ex:a", "p:", "ex:b"),        # parallel, cheaper (w=2)
                    ("ex:a", "p:1", "ex:c"),
                    ("ex:c", "p:12", "ex:b")])
    # hop bound 1: only direct edges — parallel min wins
    df = sssp_dataset(tr, seeds=["ex:a"], max_hops=1).to_pandas()
    got = dict(zip(df["node"], df["dist"]))
    assert got == {"ex:a": 0, "ex:b": 2, "ex:c": 3}


def test_sssp_modes_identical_multiseed(ray_session):
    from chronographer_ray.stages.graph import sssp_dataset

    tr = _wtriples([("ex:n0", "p:ab", "ex:n1"), ("ex:n1", "p:abc", "ex:n2"),
                    ("ex:n2", "p:a", "ex:n3"), ("ex:x", "p:abcd", "ex:y")])
    outs = {}
    for mode in ("broadcast", "shuffle"):
        outs[mode] = (sssp_dataset(tr, seeds=["ex:n0", "ex:x", "ex:ghost"],
                                   max_hops=3, mode=mode)
                      .to_pandas().sort_values(["seed", "node"])
                      .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs["broadcast"], outs["shuffle"])
    g = outs["broadcast"]
    n0 = dict(zip(g[g["seed"] == "ex:n0"]["node"],
                  g[g["seed"] == "ex:n0"]["dist"]))
    # undirected traversal, cumulative predicate-length weights
    assert n0 == {"ex:n0": 0, "ex:n1": 4, "ex:n2": 9, "ex:n3": 12}
    # isolated seed: present at dist 0, reaches nothing
    gh = g[g["seed"] == "ex:ghost"]
    assert list(gh["node"]) == ["ex:ghost"] and list(gh["dist"]) == [0]


def test_negative_samples_bruteforce_and_filter(ray_session):
    """Deterministic corruption: hash picks head/tail + replacement from
    the sorted vocab; corruptions equal to a true triple are dropped."""
    import hashlib

    import numpy as np
    import ray.data as rd

    from chronographer_ray.stages.negatives import negative_samples_dataset

    tri = [("a", "p", "b"), ("b", "p", "c"), ("c", "q", "a"),
           ("a", "q", "c")]
    ds = rd.from_items(
        [{"subject": s, "predicate": p, "object": o} for s, p, o in tri])
    out = (negative_samples_dataset(ds, n_neg=3, method="md5")
           .to_pandas())
    vocab = sorted({s for s, _, _ in tri} | {o for _, _, o in tri})
    true = set(tri)
    expect = []
    for s, p, o in tri:
        for k in range(3):
            u = int.from_bytes(
                hashlib.md5(f"{s}\x00{p}\x00{o}\x00{k}".encode())
                .digest()[:8], "little")
            repl = vocab[(u >> 1) % len(vocab)]
            head = bool(u & 1)
            ns, no = (repl, o) if head else (s, repl)
            if (ns, p, no) in true:
                continue
            expect.append((ns, p, no, k, "head" if head else "tail"))
    got = sorted(map(tuple, out[["subject", "predicate", "object",
                                 "slot", "corrupted"]]
                     .itertuples(index=False)))
    assert got == sorted(expect)
    assert len(got) > 0
    # splitmix production path: same schema, same filter contract
    out2 = negative_samples_dataset(ds, n_neg=3).to_pandas()
    for r in out2.itertuples(index=False):
        assert (r.subject, r.predicate, r.object) not in true


def test_negative_samples_broadcast_join_twin_identical(ray_session):
    """Broadcast-gate contract (the PMI-gate pattern): forcing the
    join-twin path with broadcast_keys_limit=0 must produce EXACTLY the
    rows of the default broadcast path — the truth filter's two
    implementations are value-identical."""
    import ray.data as rd

    from chronographer_ray.stages.negatives import negative_samples_dataset

    tri = [(f"e{i}", f"p{i % 3}", f"e{(i * 7 + 3) % 40}")
           for i in range(200)]
    ds = rd.from_items(
        [{"subject": s, "predicate": p, "object": o} for s, p, o in tri])
    cols = ["subject", "predicate", "object", "slot", "corrupted"]
    bcast = (negative_samples_dataset(ds, n_neg=2).to_pandas()
             .sort_values(cols).reset_index(drop=True))
    twin = (negative_samples_dataset(ds, n_neg=2, broadcast_keys_limit=0)
            .to_pandas()[cols]
            .sort_values(cols).reset_index(drop=True))
    assert len(bcast) > 0
    assert bcast[cols].equals(twin)
    # filter contract holds on both paths
    true = set(tri)
    for r in twin.itertuples(index=False):
        assert (r.subject, r.predicate, r.object) not in true
