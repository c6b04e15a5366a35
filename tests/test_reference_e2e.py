"""END-TO-END differential: the reference's ACTUAL GraphSearchFramework,
running on the rebuild's synthetic KG through a fake triple interface, vs
the rebuild's GraphSearch — identical config, identical input, full-run
subgraph and metrics comparison. This is the strongest realization of the
"triple P/R ≥ 0.95 vs reference" criterion available in this container:
only the KG access layer (HDT) is faked; every line of search logic on the
reference side is the reference's own code (see ``ref_harness.py``).

The reference runs in a SUBPROCESS pinned to ``PYTHONHASHSEED=0``: its
frontier iteration order follows ``list(set(...))`` (``src/framework.py:458``)
and therefore Python's per-process string-hash seed — unpinned, two
reference runs disagree with each other by the same tie-break margin these
tests measure. The rebuild is hash-independent (deterministic insertion
order) and is compared against the canonical seed-0 reference run.
"""
import json
import os
import subprocess
import sys
import tempfile

import pandas as pd
import pyarrow as pa
import pytest

from ref_harness import SIDE, TMP, WINDOW, import_reference

HARNESS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_harness.py")


def _canonical_reference(strategy: str) -> tuple[pd.DataFrame, dict]:
    out_dir = tempfile.mkdtemp(prefix=f"ref_canon_{strategy}_")
    env = dict(os.environ, PYTHONHASHSEED="0")
    subprocess.run(
        [sys.executable, HARNESS, strategy, out_dir],
        env=env, check=True, capture_output=True, text=True,
    )
    sub = pd.read_parquet(os.path.join(out_dir, "subgraph.parquet"))
    with open(os.path.join(out_dir, "state.json"), encoding="utf-8") as f:
        state = json.load(f)
    return sub, state


@pytest.fixture(scope="module")
def reference_run():
    return _canonical_reference("entropy_pred_object_freq")


@pytest.fixture(scope="module")
def rebuild_run():
    from chronographer_ray.data.fixtures import make_search

    gs, _ = make_search(iterations=8, type_ranking="entropy_pred_object_freq")
    gs.run()
    return gs


def _triple_set(df_or_table, it=None):
    if isinstance(df_or_table, pa.Table):
        df = df_or_table.to_pandas()
    else:
        df = df_or_table
    if it is not None:
        df = df[df["iteration"] == it]
    return set(zip(df["subject"], df["predicate"], df["object"], df["type_df"]))


def test_full_run_subgraph_prf_ge_095(reference_run, rebuild_run):
    ref_sub, _ = reference_run
    ref_set = _triple_set(ref_sub)
    got_set = _triple_set(rebuild_run.subgraph)
    inter = ref_set & got_set
    precision = len(inter) / len(got_set) if got_set else 0.0
    recall = len(inter) / len(ref_set) if ref_set else 0.0
    assert precision >= 0.95, (precision, sorted(got_set - ref_set)[:5])
    assert recall >= 0.95, (recall, sorted(ref_set - got_set)[:5])


def test_early_iterations_identical(reference_run, rebuild_run):
    """Iterations before any ranker tie-break must match EXACTLY; the
    overall P/R>=0.95 test covers the hash-order-sensitive tail."""
    ref_sub, _ = reference_run
    got = rebuild_run.subgraph.to_pandas()
    for it in (1, 2):
        assert _triple_set(ref_sub, it) == _triple_set(got, it), it


def test_expansion_sets_near_identical(reference_run, rebuild_run):
    """Expanded-node sets agree up to the tie-break tail; every gold event
    both engines can reach must be expanded by both."""
    _, state = reference_run
    ref_n, got_n = set(state["nodes_expanded"]), set(rebuild_run.visited)
    assert len(ref_n ^ got_n) <= 3, sorted(ref_n ^ got_n)
    gold = set(SIDE["gold_events"])
    assert gold & ref_n == gold & got_n


def test_metrics_trajectory_matches(reference_run, rebuild_run):
    """Per-iteration P/R/F1 agree through the deterministic prefix and at
    the end state (gold coverage is identical even if tie-break tails
    explore different non-gold nodes)."""
    _, state = reference_run
    ref_m = {int(k): v for k, v in state["metrics_data"].items()}
    for it in (1, 2):
        m, mine = ref_m[it], rebuild_run.metrics_per_iter[it]
        assert abs(m["f1"] - mine["f1"]) < 1e-9, it
    last = max(ref_m)
    m = ref_m[last]
    mine = rebuild_run.metrics_per_iter[max(rebuild_run.metrics_per_iter)]
    assert abs(m["recall"] - mine["recall"]) < 1e-9
    assert abs(m["f1"] - mine["f1"]) < 1e-9


@pytest.mark.parametrize(
    "strategy", ["pred_freq", "entropy_pred_freq", "inverse_pred_freq",
                 "pred_object_freq", "inverse_pred_object_freq"]
)
def test_full_run_prf_across_strategies(strategy):
    """The end-to-end differential repeated under other ranking strategies:
    subgraph triple P/R >= 0.95 for each."""
    ref_sub, _ = _canonical_reference(strategy)

    from chronographer_ray.data.fixtures import make_search

    gs, _ = make_search(iterations=8, type_ranking=strategy)
    gs.run()
    ref_set = _triple_set(ref_sub)
    got_set = _triple_set(gs.subgraph.to_pandas())
    inter = ref_set & got_set
    precision = len(inter) / len(got_set) if got_set else 1.0
    recall = len(inter) / len(ref_set) if ref_set else 1.0
    assert precision >= 0.95, (strategy, precision, sorted(got_set - ref_set)[:5])
    assert recall >= 0.95, (strategy, recall, sorted(ref_set - got_set)[:5])


# -------------------------------------------------- stage 2 differential
def _import_stage2():
    """Import the reference's ACTUAL KGConverter with its author-private
    helper lib (kglab), rdflib and the spaCy pipeline stubbed to minimal
    faithful semantics (URIRef/Literal are strings, Graph is a triple set,
    encode is the rebuild's M15 — neutral: both sides apply the same one).
    Stage 2 itself is hash-order-free (all collection is into sets), so it
    runs in-process over the canonical subgraph."""
    from ref_harness import _stub

    ref_framework = import_reference()  # settings/tqdm/hdt stubs + maps dir

    from chronographer_ray.build_ng.event_kg import encode_iri

    class URIRef(str):
        pass

    class Literal(str):
        def __new__(cls, v, datatype=None):
            obj = str.__new__(cls, v)
            obj.datatype = datatype
            return obj

    class Graph:
        def __init__(self):
            self._t = set()

        def add(self, triple):
            self._t.add(tuple(str(x) for x in triple))

        def __iter__(self):
            return iter(self._t)

        def __len__(self):
            return len(self._t)

    class NS:
        def __init__(self, prefix):
            self.prefix = prefix

        def __getitem__(self, key):
            return URIRef(self.prefix + key)

    _stub("rdflib", URIRef=URIRef, Literal=Literal, Graph=Graph)
    _stub("click", command=lambda *a, **k: (lambda f: f),
          option=lambda *a, **k: (lambda f: f))
    _stub("kglab")
    _stub("kglab.helpers")
    _stub("kglab.helpers.encoding", encode=encode_iri)
    _stub("kglab.helpers.kg_build", init_graph=lambda prefix_to_ns=None: Graph())
    _stub("kglab.helpers.kg_query", get_labels=None, get_outgoing=None)
    _stub(
        "kglab.helpers.data_load",
        open_json=lambda path: json.load(open(path, encoding="utf-8")),
        read_csv=lambda path: pd.read_csv(path),
    )
    _stub(
        "kglab.helpers.variables",
        NS_SEM=NS("http://semanticweb.cs.vu.nl/2009/11/sem/"),
        PREFIX_SEM="sem",
        NS_XSD=NS("http://www.w3.org/2001/XMLSchema#"),
        PREFIX_XSD="xsd",
        STR_XSD="http://www.w3.org/2001/XMLSchema#",
        NS_DBR=NS("http://dbpedia.org/resource/"),
        PREFIX_DBR="dbr",
        NS_RDF=NS("http://www.w3.org/1999/02/22-rdf-syntax-ns#"),
        PREFIX_RDF="rdf",
        NS_RDFS=NS("http://www.w3.org/2000/01/rdf-schema#"),
    )
    _stub("src.build_ng.dbpedia_spotlight", init_spacy_pipeline=lambda: None,
          get_db_entities=lambda doc: [])
    import importlib

    import src.build_ng.generic_kb_to_ng as g2ng

    importlib.reload(g2ng)  # rebind the freshly-stubbed imports
    g2ng.HDTInterface = ref_framework.HDTInterface  # the FakeInterface
    return g2ng


def test_stage2_event_kg_matches_reference_converter(reference_run):
    """The reference's OWN KGConverter (stage 2) vs the rebuild's
    build_event_kg, both over the SAME canonical search subgraph and
    synthetic KG: emitted (s, p, o) triple sets must match at P/R >= 0.95
    (they are expected to be identical here)."""
    ref_sub, _ = reference_run
    g2ng = _import_stage2()
    conv = g2ng.KGConverter(dataset="dbpedia")
    cwd = os.getcwd()
    os.chdir(TMP)  # converter writes input.csv to CWD
    try:
        graph = conv(input_df=ref_sub.copy(), start_d=WINDOW[0], end_d=WINDOW[1])
    finally:
        os.chdir(cwd)
    ref_triples = set(graph)

    from chronographer_ray.build_ng.event_kg import build_event_kg
    from chronographer_ray.data.fixtures import make_search

    gs, side = make_search(iterations=8, type_ranking="entropy_pred_object_freq")
    sub = gs.run()
    kg = build_event_kg(
        sub, gs.store, side["domain"], side["range"], side["superclasses"],
        WINDOW[0], WINDOW[1],
    )
    got_triples = set(
        zip(kg["subject"].to_pylist(), kg["predicate"].to_pylist(),
            kg["object"].to_pylist())
    )
    inter = ref_triples & got_triples
    precision = len(inter) / len(got_triples) if got_triples else 0.0
    recall = len(inter) / len(ref_triples) if ref_triples else 0.0
    assert precision >= 0.95, (precision, sorted(got_triples - ref_triples)[:6])
    assert recall >= 0.95, (recall, sorted(ref_triples - got_triples)[:6])


def test_a10_comparison_matches_reference_semcomparer():
    """A10 differential — the reference's OWN SEMComparer vs compare_graphs
    on randomized SEM triple sets: overall counts and P/R/F1 identical; for
    per-predicate metrics, every predicate the reference reports (it only
    emits preds present in common AND both only-sets) must match ours."""
    import random

    from ref_harness import _stub, import_reference

    import_reference()  # base stubs + sys.path

    class Graph:
        def __init__(self, triples):
            self._t = set(triples)

        def __iter__(self):
            return iter(self._t)

        def __len__(self):
            return len(self._t)

    def get_intersection_difference(g1, g2):
        a, b = set(g1), set(g2)
        return list(a & b), list(a - b), list(b - a)

    _stub("rdflib", Graph=Graph)
    _stub(
        "kglab.helpers.graph_structure",
        get_intersection_difference=get_intersection_difference,
    )
    SEM = "http://semanticweb.cs.vu.nl/2009/11/sem/"
    _stub(
        "kglab.helpers.variables",
        NS_SEM=type("NS", (), {"__getitem__": lambda s, k: SEM + k})(),
        STR_SEM=SEM,
        PREFIX_SEM="sem",
    )
    import importlib

    import src.build_ng.sem_comparison as ref_cmp

    importlib.reload(ref_cmp)

    from chronographer_ray.build_ng.compare import compare_graphs

    preds = [SEM + p for p in ("hasPlace", "hasActor", "hasBeginTimeStamp",
                               "hasEndTimeStamp")]
    comparer = ref_cmp.SEMComparer()

    for seed in range(30):
        rng = random.Random(seed)

        def rand_graph(rng=rng):
            return {
                (f"ex:e{rng.randint(0, 6)}", rng.choice(preds), f"ex:v{rng.randint(0, 8)}")
                for _ in range(rng.randint(0, 25))
            }

        a, b = rand_graph(), rand_graph()
        want = comparer(graph_c=Graph(a), graph_gs=Graph(b))
        got = compare_graphs(
            pa.table({"subject": [t[0] for t in a], "predicate": [t[1] for t in a],
                      "object": [t[2] for t in a]}),
            pa.table({"subject": [t[0] for t in b], "predicate": [t[1] for t in b],
                      "object": [t[2] for t in b]}),
        )
        assert got["numbers"]["all"] == want["numbers"]["all"], seed
        for m in ("precision", "recall", "f1"):
            assert abs(got["metrics"]["all"][m] - want["metrics"]["all"][m]) < 1e-9
        for key, nums in want["numbers"].items():
            if key == "all":
                continue
            full = key.replace("sem:", SEM)
            assert got["numbers"][full] == nums, (seed, key)
            for m in ("precision", "recall", "f1"):
                assert abs(got["metrics"][full][m] - want["metrics"][key][m]) < 1e-9


def test_full_run_prf_on_larger_kg():
    """The E2E differential generalizes beyond the default fixture size:
    a 40-battle synthetic KG (≈2.7× the default) still matches at
    P/R >= 0.95."""
    out_dir = tempfile.mkdtemp(prefix="ref_canon_big_")
    env = dict(os.environ, PYTHONHASHSEED="0", GRAFT_REF_NBATTLES="40")
    subprocess.run(
        [sys.executable, HARNESS, "entropy_pred_object_freq", out_dir],
        env=env, check=True, capture_output=True, text=True,
    )
    ref_sub = pd.read_parquet(os.path.join(out_dir, "subgraph.parquet"))

    from chronographer_ray.data.fixtures import make_search

    gs, _ = make_search(
        iterations=8, type_ranking="entropy_pred_object_freq", n_battles=40
    )
    gs.run()
    ref_set = _triple_set(ref_sub)
    got_set = _triple_set(gs.subgraph.to_pandas())
    inter = ref_set & got_set
    precision = len(inter) / len(got_set) if got_set else 0.0
    recall = len(inter) / len(ref_set) if ref_set else 0.0
    assert precision >= 0.95, (precision, sorted(got_set - ref_set)[:5])
    assert recall >= 0.95, (recall, sorted(ref_set - got_set)[:5])
