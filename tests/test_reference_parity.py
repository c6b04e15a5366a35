"""Differential parity vs the ACTUAL reference implementation.

The reference's pure-logic modules import cleanly from the read-only
snapshot (``/root/reference/src/ranker.py`` needs only ``math``;
``filtering.py`` only ``re`` + pandas; ``metrics.py`` pandas + its local
``doc`` package). These tests run them SIDE-BY-SIDE with the rebuild on
seeded randomized inputs and assert identical outputs — top-1 ranked path
and score for all 6 strategies, narrative discard multisets, and P/R/F1 —
the strongest parity evidence available short of running the full
HDT/spaCy stack (not installable in this container). No reference code is
copied; the snapshot is imported at test time as an oracle.
"""
import importlib.util
import random
import sys

import pandas as pd
import pyarrow as pa
import pytest

from chronographer_ray.config import DatasetConfig, SearchConfig
from chronographer_ray.search.filtering import NarrativeFilter
from chronographer_ray.search.metrics import prf
from chronographer_ray.search.ranker import Ranker

REF = "/root/reference"


def _load(name: str, rel: str):
    if REF not in sys.path:
        sys.path.insert(0, REF)  # metrics.py imports the snapshot's doc pkg
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{rel}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_ranker = _load("ref_ranker", "src/ranker.py")
ref_filtering = _load("ref_filtering", "src/filtering.py")
ref_metrics = _load("ref_metrics", "src/metrics.py")

STRATEGIES = [
    "pred_freq",
    "entropy_pred_freq",
    "inverse_pred_freq",
    "pred_object_freq",
    "entropy_pred_object_freq",
    "inverse_pred_object_freq",
]


def _random_occurrences(rng: random.Random) -> dict[str, int]:
    occ: dict[str, int] = {}
    n = rng.randint(1, 25)
    for i in range(n):
        prio = rng.choice(["1", "3", "3", "3"])  # mostly class 3 like real runs
        direction = rng.choice(["ingoing-", "outgoing-", ""])
        key = f"{prio}-{direction}pred{rng.randint(0, 8)}"
        if rng.random() < 0.4:
            key += f";obj{rng.randint(0, 5)}"
        # values around the band edges (low=1, high=200) + ties
        occ.setdefault(key, rng.choice([1, 2, 2, 3, 7, 50, 199, 200, 201, 500]))
    return occ


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_ranker_top1_parity_all_strategies(strategy):
    mine = Ranker(type_ranking=strategy)
    ref = ref_ranker.Ranker(type_ranking=strategy)
    for seed in range(200):
        occ = _random_occurrences(random.Random(seed))
        got = mine(occ)
        want = ref(occurences=dict(occ))
        assert got == tuple(want), (strategy, seed, occ, got, want)


def test_ranker_band_fallback_parity():
    """Everything outside the (1, 200) band → both fall back unfiltered."""
    occ = {"3-predA": 1, "3-predB": 500, "3-predC": 1}
    for strategy in ("pred_freq", "inverse_pred_freq"):
        assert Ranker(type_ranking=strategy)(occ) == tuple(
            ref_ranker.Ranker(type_ranking=strategy)(occurences=dict(occ))
        )


# --------------------------------------------------------------- filtering
_PLACES = ["ex:Place", "ex:City"]
_PEOPLE = ["ex:Person"]
_START_P = ["ex:startDate"]
_END_P = ["ex:endDate"]
_PIT_P = ["ex:date"]
_DATES = ["1789-01-01", "1799-12-31"]


def _random_frames(rng: random.Random):
    nodes = [
        rng.choice(
            [
                f"ex:Battle_of_{rng.randint(1700, 1900)}_Site{i}",
                f"ex:Entity_{i}",
                f"ex:Event_{i}",
            ]
        )
        for i in range(rng.randint(0, 15))
    ]
    type_rows = []
    for n in nodes:
        for _ in range(rng.randint(0, 3)):
            pred = rng.choice(["rdf:type"] + _START_P + _END_P + _PIT_P)
            if pred == "rdf:type":
                obj = rng.choice(_PLACES + _PEOPLE + ["ex:Event", "ex:Thing"])
            else:
                obj = f"{rng.randint(1700, 1900)}-0{rng.randint(1, 9)}-1{rng.randint(0, 9)}"
            type_rows.append((n, pred, obj))
    ing = pd.DataFrame(
        {
            "subject": nodes,
            "predicate": ["ex:related"] * len(nodes),
            "object": ["ex:seed"] * len(nodes),
        }
    )
    out = pd.DataFrame(
        {
            "subject": ["ex:seed"] * len(nodes),
            "predicate": ["ex:related"] * len(nodes),
            "object": nodes,
        }
    )
    td = pd.DataFrame(type_rows, columns=["subject", "predicate", "object"])
    return ing, out, td


@pytest.mark.parametrize("where,when,who", [(1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1)])
def test_narrative_filter_parity(where, when, who):
    ref = ref_filtering.Filtering(
        {
            "where": where,
            "when": when,
            "who": who,
            "point_in_time": _PIT_P,
            "start_dates": _START_P,
            "end_dates": _END_P,
            "places": _PLACES,
            "people": _PEOPLE,
            "dataset_type": "dbpedia",  # regex-year filter active
        }
    )
    ds = DatasetConfig(
        point_in_time=_PIT_P,
        start_dates=_START_P,
        end_dates=_END_P,
        places=_PLACES,
        person=_PEOPLE,
        regex_year_filter=True,
    )
    cfg = SearchConfig(
        start="ex:seed",
        filter_where=bool(where),
        filter_when=bool(when),
        filter_who=bool(who),
    )
    mine = NarrativeFilter(ds, cfg)
    for seed in range(60):
        ing, out, td = _random_frames(random.Random(seed))
        want = ref(
            ingoing=ing.copy(), outgoing=out.copy(), type_date=td.copy(), dates=_DATES
        )
        got = mine(
            pa.Table.from_pandas(ing, preserve_index=False),
            pa.Table.from_pandas(out, preserve_index=False),
            pa.Table.from_pandas(td, preserve_index=False),
            _DATES,
        )
        assert sorted(got) == sorted(want), (seed, sorted(got), sorted(want))


# ----------------------------------------------------------------- metrics
def test_prf_parity_randomized():
    universe = [f"ex:e{i}" for i in range(30)]
    for seed in range(100):
        rng = random.Random(seed)
        found = [rng.choice(universe) for _ in range(rng.randint(0, 20))]
        gold = list({rng.choice(universe) for _ in range(rng.randint(0, 20))})
        referents = {u: rng.choice(universe) for u in universe if rng.random() < 0.2}
        canon = [referents.get(u, u) for u in found]
        nums = ref_metrics.Metrics.get_numbers(found=canon, gold_standard=gold)
        want_p = ref_metrics.Metrics.get_precision(**nums)
        want_r = ref_metrics.Metrics.get_recall(**nums)
        want_f = ref_metrics.Metrics.get_f1(**nums)
        got = prf(found, gold, referents=referents)
        assert (got.precision, got.recall, got.f1) == (want_p, want_r, want_f)
        assert (got.true_pos, got.false_pos, got.false_neg) == (
            nums["true_pos"], nums["false_pos"], nums["false_neg"]
        )


# --------------------------------------- golden-fixture frontier selection
def test_frontier_selection_matches_reference_golden_fixtures():
    """Replicates the reference's own conformance test
    (``src/tests/test_framework.py:95-180``): given its golden
    superclass-annotated pending tables for the French-Revolution seed,
    J5 frontier selection must return the exact node sets the reference
    asserts, for the chosen path of each of the 6 ranking strategies."""
    from chronographer_ray.data.fixtures import make_search

    folder = f"{REF}/src/tests/data"
    ing = pd.read_csv(f"{folder}/hdt_ingoing_superclass_expected.csv").fillna("")
    out = pd.read_csv(f"{folder}/hdt_outgoing_superclass_expected.csv").fillna("")
    cols = ["subject", "predicate", "object"]
    pending_in = pa.Table.from_pandas(ing[cols], preserve_index=False)
    pending_out = pa.Table.from_pandas(out[cols], preserve_index=False)

    fr = "http://dbpedia.org/resource/French_Revolution"
    part_of = "http://dbpedia.org/ontology/isPartOfMilitaryConflict"
    events_p = "http://dbpedia.org/property/events"
    to_expand_all = {
        "pred_freq": part_of,
        "pred_object_freq": f"ingoing-{part_of};{fr}",
        "entropy_pred_freq": part_of,
        "entropy_pred_object_freq": f"ingoing-{part_of};{fr}",
        "inverse_pred_freq": events_p,
        "inverse_pred_object_freq": f"ingoing-{events_p};{fr}",
    }
    military_conflicts = {
        "http://dbpedia.org/resource/Battle_of_Kaiserslautern",
        "http://dbpedia.org/resource/Fall_of_Maximilien_Robespierre",
        "http://dbpedia.org/resource/Insurrection_of_31_May_–_2_June_1793",
        "http://dbpedia.org/resource/Battle_of_Wattignies",
        "http://dbpedia.org/resource/Siege_of_Maubeuge_(1793)",
        "http://dbpedia.org/resource/Day_of_Daggers",
        "http://dbpedia.org/resource/Coup_of_18_Fructidor",
        "http://dbpedia.org/resource/Revolt_of_1_Prairial_Year_III",
        "http://dbpedia.org/resource/13_Vendémiaire",
        "http://dbpedia.org/resource/Insurrection_of_10_August_1792",
        "http://dbpedia.org/resource/Storming_of_the_Bastille",
        "http://dbpedia.org/resource/Insurrection_of_12_Germinal,_Year_III",
        "http://dbpedia.org/resource/Demonstration_of_20_June_1792",
    }
    events = {
        "http://dbpedia.org/resource/Bastille",
        "http://dbpedia.org/resource/Square_du_Temple",
    }
    expected = {
        "pred_freq": military_conflicts,
        "pred_object_freq": military_conflicts,
        "entropy_pred_freq": military_conflicts,
        "entropy_pred_object_freq": military_conflicts,
        "inverse_pred_freq": events,
        "inverse_pred_object_freq": events,
    }

    for strategy, to_expand in to_expand_all.items():
        gs, _ = make_search(iterations=2, type_ranking=strategy)
        gs.pending_in = pending_in
        gs.pending_out = pending_out
        gs.to_expand = to_expand
        nodes = gs.select_nodes(iteration=2)
        assert set(nodes) == expected[strategy], strategy


# ------------------------------------- golden expansion split (J1/J2/J3)
def test_expansion_split_matches_reference_golden():
    """Replicates ``src/tests/test_expansion.py::test_filter_sub_graph``:
    a store holding exactly the golden French-Revolution neighborhood must
    expand into the same subgraph/pending splits the reference computes,
    with the reference's own ``Filtering`` supplying the discard oracle."""
    import yaml

    from chronographer_ray.search.expansion import NodeExpansion
    from chronographer_ray.sources.triple_store import ArrowTripleStore

    folder = f"{REF}/src/tests/data"
    cols = ["subject", "predicate", "object"]
    ing = pd.read_csv(f"{folder}/hdt_ingoing_expected.csv")[cols]
    out = pd.read_csv(f"{folder}/hdt_outgoing_expected.csv")[cols]
    types = pd.read_csv(f"{folder}/hdt_types_expected.csv")[cols]
    with open(f"{REF}/dataset-config/dbpedia.yaml", encoding="utf-8") as f:
        dby = yaml.safe_load(f)

    fr = "http://dbpedia.org/resource/French_Revolution"
    dates = ["1789-01-01", "1804-12-31"]
    target = ("event", "http://dbpedia.org/ontology/Event")

    # reference-side expected frames (the formula of _filter_sub_graph)
    ref_filter = ref_filtering.Filtering(
        {
            "when": 1, "where": 1, "who": 0,
            "point_in_time": dby["point_in_time"],
            "start_dates": dby["start_dates"],
            "end_dates": dby["end_dates"],
            "places": dby["places"],
            "people": dby["person"],
            "dataset_type": dby["config_type"],
        }
    )
    to_discard = ref_filter(
        ingoing=ing.copy(), outgoing=out.copy(), type_date=types.copy(), dates=dates
    )
    filtered = [target[1]]  # superclasses map empty in snapshot → targets only
    to_keep = list(
        types[(~types.subject.isin(to_discard)) & (types.object.isin(filtered))]
        .subject.unique()
    )
    exp_sub_in = ing[ing.subject.isin(to_keep)]
    exp_pend_in = ing[~ing.subject.isin(to_discard)]
    exp_sub_out = out[out.object.isin(to_keep)]
    exp_pend_out = out[~out.object.isin(to_discard)]

    # rebuild-side: expand the same frontier over a store of exactly these
    # triples (all already post-J1-filter, so the M1-M6 passes are no-ops)
    store = ArrowTripleStore(
        pa.Table.from_pandas(pd.concat([ing, out, types]), preserve_index=False)
    )
    ds_cfg = DatasetConfig(
        config_type="dbpedia",
        predicate_filter=dby["predicate_filter"],
        point_in_time=dby["point_in_time"],
        start_dates=dby["start_dates"],
        end_dates=dby["end_dates"],
        places=dby["places"],
        person=dby["person"],
        start_uri=dby["start_uri"],
        regex_year_filter=True,
    )
    cfg = SearchConfig(
        start=fr, rdf_type=[target], start_date=dates[0], end_date=dates[1],
        filter_where=True, filter_when=True, filter_who=False,
        filter_what=False,  # the golden neighborhood includes rdf:type edges
    )
    ne = NodeExpansion(store, ds_cfg, cfg)
    ne.set_superclasses({})
    res = ne.expand([fr])

    def rows(t):
        return sorted(zip(*[t[c].to_pylist() for c in cols]))

    def prows(df):
        return sorted(df[cols].itertuples(index=False, name=None))

    assert rows(res.subgraph_in.select(cols)) == prows(exp_sub_in)
    assert rows(res.pending_in.select(cols)) == prows(exp_pend_in)
    assert rows(res.subgraph_out.select(cols)) == prows(exp_sub_out)
    assert rows(res.pending_out.select(cols)) == prows(exp_pend_out)
    assert set(res.to_discard) == set(to_discard)


def test_superclass_priority_digits_match_reference_ordering():
    """M11/M13 — the reference's dbpedia superclass column omits the class
    itself while the rebuild's composed map includes it; the consumed
    quantity is the PRIORITY DIGIT (does the column hit a target class), and
    that must agree row-for-row on the synthetic pending edges, using the
    reference's own lookup lambda over the harness maps."""
    import json

    from ref_harness import TMP, prepare_folder

    from chronographer_ray.data.synth import CLS_EVENT, synth_kg
    from chronographer_ray.search.ordering import (
        SuperclassAnnotator,
        build_pred_class_map,
        priority_digit,
    )

    prepare_folder()
    with open(f"{TMP}/domain-range-pred/dbpedia-domain.json", encoding="utf-8") as f:
        domain = json.load(f)
    with open(f"{TMP}/domain-range-pred/dbpedia-range.json", encoding="utf-8") as f:
        range_ = json.load(f)
    with open(
        f"{TMP}/domain-range-pred/dbpedia-superclasses.json", encoding="utf-8"
    ) as f:
        superclasses = json.load(f)

    def reference_column(pred: str, lookup: dict) -> list[str]:
        # the reference's non-wikidata lambda (src/ordering.py:162-164)
        return (
            [y for elt in lookup[pred] for y in superclasses[elt]]
            if pred in lookup
            else []
        )

    triples, side = synth_kg()
    preds = sorted(set(triples["predicate"].to_pylist()))
    targets = {CLS_EVENT}
    for direction, lookup in (("ingoing", domain), ("outgoing", range_)):
        mine = SuperclassAnnotator(
            build_pred_class_map(domain, side["superclasses"]),
            build_pred_class_map(range_, side["superclasses"]),
            direction,
        )
        table = pa.table(
            {
                "subject": ["s"] * len(preds),
                "predicate": preds,
                "object": ["o"] * len(preds),
            }
        )
        annotated = mine.annotate(table)
        for pred, sup in zip(preds, annotated["superclass"].to_pylist()):
            ref_sup = reference_column(pred, lookup)
            assert priority_digit(sup, targets) == priority_digit(ref_sup, targets), (
                direction, pred, sup, ref_sup,
            )
