"""Harness for running the REFERENCE implementation on the synthetic KG.

Shared by the differential tests and by the subprocess driver below. The
reference's frontier selection iterates `list(set(...))`
(``src/framework.py:458``), whose order follows Python's per-process string
hash — so a canonical reference run must pin ``PYTHONHASHSEED``; the tests
invoke this module as a SUBPROCESS with ``PYTHONHASHSEED=0`` and compare the
rebuild against the resulting artifacts.

Usage: ``PYTHONHASHSEED=0 python tests/ref_harness.py <strategy> <out_dir>``
writes ``subgraph.parquet`` and ``state.json`` under ``out_dir``.
"""
import contextlib
import io
import json
import os
import sys
import tempfile
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402
import yaml  # noqa: E402

from chronographer_ray.data.synth import (  # noqa: E402
    CLS_EVENT,
    RDF_TYPE,
    SEED_EVENT,
    WINDOW,
    synth_kg,
)

REF = "/root/reference"
TMP = tempfile.mkdtemp(prefix="ref_harness_")

# KG size is env-parameterized so the subprocess driver can run the
# differential on larger graphs (GRAFT_REF_NBATTLES, default 15)
_N_BATTLES = int(os.environ.get("GRAFT_REF_NBATTLES", "15"))
TRIPLES, SIDE = synth_kg(n_battles=_N_BATTLES)


def prepare_folder() -> None:
    os.makedirs(f"{TMP}/dataset-config", exist_ok=True)
    os.makedirs(f"{TMP}/domain-range-pred", exist_ok=True)
    dataset_yaml = {
        "config_type": "dbpedia",  # reference's validated type set; semantics
        "rdf_type": RDF_TYPE,      # (category filter + regex-year) match synth
        "point_in_time": SIDE["point_in_time"],
        "start_dates": SIDE["start_dates"],
        "end_dates": SIDE["end_dates"],
        "places": SIDE["places"],
        "person": SIDE["person"],
        "sub_class_of": ["http://www.w3.org/2000/01/rdf-schema#subClassOf"],
        "owl_thing": "http://www.w3.org/2002/07/owl#Thing",
        "category": "http://ex.org/resource/Category:",
        "start_uri": "http://ex.org",
    }
    with open(f"{TMP}/dataset-config/dbpedia.yaml", "w", encoding="utf-8") as f:
        yaml.safe_dump(dataset_yaml, f)
    superclasses = dict(SIDE["superclasses"])
    # reference Ordering indexes superclasses[cls] for EVERY domain/range
    # class — add sink entries for classes with no ancestors
    for classes in list(SIDE["domain"].values()) + list(SIDE["range"].values()):
        for c in classes:
            superclasses.setdefault(c, [])
    for name, payload in (
        ("superclasses", superclasses),
        ("domain", SIDE["domain"]),
        ("range", SIDE["range"]),
    ):
        with open(
            f"{TMP}/domain-range-pred/dbpedia-{name}.json", "w", encoding="utf-8"
        ) as f:
            json.dump(payload, f)
    pd.DataFrame({"linkDBpediaEn": SIDE["gold_events"]}).to_csv(
        f"{TMP}/gold.csv", index=False
    )
    with open(f"{TMP}/referents.json", "w", encoding="utf-8") as f:
        json.dump(SIDE["referents"], f)


def _stub(name: str, **attrs) -> None:
    """Install a stub module — unless the real package is importable (e.g.
    click IS installed; overwriting it would leak into unrelated tests)."""
    if name not in sys.modules:
        try:
            __import__(name)
        except ImportError:
            pass
    if name in sys.modules and not getattr(sys.modules[name], "__stub__", False):
        real = sys.modules[name]
        if getattr(real, "__file__", None):  # genuine installed module: keep
            return
    mod = types.ModuleType(name)
    mod.__stub__ = True
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def import_reference():
    prepare_folder()
    if REF not in sys.path:
        sys.path.insert(0, REF)

    def fake_tqdm(it, *a, **k):
        return it

    _stub("tqdm", tqdm=fake_tqdm)
    _stub("settings", FOLDER_PATH=TMP, AGENT="test-agent")
    _stub("hdt", HDTDocument=object)
    _stub("requests", get=None)
    _stub("rdflib", Graph=object)
    _stub("rdflib.term", Literal=str)
    _stub("SPARQLWrapper", SPARQLWrapper=object, RDFXML=None)
    import src.framework as ref_framework
    from src.interface import Interface

    spo = list(
        zip(
            TRIPLES["subject"].to_pylist(),
            TRIPLES["predicate"].to_pylist(),
            TRIPLES["object"].to_pylist(),
        )
    )

    class FakeInterface(Interface):
        """HDTInterface stand-in: triple-pattern scan over the synth table."""

        def __init__(self, filter_kb=1, folder_hdt=None, dataset_config=None,
                     nested_dataset=1, default_pred=None, dates=None):
            Interface.__init__(
                self,
                dataset_config=dataset_config,
                dates=dates or [None, None],
                default_pred=default_pred or [],
                filter_kb=filter_kb,
            )

        def get_triples(self, **params):
            subject = params.get("subject")
            predicate = params.get("predicate")
            obj = params.get("object")
            return [
                t for t in spo
                if (subject is None or t[0] == subject)
                and (predicate is None or t[1] == predicate)
                and (obj is None or t[2] == obj)
            ]

    ref_framework.HDTInterface = FakeInterface
    return ref_framework


def reference_config(strategy: str = "entropy_pred_object_freq") -> dict:
    return {
        "rdf_type": [("event", CLS_EVENT)],
        "predicate_filter": list(SIDE["predicate_filter"]),
        "start": SEED_EVENT,
        "iterations": 8,
        "type_ranking": strategy,
        "type_interface": "hdt",
        "type_metrics": ["precision", "recall", "f1"],
        "gold_standard": f"{TMP}/gold.csv",
        "referents": f"{TMP}/referents.json",
        "name_exp": "synth",
        "dataset_type": "dbpedia",
        "dataset_path": TMP,
        "start_date": WINDOW[0],
        "end_date": WINDOW[1],
        "ordering": {"domain_range": 1},
        "filtering": {"what": 1, "where": 1, "when": 1, "who": 0},
        "max_uri": 10**6,
        "nested_dataset": 0,
    }


def run_reference(strategy: str, out_dir: str) -> None:
    ref_framework = import_reference()
    fw = ref_framework.GraphSearchFramework(
        config=reference_config(strategy), mode="search_type_node_metrics",
        node_selection="all", walk="informed", keep_only_last=True,
    )
    cwd = os.getcwd()
    os.chdir(TMP)  # reference Ordering writes ingoing.csv/outgoing.csv to CWD
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            fw()
    finally:
        os.chdir(cwd)
    os.makedirs(out_dir, exist_ok=True)
    fw.subgraph.to_parquet(os.path.join(out_dir, "subgraph.parquet"))
    with open(os.path.join(out_dir, "state.json"), "w", encoding="utf-8") as f:
        json.dump(
            {
                "nodes_expanded": fw.nodes_expanded,
                "metrics_data": fw.metrics_data,
                "strategy": strategy,
            },
            f,
        )


if __name__ == "__main__":
    run_reference(sys.argv[1], sys.argv[2])
