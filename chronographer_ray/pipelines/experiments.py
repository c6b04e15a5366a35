"""Experiment grid driver — the reference's batch layer (§3.3) on Ray core.

The reference runs a ParameterGrid of independent searches in a process
pool with per-task kill timers and resumes by listing finished experiment
folders (``experiments_run/run_all_search.py:107-223, 271-324``). Here each
experiment is ONE Ray task (they're embarrassingly parallel); timeouts use
``ray.wait`` + ``ray.cancel``; resume = skip experiments whose result
manifest exists. Inside each task the search itself uses the in-memory
store (one experiment fits one worker); at corpus scale the tasks would
share a ParquetTripleStore path instead.
"""
from __future__ import annotations

import json
import os
from dataclasses import asdict
from typing import Optional


def _exp_name(overrides: dict) -> str:
    keys = sorted(overrides)
    return "_".join(f"{k}-{str(overrides[k]).replace('/', '_')[:24]}" for k in keys) or "default"


def run_search_grid(
    grid: list[dict],
    out_dir: str,
    timeout_s: Optional[float] = None,
    iterations: int = 8,
) -> dict[str, dict]:
    """Run one synthetic-KG search per override dict; returns name → summary.

    Resumable: an experiment with an existing ``{name}/result.json`` is
    skipped (the reference's folder-listing resume).
    """
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def one_experiment(overrides: dict, exp_dir: str, iters: int) -> dict:
        from ..data.fixtures import make_search

        gs, _ = make_search(iterations=iters, **{
            k: v for k, v in overrides.items() if k in ("type_ranking",)
        })
        for k, v in overrides.items():
            if hasattr(gs.cfg, k) and k != "type_ranking":
                setattr(gs.cfg, k, v)
        gs.checkpoint_dir = os.path.join(exp_dir, "hops")
        gs.run()
        summary = {
            "config": asdict(gs.cfg),
            "iterations_run": gs.iteration,
            "subgraph_rows": gs.subgraph.num_rows,
            "events_found": len(gs.found_events()),
            "best": gs.best_metrics(),
            "metrics_per_iter": gs.metrics_per_iter,
        }
        os.makedirs(exp_dir, exist_ok=True)
        tmp = os.path.join(exp_dir, ".result.json.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(summary, f)
        os.replace(tmp, os.path.join(exp_dir, "result.json"))
        return summary

    results: dict[str, dict] = {}
    pending: dict = {}
    for overrides in grid:
        name = _exp_name(overrides)
        exp_dir = os.path.join(out_dir, name)
        done = os.path.join(exp_dir, "result.json")
        if os.path.exists(done):  # resume: already finished
            with open(done, encoding="utf-8") as f:
                results[name] = json.load(f)
            continue
        pending[one_experiment.remote(overrides, exp_dir, iterations)] = name

    refs = list(pending)
    while refs:
        ready, refs = ray.wait(refs, num_returns=1, timeout=timeout_s)
        if not ready:  # global timeout: cancel stragglers (killer_pmap parity)
            for r in refs:
                ray.cancel(r, force=True)
                results[pending[r]] = {"error": "timeout"}
            break
        for r in ready:
            try:
                results[pending[r]] = ray.get(r)
            except Exception as e:  # noqa: BLE001 — a failed experiment yields None-like
                results[pending[r]] = {"error": repr(e)}
    return results


def summary_table(results: dict[str, dict]):
    """A11 — per-experiment best-metric rows + a mean row
    (``experiments_run/get_table_results.py:19-31`` without the LaTeX
    rendering; consumers format as they wish)."""
    import pandas as pd

    rows = []
    for name, r in sorted(results.items()):
        best = r.get("best") or {}
        rows.append(
            {
                "experiment": name,
                "precision": best.get("precision", float("nan")),
                "recall": best.get("recall", float("nan")),
                "f1": best.get("f1", float("nan")),
                "subgraph_rows": r.get("subgraph_rows", 0),
            }
        )
    df = pd.DataFrame(rows)
    if not df.empty:
        mean = df[["precision", "recall", "f1", "subgraph_rows"]].mean()
        df = pd.concat(
            [df, pd.DataFrame([{"experiment": "MEAN", **mean.to_dict()}])],
            ignore_index=True,
        )
    return df


def summary_latex(results: dict[str, dict]) -> str:
    """A11 — the LaTeX rendering of the averaged result table
    (``src/build_table.py:62-92`` / ``get_table_results.py``)."""
    df = summary_table(results)
    return df.to_latex(index=False, float_format="%.3f")


def plot_experiments(results: dict[str, dict], out_dir: str) -> list[str]:
    """A11 (figures) — one per-iteration P/R/F1 line chart per experiment,
    written to ``<out_dir>/<name>/metrics.html`` (the reference's
    ``src/plotter.py`` output path per run). Dependency-free inline-SVG
    HTML; see :mod:`chronographer_ray.pipelines.plotter`."""
    import os

    from .plotter import Plotter

    plotter = Plotter()
    written = []
    for name, r in sorted(results.items()):
        info = r.get("metrics_per_iter") or {}
        if not info:
            continue
        exp_dir = os.path.join(out_dir, name)
        os.makedirs(exp_dir, exist_ok=True)
        written.append(plotter(info, exp_dir))
    return written


# ------------------------------------------------- frame-NG analysis (§3)
# Counterparts of the reference's two small analysis utilities:
# `experiments_run/get_csv_analyse_frame.py` (three SPARQL extractions over
# generated narrative graphs → frame/role/causation CSVs) and
# `experiments_run/extract_causation_for_annot.py` (seeded 100-annotation
# sample for human annotation). The rebuild's frame KG is an Arrow triple
# table (build_ng/text_kg.py), so the SPARQL joins become vectorized
# pyarrow joins — driver-side is fine: a narrative graph is abstract-
# bounded reporting data, exactly as the reference loads whole graphs
# into rdflib.

_NS_WSJ = "https://w3id.org/framester/wsj/"
_NS_NIF = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"
_NS_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_NS_SKOS = "http://www.w3.org/2004/02/skos/core#"


def _po(triples, predicate: str, s_name: str, o_name: str):
    """(subject, object) pairs of one predicate, renamed."""
    import pyarrow.compute as pc

    t = triples.filter(pc.equal(triples["predicate"], predicate))
    return t.select(["subject", "object"]).rename_columns([s_name, o_name])


def frame_ng_tables(triples) -> dict:
    """The three extraction tables of ``get_csv_analyse_frame.py`` from a
    frame-KG triple table: ``frames`` (event, frame, nb_frame),
    ``roles`` (event, annot, frame, lemma, fe, value, ent?) and
    ``causation`` (roles + sent_val, frame = Causation only)."""
    import pyarrow.compute as pc

    sent = _po(triples, _NS_NIF + "sentence", "event", "sent")
    from_doc = _po(triples, _NS_WSJ + "fromDocument", "annot", "sent")
    on_frame = _po(triples, _NS_WSJ + "onFrame", "annot", "frame")
    on_lemma = _po(triples, _NS_WSJ + "onLemma", "annot", "lemma")
    mapped = _po(triples, _NS_WSJ + "withmappedrole", "annot", "role")
    fe = _po(triples, _NS_WSJ + "withfnfe", "role", "fe")
    rvalue = _po(triples, _NS_RDF + "value", "role", "value")
    related = _po(triples, _NS_SKOS + "related", "role", "ent")

    annots = from_doc.join(sent, keys="sent").join(on_frame, keys="annot")
    # events with ≥1 mapped role only (the reference query requires
    # ?annot wsj:withmappedrole ?role)
    with_role = annots.join(
        mapped.group_by("annot").aggregate([("role", "count")]),
        keys="annot")
    frames = (
        with_role.group_by(["event", "frame"])
        .aggregate([("annot", "count_distinct")])
        .rename_columns(["event", "frame", "nb_frame"])
        .sort_by([("event", "ascending"), ("frame", "ascending")])
    )

    roles = (
        annots.join(on_lemma, keys="annot")
        .join(mapped, keys="annot")
        .join(fe, keys="role")
        .join(rvalue, keys="role")
        .join(related, keys="role", join_type="left outer")
    )
    role_cols = ["event", "annot", "frame", "lemma", "fe", "value", "ent"]
    roles = roles.select(role_cols).sort_by(
        [(c, "ascending") for c in role_cols[:-1]])

    sent_val = _po(triples, _NS_RDF + "value", "sent", "sent_val")
    causation = (
        annots.filter(pc.ends_with(annots["frame"], "/Causation"))
        .join(sent_val, keys="sent")
        .join(on_lemma, keys="annot")
        .join(mapped, keys="annot")
        .join(fe, keys="role")
        .join(rvalue, keys="role")
        .join(related, keys="role", join_type="left outer")
    )
    caus_cols = ["event", "annot", "sent_val", "frame", "lemma", "fe",
                 "value", "ent"]
    causation = causation.select(caus_cols).sort_by(
        [(c, "ascending") for c in caus_cols if c != "ent"])
    return {"frames": frames, "roles": roles, "causation": causation}


def causation_annotation_sample(causation, n: int = 100, seed: int = 23,
                                out_dir: str | None = None) -> dict:
    """``extract_causation_for_annot.py``: URI tails unquoted, a seeded
    ``random.sample`` of ``n`` distinct annotations (seed 23 — the
    reference's reproducibility seed), then the Cause/Effect frame-element
    subsets. Returns {subset, fe_annot, ent_annot} pandas frames and
    optionally writes the reference's three CSVs."""
    import os
    import random
    from urllib.parse import unquote

    df = causation if hasattr(causation, "to_csv") \
        else causation.to_pandas()
    df = df.copy()
    df["frame"] = "Causation"
    for col in ("event", "annot", "frame", "fe", "ent"):
        df[col] = df[col].map(
            lambda x: unquote(x.split("/")[-1]) if isinstance(x, str) else x)

    uniq = list(df["annot"].unique())
    random.seed(seed)
    sampled = random.sample(uniq, min(n, len(uniq)))
    subset = df[df["annot"].isin(sampled)]

    fe_annot = subset[["event", "annot", "sent_val", "lemma", "fe", "value"]
                      ].drop_duplicates()
    fe_annot = fe_annot[fe_annot["fe"].isin(["Cause", "Effect"])]
    ent_annot = subset.drop_duplicates()
    ent_annot = ent_annot[ent_annot["fe"].isin(["Cause", "Effect"])]

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        subset.to_csv(os.path.join(out_dir, "subset.csv"))
        fe_annot.to_csv(os.path.join(out_dir, "causation_fe_annot.csv"))
        ent_annot.to_csv(os.path.join(out_dir, "causation_ent_annot.csv"))
    return {"subset": subset, "fe_annot": fe_annot, "ent_annot": ent_annot}
