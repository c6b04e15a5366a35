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
