"""Scale-path components: Ray-Dataset stage-2 ≡ eager stage-2, partitioned
sink with resumable manifests, two-stage dedup, closures, turtle, grid."""
import json
import os

import pyarrow as pa

from chronographer_ray.build_ng.event_kg import build_event_kg, build_event_kg_dataset
from chronographer_ray.data.fixtures import make_search
from chronographer_ray.data.synth import synth_kg
from chronographer_ray.functions.closure import (
    one_round_propagation,
    root_ancestor,
    transitive_closure,
)
from chronographer_ray.functions.turtle import export_turtle
from chronographer_ray.sources.triple_store import ParquetTripleStore
from chronographer_ray.state.sink import read_partitioned_triples, write_partitioned_triples


def test_dataset_stage2_equals_eager(ray_session, tmp_path):
    gs, side = make_search(iterations=8)
    sub = gs.run()
    eager = build_event_kg(
        sub, gs.store, side["domain"], side["range"], side["superclasses"],
        side["dates"][0], side["dates"][1],
    )
    triples, _ = synth_kg()
    store = ParquetTripleStore.write(triples, str(tmp_path / "kg"), partitions=8)
    lazy = build_event_kg_dataset(
        sub, store, side["domain"], side["range"], side["superclasses"],
        side["dates"][0], side["dates"][1], output_dir=str(tmp_path / "out"),
    )
    assert eager.to_pylist() == lazy.to_pylist()
    assert read_partitioned_triples(str(tmp_path / "out")).num_rows == eager.num_rows


def test_partitioned_sink_is_resumable(tmp_path):
    t = pa.table(
        {"subject": ["a", "b", "c"], "predicate": ["p"] * 3, "object": ["x", "y", "z"]}
    )
    root = str(tmp_path / "sink")
    write_partitioned_triples(t, root, partitions=4)
    # sabotage one partition's data but keep its manifest → rerun must SKIP it
    part_dirs = [d for d in os.listdir(root) if d.startswith("part=")]
    marker = os.path.join(root, part_dirs[0], "manifest.json")
    before = json.load(open(marker))
    write_partitioned_triples(t, root, partitions=4)
    assert json.load(open(marker)) == before
    assert read_partitioned_triples(root).num_rows == 3


def test_dedup_dataset_two_stage(ray_session):
    import ray.data as rd

    from chronographer_ray.stages.dedup import dedup_dataset

    t = pa.table(
        {
            "subject": ["hub"] * 1000 + ["a"],
            "predicate": ["p"] * 1001,
            "object": ["o"] * 1000 + ["b"],
        }
    )
    out = dedup_dataset(rd.from_arrow(t), ["subject", "predicate", "object"]).to_pandas()
    assert len(out) == 2


def test_closures():
    pairs = pa.table({"child": ["A", "B", "C"], "parent": ["B", "C", "Thing"]})
    assert one_round_propagation(pairs)["A"] == ["B", "C"]  # exactly one round
    assert transitive_closure(pairs)["A"] == ["B", "C", "Thing"]
    assert root_ancestor(pairs, owl_thing="Thing") == {"A": "C", "B": "C", "C": "C"}


def test_root_ancestor_cycle_guard():
    pairs = pa.table({"child": ["A", "B"], "parent": ["B", "A"]})
    out = root_ancestor(pairs, owl_thing="T")
    assert set(out) == {"A", "B"}  # terminates


def test_turtle_export(tmp_path):
    t = pa.table(
        {
            "subject": ["http://e/s"],
            "predicate": ["http://e/p"],
            "object": ["1789-01-01"],
        }
    )
    path = str(tmp_path / "g.ttl")
    assert export_turtle(t, path) == 1
    assert open(path).read() == '<http://e/s> <http://e/p> "1789-01-01" .\n'


def test_experiment_grid_runs_and_resumes(ray_session, tmp_path):
    from chronographer_ray.pipelines.experiments import run_search_grid

    out = str(tmp_path / "grid")
    grid = [{"type_ranking": "pred_freq"}]
    first = run_search_grid(grid, out, iterations=4)
    assert list(first.values())[0]["best"]["f1"] == 1.0
    # second run must come from the result manifest, not a recompute
    marker = os.path.join(out, "type_ranking-pred_freq", "result.json")
    mtime = os.path.getmtime(marker)
    second = run_search_grid(grid, out, iterations=4)
    assert os.path.getmtime(marker) == mtime
    assert second.keys() == first.keys()


def test_append_triples_delta_snapshots(tmp_path):
    from chronographer_ray.state.sink import append_triples

    base = pa.table(
        {"subject": ["a", "b"], "predicate": ["p"] * 2, "object": ["x", "y"]}
    )
    root = str(tmp_path / "kb")
    write_partitioned_triples(base, root, partitions=2)
    append_triples(
        pa.table({"subject": ["c"], "predicate": ["p"], "object": ["z"]}), root,
        partitions=2,
    )
    append_triples(
        pa.table({"subject": ["d"], "predicate": ["p"], "object": ["w"]}), root,
        partitions=2,
    )
    merged = read_partitioned_triples(root)
    assert sorted(merged["subject"].to_pylist()) == ["a", "b", "c", "d"]
    assert os.path.isdir(os.path.join(root, "delta=0000"))
    assert os.path.isdir(os.path.join(root, "delta=0001"))


def test_summary_table_mean_row(ray_session, tmp_path):
    from chronographer_ray.pipelines.experiments import run_search_grid, summary_table

    res = run_search_grid(
        [{"type_ranking": "pred_freq"}, {"type_ranking": "entropy_pred_freq"}],
        str(tmp_path / "grid"), iterations=3,
    )
    df = summary_table(res)
    assert list(df["experiment"])[-1] == "MEAN"
    assert len(df) == 3
    assert 0.0 <= df["f1"].iloc[-1] <= 1.0

    # A11 figures: one metrics.html per experiment with a line per metric
    from chronographer_ray.pipelines.experiments import plot_experiments

    written = plot_experiments(res, str(tmp_path / "grid"))
    assert len(written) == 2
    for p in written:
        assert os.path.exists(p)
        assert "<svg" in open(p, encoding="utf-8").read()


def test_turtle_round_trip(tmp_path):
    """export_turtle → import_turtle is the identity on canonical triples,
    including quoted/typed literals and escaped quotes."""
    from chronographer_ray.functions.turtle import export_turtle, import_turtle

    t = pa.table(
        {
            "subject": ["http://ex.org/e1", "http://ex.org/e1", "http://ex.org/e2"],
            "predicate": ["http://ex.org/p", "http://ex.org/q", "http://ex.org/p"],
            "object": [
                "http://ex.org/v",
                "plain literal with \"quotes\"",
                '"1789-01-01"^^<http://www.w3.org/2001/XMLSchema#date>',
            ],
        }
    )
    path = str(tmp_path / "kg.ttl")
    export_turtle(t, path)
    back = import_turtle(path)
    key = lambda x: sorted(  # noqa: E731
        zip(x["subject"].to_pylist(), x["predicate"].to_pylist(),
            x["object"].to_pylist())
    )
    assert key(back) == key(t)


def test_summary_latex(ray_session, tmp_path):
    from chronographer_ray.pipelines.experiments import run_search_grid, summary_latex

    res = run_search_grid([{"type_ranking": "pred_freq"}], str(tmp_path / "g"), iterations=2)
    tex = summary_latex(res)
    assert "tabular" in tex and "MEAN" in tex


def test_bucketed_group_apply_equals_plain_groupby(ray_session):
    """The shared bucket-shuffle helper produces exactly what a plain
    groupby-merge would, regardless of bucket assignment."""
    import pandas as pd
    import ray.data as rd

    from chronographer_ray.functions.shuffles import bucketed_group_apply

    rows = [{"k": f"key-{i % 7}", "v": i} for i in range(100)]
    ds = rd.from_items(rows)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False)["v"].sum()

    got = (
        bucketed_group_apply(ds, ["k"], merge)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame(rows).groupby("k", as_index=False)["v"].sum()
        .sort_values("k").reset_index(drop=True)
    )
    assert got.equals(want)
