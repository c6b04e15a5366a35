"""A11 reporting — plotter transform parity + self-contained HTML figure.

Reference semantics: ``/root/reference/src/plotter.py:9-39`` (metrics dict →
long (iteration, value, type_) dataframe → line chart at
``<save_folder>/metrics.html``). The transform is asserted row-for-row; the
figure (plotly there, inline SVG here — no plotly in this container) is
checked structurally: three series paths inside the viewBox, legend, table
view, dark-mode styles, hover layer.
"""
import re

from chronographer_ray.pipelines.plotter import Plotter

INFO = {
    "1": {"precision": 1.0, "recall": 0.029, "f1": 0.056},
    "2": {"precision": 0.98, "recall": 0.13, "f1": 0.23},
    "3": {"precision": 0.95, "recall": 0.349, "f1": 0.51},
}


def test_transform_parity_long_format():
    df = Plotter().build_df_from_output(INFO)
    assert list(df.columns) == ["iteration", "value", "type_"]
    assert len(df) == 9
    # reference row order: per iteration, [precision, recall, f1]
    assert df["type_"].tolist() == ["precision", "recall", "f1"] * 3
    assert df.iloc[0]["value"] == 1.0 and df.iloc[8]["value"] == 0.51


def test_figure_written_and_structurally_sound(tmp_path):
    p = Plotter()
    out = p(INFO, str(tmp_path))
    assert out.endswith("/metrics.html")
    h = open(out, encoding="utf-8").read()
    assert "NaN" not in h
    paths = re.findall(r'<path d="([^"]+)"', h)
    assert len(paths) == 3  # one line per metric
    for d in paths:  # every coordinate inside the viewBox
        assert all(0 <= float(n) <= 720 for n in re.findall(r"-?\d+\.?\d*", d))
    assert "<table>" in h  # table view (contrast-WARN relief + a11y)
    assert "prefers-color-scheme: dark" in h  # selected dark mode
    assert 'id="tip"' in h and "mousemove" in h  # hover layer
    for m in ("precision", "recall", "f1"):  # legend + direct labels
        assert h.count(m) >= 3


def test_missing_metric_series_is_omitted(tmp_path):
    p = Plotter()
    p.metrics = ["precision", "recall"]  # e.g. f1 not recorded
    info = {"1": {"precision": 1.0, "recall": 0.1}}
    df = p.build_df_from_output(info)
    h = p.build_figure(df)
    assert len(re.findall(r'<path d="', h)) == 2


def test_explorer_builds_selfcontained_html(tmp_path):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from chronographer_ray.pipelines.explorer import build_explorer

    run = tmp_path / "run"
    run.mkdir()
    sg = pa.table({
        "subject": ["ex:a", "ex:a", "ex:b"],
        "predicate": ["ex:p", "ex:q", "ex:p"],
        "object": ["ex:b", "ex:c", "ex:c"],
        "type_df": ["ingoing"] * 3,
        "iteration": pa.array([1, 1, 2], pa.int32()),
    })
    pq.write_table(sg, run / "subgraph.parquet")
    (run / "metrics.json").write_text(json.dumps({
        "1": {"precision": 0.5, "recall": 0.25, "f1": 1 / 3},
        "2": {"precision": 1.0, "recall": 0.5, "f1": 2 / 3},
    }))
    (run / "expanded.json").write_text(json.dumps([
        {"iteration": 2, "path_expanded": ["ex:p", "ex:b"],
         "nb_expanded": 1, "score": 0.7},
    ]))
    (run / "metadata.json").write_text(json.dumps({"iterations_run": 2}))

    out = build_explorer(str(run))
    h = open(out, encoding="utf-8").read()
    # self-contained: no external script/style/img references
    assert "http" not in h.split("<body>")[1].split("<script>")[0]
    assert 'input type="range"' in h        # the iteration slider
    assert '"maxIt": 2' in h or '"maxIt":2' in h
    for n in ("ex:a", "ex:b", "ex:c"):
        assert n in h                        # nodes embedded
    assert "polyline" in h and "precision" in h   # metrics chart
    assert "path expanded" in h              # expansion table
    # cap path: max_nodes=1 keeps the earliest node and reports truncation
    out2 = build_explorer(str(run), out_html=str(tmp_path / "capped.html"),
                          max_nodes=1)
    h2 = open(out2, encoding="utf-8").read()
    assert '"truncated": 2' in h2 or '"truncated":2' in h2


def test_explorer_cli(tmp_path):
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    run = tmp_path / "run"
    run.mkdir()
    pq.write_table(pa.table({
        "subject": ["ex:a"], "predicate": ["ex:p"], "object": ["ex:b"],
        "type_df": ["ingoing"], "iteration": pa.array([1], pa.int32()),
    }), run / "subgraph.parquet")
    r = subprocess.run(
        [sys.executable, "-m", "chronographer_ray", "explore", str(run)],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    out = json.loads(r.stdout.strip().splitlines()[-1])["explorer"]
    assert (run / "explorer.html").exists()
    assert out.endswith("explorer.html")
