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
