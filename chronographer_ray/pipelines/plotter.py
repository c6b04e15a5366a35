"""A11 (reporting) — per-iteration P/R/F1 line chart, reference-parity.

The reference's ``src/plotter.py:9-39`` turns the search metrics dict
(``{iteration: {precision, recall, f1}}``) into a long dataframe and writes a
plotly line chart to ``<save_folder>/metrics.html``. Plotly is not available
in this container, so the figure is a **self-contained HTML document with an
inline SVG line chart** — no dependencies, same input contract, same output
path. ``build_df_from_output`` is transform-parity with the reference (same
columns ``iteration``/``value``/``type_``, same row order).

Chart spec: one y-axis, thin 2px lines, ≥8px hover targets via an invisible
crosshair layer, legend + direct end-labels (3 series), recessive grid, data
table under the figure, light/dark via CSS custom properties. Palette
(validated, CVD-safe, fixed assignment): precision=blue, recall=orange,
f1=aqua.
"""
from __future__ import annotations

import html as _html
import json

import pandas as pd

METRICS = ["precision", "recall", "f1"]

# categorical slots 1-3 (validated light/dark pairs); fixed per-entity
# assignment — precision is ALWAYS blue regardless of which series exist
_SERIES_COLOR = {
    "precision": ("#2a78d6", "#3987e5"),
    "recall": ("#eb6834", "#d95926"),
    "f1": ("#1baf7a", "#199e70"),
}

_W, _H = 720, 360
_ML, _MR, _MT, _MB = 56, 96, 24, 44  # right margin hosts direct end-labels


class Plotter:
    """Metrics dict → long dataframe → self-contained HTML line chart."""

    def __init__(self):
        self.metrics = list(METRICS)

    # -- transform parity with the reference (plotter.py:14-23) -------------
    def build_df_from_output(self, info: dict) -> pd.DataFrame:
        frames = [pd.DataFrame(dict(iteration=[], value=[], type_=[]))]
        for i, metrics in info.items():
            frames.append(
                pd.DataFrame.from_dict(
                    dict(
                        iteration=[i] * len(self.metrics),
                        value=[metrics[t] for t in self.metrics],
                        type_=self.metrics,
                    )
                )
            )
        return pd.concat(frames, ignore_index=True)

    # -- figure --------------------------------------------------------------
    @staticmethod
    def build_figure(df: pd.DataFrame) -> str:
        """Long dataframe → HTML document string (inline SVG + hover layer +
        data table; light/dark from the same validated ramps)."""
        present = [m for m in METRICS if (df["type_"] == m).any()]
        xs = sorted(df["iteration"].astype(float).unique())
        if not xs:
            xs = [0.0]
        x0, x1 = min(xs), max(xs) or 1.0
        xspan = (x1 - x0) or 1.0
        pw, ph = _W - _ML - _MR, _H - _MT - _MB

        def sx(x: float) -> float:
            return _ML + (x - x0) / xspan * pw

        def sy(v: float) -> float:
            return _MT + (1.0 - max(0.0, min(1.0, v))) * ph

        series: dict[str, list[tuple[float, float]]] = {}
        for m in present:
            sub = df[df["type_"] == m].astype({"iteration": float, "value": float})
            series[m] = sorted(zip(sub["iteration"], sub["value"]))

        grid, yticks = [], []
        for t in (0.0, 0.25, 0.5, 0.75, 1.0):
            y = sy(t)
            grid.append(
                f'<line x1="{_ML}" y1="{y:.1f}" x2="{_ML + pw}" y2="{y:.1f}" class="grid"/>'
            )
            yticks.append(
                f'<text x="{_ML - 8}" y="{y + 4:.1f}" text-anchor="end" class="tick">{t:g}</text>'
            )
        n_xt = min(8, len(xs))
        step = max(1, (len(xs) - 1) // max(1, n_xt - 1)) if len(xs) > 1 else 1
        xticks = [
            f'<text x="{sx(x):.1f}" y="{_MT + ph + 20}" text-anchor="middle" class="tick">{x:g}</text>'
            for x in xs[::step]
        ]

        paths, endlabels, legend = [], [], []
        for m in present:
            pts = series[m]
            d = "M" + " L".join(f"{sx(x):.1f},{sy(v):.1f}" for x, v in pts)
            paths.append(f'<path d="{d}" class="line s-{m}"/>')
            lx, lv = pts[-1]
            endlabels.append(
                f'<text x="{sx(lx) + 8:.1f}" y="{sy(lv) + 4:.1f}" class="dlabel">'
                f'<tspan class="swatch-t s-{m}-t">●</tspan> {m}</text>'
            )
            legend.append(
                f'<span class="leg"><span class="swatch s-{m}-bg"></span>{m}</span>'
            )

        payload = {
            "xs": xs,
            "series": {m: [[float(x), float(v)] for x, v in series[m]] for m in present},
            "colors": {m: _SERIES_COLOR[m][0] for m in present},
            "plot": [_ML, _MT, pw, ph],
            "x0": x0,
            "xspan": xspan,
        }

        rows = "".join(
            "<tr><td>{:g}</td>{}</tr>".format(
                x,
                "".join(
                    "<td>{}</td>".format(
                        next((f"{v:.3f}" for px, v in series[m] if px == x), "—")
                    )
                    for m in present
                ),
            )
            for x in xs
        )
        head = "".join(f"<th>{m}</th>" for m in present)

        css_series = "\n".join(
            f".s-{m}{{stroke:var(--c-{m})}} .s-{m}-t{{fill:var(--c-{m})}}"
            f" .s-{m}-bg{{background:var(--c-{m})}}"
            for m in present
        )
        vars_light = "\n".join(
            f"--c-{m}:{_SERIES_COLOR[m][0]};" for m in present
        )
        vars_dark = "\n".join(f"--c-{m}:{_SERIES_COLOR[m][1]};" for m in present)

        return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Search metrics</title>
<style>
.viz-root{{color-scheme:light;--surface-1:#fcfcfb;--text-primary:#0b0b0b;
--text-secondary:#52514e;--grid:#e4e3df;{vars_light}
font:14px/1.45 system-ui,sans-serif;background:var(--surface-1);
color:var(--text-primary);max-width:{_W}px;margin:24px auto;padding:0 12px}}
@media (prefers-color-scheme: dark){{
:root:where(:not([data-theme="light"])) .viz-root{{color-scheme:dark;
--surface-1:#1a1a19;--text-primary:#ffffff;--text-secondary:#c3c2b7;
--grid:#343431;{vars_dark}}}}}
:root[data-theme="dark"] .viz-root{{color-scheme:dark;--surface-1:#1a1a19;
--text-primary:#ffffff;--text-secondary:#c3c2b7;--grid:#343431;{vars_dark}}}
.grid{{stroke:var(--grid);stroke-width:1}}
.tick,.dlabel{{fill:var(--text-secondary);font:12px system-ui,sans-serif}}
.dlabel{{fill:var(--text-primary)}}
.line{{fill:none;stroke-width:2}}
{css_series}
.leg{{margin-right:16px;color:var(--text-secondary)}}
.swatch{{display:inline-block;width:10px;height:10px;border-radius:2px;
margin-right:6px;vertical-align:baseline}}
table{{border-collapse:collapse;margin-top:12px;color:var(--text-primary)}}
td,th{{padding:3px 10px;border-bottom:1px solid var(--grid);text-align:right}}
#tip{{position:absolute;display:none;background:var(--surface-1);
border:1px solid var(--grid);border-radius:4px;padding:6px 8px;
pointer-events:none;font-size:12px;color:var(--text-primary)}}
.xh{{stroke:var(--grid);stroke-width:1;stroke-dasharray:3 3;display:none}}
</style></head>
<body><div class="viz-root">
<h3>Search metrics per iteration</h3>
<div>{''.join(legend)}</div>
<div style="position:relative">
<svg id="plot" viewBox="0 0 {_W} {_H}" width="100%" role="img"
 aria-label="Line chart of precision, recall and F1 per search iteration">
{''.join(grid)}
<line x1="{_ML}" y1="{_MT + ph}" x2="{_ML + pw}" y2="{_MT + ph}" class="grid"/>
{''.join(yticks)}{''.join(xticks)}
<text x="{_ML + pw / 2:.0f}" y="{_H - 6}" text-anchor="middle" class="tick">iteration</text>
{''.join(paths)}{''.join(endlabels)}
<line id="xh" class="xh" y1="{_MT}" y2="{_MT + ph}"/>
<g id="dots"></g>
<rect x="{_ML}" y="{_MT}" width="{pw}" height="{ph}" fill="transparent" id="hover"/>
</svg>
<div id="tip"></div>
</div>
<table><thead><tr><th>iteration</th>{head}</tr></thead><tbody>{rows}</tbody></table>
<script>
const D={json.dumps(payload)};
const svg=document.getElementById('plot'),tip=document.getElementById('tip'),
xh=document.getElementById('xh'),dots=document.getElementById('dots'),
hov=document.getElementById('hover');
const [ML,MT,PW,PH]=D.plot;
const sx=x=>ML+(x-D.x0)/D.xspan*PW, sy=v=>MT+(1-Math.max(0,Math.min(1,v)))*PH;
hov.addEventListener('mousemove',e=>{{
 const r=svg.getBoundingClientRect(),k=r.width/{_W};
 const px=(e.clientX-r.left)/k;
 let best=D.xs[0];for(const x of D.xs)if(Math.abs(sx(x)-px)<Math.abs(sx(best)-px))best=x;
 xh.style.display='block';xh.setAttribute('x1',sx(best));xh.setAttribute('x2',sx(best));
 let h='<b>iter '+best+'</b>';dots.innerHTML='';
 for(const m in D.series){{const p=D.series[m].find(q=>q[0]===best);if(!p)continue;
  h+='<br><span style="color:'+D.colors[m]+'">●</span> '+m+' '+p[1].toFixed(3);
  const c=document.createElementNS('http://www.w3.org/2000/svg','circle');
  c.setAttribute('cx',sx(best));c.setAttribute('cy',sy(p[1]));c.setAttribute('r',4);
  c.setAttribute('fill',D.colors[m]);c.setAttribute('stroke','var(--surface-1)');
  c.setAttribute('stroke-width',2);dots.appendChild(c);}}
 tip.innerHTML=h;tip.style.display='block';
 tip.style.left=Math.min(e.clientX-r.left+14,r.width-120)+'px';
 tip.style.top=(e.clientY-r.top+14)+'px';}});
hov.addEventListener('mouseleave',()=>{{tip.style.display='none';
xh.style.display='none';dots.innerHTML='';}});
</script>
</div></body></html>
"""

    @staticmethod
    def save_fig(fig_html: str, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(fig_html)

    def __call__(self, info: dict, save_folder: str) -> str:
        df = self.build_df_from_output(info)
        path = f"{save_folder}/metrics.html"
        self.save_fig(self.build_figure(df), path)
        return path
