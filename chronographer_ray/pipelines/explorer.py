"""Interactive per-iteration explorer for a GraphSearch run directory.

The reference drives its search interactively from a Streamlit app and
renders one pyvis network HTML per iteration
(``app/utils/graph_search.py:125-156`` builds ``subgraph-{i}.html`` for
every iteration). This module is the dependency-free equivalent: ONE
self-contained HTML file (inline SVG + vanilla JS, same zero-dependency
approach as ``pipelines/plotter.py``) with an iteration slider that
replays the whole run — subgraph growth, the expanded path per
iteration, and the P/R/F1 trajectory — from the artifacts ``cmd_search``
already writes (``subgraph.parquet``, ``metrics.json``,
``expanded.json``, ``metadata.json``).

Scale note: the explorer is a driver-side reporting surface over an
already-bounded artifact (a search subgraph is frontier-capped by
``max_uri``/``uri_limit``), not a data-plane operator; it caps the
rendered graph at ``max_nodes`` and says so in the page.
"""
from __future__ import annotations

import html
import json
import os
from collections import defaultdict

_PALETTE = [
    "#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#3ca951",
    "#ff8ab7", "#a463f2", "#97bbf5", "#9c6b4e", "#9498a0",
]


def _short(uri: str, n: int = 28) -> str:
    tail = uri.rsplit("/", 1)[-1].rsplit("#", 1)[-1]
    return tail if len(tail) <= n else tail[: n - 1] + "…"


def build_explorer(run_dir: str, out_html: str | None = None,
                   max_nodes: int = 400) -> str:
    """Render ``<run_dir>/explorer.html`` from a search run's artifacts;
    returns the output path."""
    import pyarrow.parquet as pq

    sg = pq.read_table(os.path.join(run_dir, "subgraph.parquet"))

    def _load(name, default):
        p = os.path.join(run_dir, name)
        if os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                return json.load(f)
        return default

    metrics = _load("metrics.json", {})
    expanded = _load("expanded.json", [])
    metadata = _load("metadata.json", {})

    subj = sg["subject"].to_pylist()
    pred = sg["predicate"].to_pylist()
    obj = sg["object"].to_pylist()
    its = sg["iteration"].to_pylist()

    # first-seen iteration per node; edge list with iteration tags
    first_seen: dict[str, int] = {}
    edges = []
    for s, p, o, i in zip(subj, pred, obj, its):
        for n in (s, o):
            if n not in first_seen:
                first_seen[n] = i
        edges.append((s, o, p, i))
    # bound the rendered graph: keep earliest-seen nodes (the search core)
    keep = dict(sorted(first_seen.items(), key=lambda kv: (kv[1], kv[0]))
                [:max_nodes])
    truncated = len(first_seen) - len(keep)
    edges = [e for e in edges if e[0] in keep and e[1] in keep]

    # layout: column = first-seen iteration, rows spread within column
    by_it: dict[int, list[str]] = defaultdict(list)
    for n, i in keep.items():
        by_it[i].append(n)
    max_it = max([int(i) for i in its] or [1])
    col_w, svg_h = 170, 640
    pos: dict[str, tuple[float, float]] = {}
    for i, nodes in by_it.items():
        nodes.sort()
        step = svg_h / (len(nodes) + 1)
        for j, n in enumerate(nodes):
            # small deterministic x-jitter so dense columns stay readable
            pos[n] = (40 + (i - 1) * col_w + (j % 3) * 22,
                      step * (j + 1))
    svg_w = 80 + max(1, max_it) * col_w

    node_js = [
        {"id": n, "x": round(x, 1), "y": round(y, 1), "it": int(keep[n]),
         "label": _short(n), "full": n}
        for n, (x, y) in pos.items()
    ]
    edge_js = [
        {"s": s, "o": o, "p": _short(p, 20), "it": int(i)}
        for s, o, p, i in edges
    ]
    metrics_js = {
        str(k): {kk: round(float(vv), 4) for kk, vv in v.items()
                 if isinstance(vv, (int, float))}
        for k, v in metrics.items()
    }
    expanded_js = [
        {"it": int(e.get("iteration", 0)),
         "path": e.get("path_expanded"),
         "n": int(e.get("nb_expanded", 0)),
         "score": e.get("score")}
        for e in expanded
    ]

    data = json.dumps({
        "nodes": node_js, "edges": edge_js, "metrics": metrics_js,
        "expanded": expanded_js, "maxIt": max_it,
        "truncated": truncated,
    })

    title = html.escape(os.path.basename(os.path.abspath(run_dir)))
    meta_line = html.escape(json.dumps(metadata))
    colors = json.dumps(_PALETTE)

    page = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>search explorer — {title}</title>
<style>
 body {{ font: 13px/1.45 system-ui, sans-serif; margin: 16px; color: #1b1f24; }}
 h1 {{ font-size: 17px; }} .muted {{ color: #667; }}
 #graph {{ border: 1px solid #dde; background: #fcfcfe; }}
 .edge {{ stroke: #b9c2d0; stroke-width: 1; }}
 .edge.new {{ stroke: #d4380d; stroke-width: 1.6; }}
 .node text {{ font-size: 9px; fill: #334; }}
 .expanded-ring {{ fill: none; stroke: #d4380d; stroke-width: 2.5; }}
 table {{ border-collapse: collapse; margin-top: 10px; }}
 td, th {{ border: 1px solid #dde; padding: 2px 8px; font-size: 12px; }}
 tr.cur {{ background: #fff3e6; }}
 #metrics {{ margin-top: 12px; }}
</style></head><body>
<h1>GraphSearch explorer — {title}</h1>
<div class="muted">metadata: {meta_line}</div>
<p>
 iteration <input type="range" id="it" min="1" max="1" value="1"
  style="width:320px;vertical-align:middle">
 <b id="itv">1</b>/<span id="itmax"></span>
 &nbsp; <span id="counts" class="muted"></span>
 <span id="trunc" class="muted"></span>
</p>
<svg id="graph" width="{svg_w}" height="{svg_h}"></svg>
<svg id="metrics" width="640" height="180"></svg>
<div id="exp"></div>
<script>
const D = {data};
const COLORS = {colors};
const svg = document.getElementById('graph');
const NS = 'http://www.w3.org/2000/svg';
const byId = Object.fromEntries(D.nodes.map(n => [n.id, n]));
// pre-render everything once; the slider only toggles visibility
const edgeEls = D.edges.map(e => {{
  const a = byId[e.s], b = byId[e.o];
  const l = document.createElementNS(NS, 'line');
  l.setAttribute('x1', a.x); l.setAttribute('y1', a.y);
  l.setAttribute('x2', b.x); l.setAttribute('y2', b.y);
  l.setAttribute('class', 'edge'); l.dataset.it = e.it;
  const t = document.createElementNS(NS, 'title');
  t.textContent = e.s + ' —' + e.p + '→ ' + e.o;
  l.appendChild(t); svg.appendChild(l); return l;
}});
const ringEl = document.createElementNS(NS, 'circle');
ringEl.setAttribute('class', 'expanded-ring'); ringEl.setAttribute('r', 9);
ringEl.style.display = 'none'; svg.appendChild(ringEl);
const nodeEls = D.nodes.map(n => {{
  const g = document.createElementNS(NS, 'g');
  g.setAttribute('class', 'node'); g.dataset.it = n.it;
  const c = document.createElementNS(NS, 'circle');
  c.setAttribute('cx', n.x); c.setAttribute('cy', n.y);
  c.setAttribute('r', 4.5);
  c.setAttribute('fill', COLORS[(n.it - 1) % COLORS.length]);
  const t = document.createElementNS(NS, 'title');
  t.textContent = n.full + '  (iteration ' + n.it + ')';
  const lbl = document.createElementNS(NS, 'text');
  lbl.setAttribute('x', n.x + 6); lbl.setAttribute('y', n.y + 3);
  lbl.textContent = n.label;
  g.appendChild(c); g.appendChild(t); g.appendChild(lbl);
  svg.appendChild(g); return g;
}});
// metrics chart
const ms = document.getElementById('metrics');
const keys = ['precision', 'recall', 'f1'];
const mIts = Object.keys(D.metrics).map(Number).sort((a, b) => a - b);
const mx = x => 40 + (x - 1) / Math.max(1, D.maxIt - 1) * 580;
const my = v => 160 - v * 140;
keys.forEach((k, ki) => {{
  if (!mIts.length) return;
  const pl = document.createElementNS(NS, 'polyline');
  pl.setAttribute('points',
    mIts.map(i => mx(i) + ',' + my(D.metrics[i][k] || 0)).join(' '));
  pl.setAttribute('fill', 'none');
  pl.setAttribute('stroke', COLORS[ki]); pl.setAttribute('stroke-width', 1.6);
  ms.appendChild(pl);
  const lab = document.createElementNS(NS, 'text');
  lab.setAttribute('x', 45 + ki * 80); lab.setAttribute('y', 14);
  lab.setAttribute('fill', COLORS[ki]); lab.style.font = '11px sans-serif';
  lab.textContent = k; ms.appendChild(lab);
}});
const cursor = document.createElementNS(NS, 'line');
cursor.setAttribute('y1', 20); cursor.setAttribute('y2', 160);
cursor.setAttribute('stroke', '#d4380d'); ms.appendChild(cursor);
// expansion table
const exp = document.getElementById('exp');
if (D.expanded.length) {{
  exp.innerHTML = '<table><tr><th>iter</th><th>path expanded</th>' +
    '<th>nodes</th><th>score</th></tr>' + D.expanded.map(e =>
    '<tr data-it="' + e.it + '"><td>' + e.it + '</td><td>' +
    (Array.isArray(e.path) ? e.path.join(' · ') : e.path) + '</td><td>' +
    e.n + '</td><td>' + (e.score == null ? '' : e.score) + '</td></tr>'
  ).join('') + '</table>';
}}
const slider = document.getElementById('it');
slider.max = D.maxIt;
document.getElementById('itmax').textContent = D.maxIt;
if (D.truncated > 0) document.getElementById('trunc').textContent =
  ' (graph capped: ' + D.truncated + ' later-seen nodes not drawn)';
function render() {{
  const it = +slider.value;
  document.getElementById('itv').textContent = it;
  let ne = 0, nn = 0;
  edgeEls.forEach(l => {{
    const i = +l.dataset.it;
    l.style.display = i <= it ? '' : 'none';
    l.classList.toggle('new', i === it);
    if (i <= it) ne++;
  }});
  nodeEls.forEach(g => {{
    const v = +g.dataset.it <= it;
    g.style.display = v ? '' : 'none'; if (v) nn++;
  }});
  const e = D.expanded.find(x => x.it === it);
  const target = e && Array.isArray(e.path) ? e.path[e.path.length - 1]
    : e && e.path;
  const tn = target && byId[target];
  ringEl.style.display = tn ? '' : 'none';
  if (tn) {{ ringEl.setAttribute('cx', tn.x); ringEl.setAttribute('cy', tn.y); }}
  cursor.setAttribute('x1', mx(it)); cursor.setAttribute('x2', mx(it));
  document.getElementById('counts').textContent =
    nn + ' nodes, ' + ne + ' edges visible';
  document.querySelectorAll('#exp tr[data-it]').forEach(r =>
    r.classList.toggle('cur', +r.dataset.it === it));
}}
slider.addEventListener('input', render);
render();
</script></body></html>
"""
    out = out_html or os.path.join(run_dir, "explorer.html")
    with open(out, "w", encoding="utf-8") as f:
        f.write(page)
    return out
