"""Per-hop checkpoint / lineage manifests — mid-frontier resume.

The reference writes per-iteration CSV/JSON state but never reloads it
(``src/framework.py:740-804``; resume exists only at experiment granularity
in ``experiments_run/run_all_search.py:271-324``). The graft requires true
mid-frontier resume: each hop writes, atomically (temp dir + rename):

    {root}/hop=NNNN/
        subgraph.parquet      rows found THIS hop (partitioned accumulation —
                              a resumed run never rewrites earlier hops)
        pending_in.parquet    full frontier snapshot after the hop
        pending_out.parquet
        state.json            {iteration, visited, occurrences, to_expand,
                              score, discarded, metrics, config fingerprint,
                              rows-per-table lineage counts}
        _SUCCESS              completion marker

Resume loads the LAST hop directory with a _SUCCESS marker, restores driver
state from its state.json, reloads its pending snapshots, and concatenates
the subgraph.parquet of every complete hop ≤ it.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import TYPE_CHECKING, Optional

import pyarrow as pa
import pyarrow.parquet as pq

if TYPE_CHECKING:
    from ..search.frontier import GraphSearch


def _hop_dir(root: str, iteration: int) -> str:
    return os.path.join(root, f"hop={iteration:04d}")


def save_hop(search: "GraphSearch", root: str) -> str:
    i = search.iteration
    final = _hop_dir(root, i)
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)

    hop_subgraph = search.subgraph
    if hop_subgraph.num_rows:
        import pyarrow.compute as pc

        hop_subgraph = hop_subgraph.filter(pc.equal(hop_subgraph["iteration"], i))
    pq.write_table(hop_subgraph, os.path.join(tmp, "subgraph.parquet"))
    pq.write_table(search.pending_in, os.path.join(tmp, "pending_in.parquet"))
    pq.write_table(search.pending_out, os.path.join(tmp, "pending_out.parquet"))

    state = {
        "iteration": i,
        "visited": search.visited,
        "occurrences": search.occurrence.as_dict(),
        "occurrence_order": list(search.occurrence.counts.keys()),
        "to_expand": search.to_expand,
        "score_expansion": search.score_expansion,
        "discarded": search.discarded,
        "metrics_per_iter": {str(k): v for k, v in search.metrics_per_iter.items()},
        "expanded_log": search.expanded_log,
        "config": search.cfg.to_json(),
        "lineage": {
            "hop_subgraph_rows": hop_subgraph.num_rows,
            "total_subgraph_rows": search.subgraph.num_rows,
            "pending_in_rows": search.pending_in.num_rows,
            "pending_out_rows": search.pending_out.num_rows,
            "visited_count": len(search.visited),
        },
    }
    with open(os.path.join(tmp, "state.json"), "w", encoding="utf-8") as f:
        json.dump(state, f)
    with open(os.path.join(tmp, "_SUCCESS"), "w", encoding="utf-8") as f:
        f.write("")
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    return final


def latest_complete_hop(root: str) -> Optional[int]:
    if not os.path.isdir(root):
        return None
    hops = []
    for name in os.listdir(root):
        if name.startswith("hop=") and os.path.exists(os.path.join(root, name, "_SUCCESS")):
            hops.append(int(name.split("=", 1)[1]))
    return max(hops) if hops else None


def resume(search: "GraphSearch", root: str) -> bool:
    """Restore ``search`` to the last complete hop; True if state was loaded.

    Raises if the checkpoint was produced under a different config (the
    fingerprint in state.json must match) — a resumed run must be the same
    logical job.
    """
    last = latest_complete_hop(root)
    if last is None:
        return False
    hop = _hop_dir(root, last)
    with open(os.path.join(hop, "state.json"), encoding="utf-8") as f:
        state = json.load(f)
    def identity(cfg_json: str) -> dict:
        # run LENGTH is not job identity: resuming with a higher `iterations`
        # (continue a truncated run) is the primary resume use case
        d = json.loads(cfg_json)
        d.pop("iterations", None)
        return d

    if identity(state["config"]) != identity(search.cfg.to_json()):
        raise ValueError(
            "checkpoint config fingerprint does not match the current config; "
            "refusing to resume a different job"
        )

    search.iteration = state["iteration"]
    search.visited = list(state["visited"])
    search.to_expand = state["to_expand"]
    search.score_expansion = state["score_expansion"]
    search.discarded = list(state["discarded"])
    search.metrics_per_iter = {int(k): v for k, v in state["metrics_per_iter"].items()}
    search.expanded_log = list(state["expanded_log"])

    from ..search.ordering import OccurrenceState

    occ = OccurrenceState()
    occ.merge_counted(
        (k, state["occurrences"][k]) for k in state["occurrence_order"]
    )
    search.occurrence = occ

    search.pending_in = pq.read_table(os.path.join(hop, "pending_in.parquet"))
    search.pending_out = pq.read_table(os.path.join(hop, "pending_out.parquet"))

    parts = []
    for i in range(1, last + 1):
        p = os.path.join(_hop_dir(root, i), "subgraph.parquet")
        if os.path.exists(p):
            parts.append(pq.read_table(p))
    if parts:
        search.subgraph = pa.concat_tables(parts)
    return True


def prune_hops(root: str, keep_pending: int = 1) -> int:
    """S7 retention (the reference's ``keep_only_last``, adapted): delete the
    frontier snapshots (``pending_*.parquet``) of all but the newest
    ``keep_pending`` complete hops — they are only needed to resume FROM that
    hop. Subgraph deltas, state.json and _SUCCESS markers are kept: resume
    reconstructs the accumulated subgraph from every hop's delta, so pruning
    those would break it (the reference instead rewrites a cumulative CSV
    each iteration and deletes the previous one, ``src/framework.py:734-746``).
    Returns the number of files removed."""
    last = latest_complete_hop(root)
    if last is None:
        return 0
    removed = 0
    for name in os.listdir(root):
        if not name.startswith("hop="):
            continue
        it = int(name.split("=", 1)[1])
        if it > last - keep_pending:
            continue
        for fname in ("pending_in.parquet", "pending_out.parquet"):
            p = os.path.join(root, name, fname)
            if os.path.exists(p):
                os.remove(p)
                removed += 1
    return removed
