"""Graph-analytics scale probe: replicate the sf0.1 KG entity graph R×
with disjoint node-id suffixes (PageRank/degree/components semantics are
preserved per copy) and measure pagerank/degree throughput well past the
eval sizes. Records go to BASELINE.md.

Usage: python scripts/graph_scale_probe.py [R] [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc


def main() -> int:
    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from chronographer_ray.data.derived import triples_dataset
    from chronographer_ray.stages.graph import degree_topk_dataset, pagerank_dataset

    def replicate(b: pa.Table) -> pa.Table:
        outs = []
        for r in range(repeat):
            sfx = f"#{r}"
            outs.append(pa.table({
                "subject": pc.binary_join_element_wise(b["subject"], sfx, ""),
                "predicate": b["predicate"],
                # literal objects get the suffix too — harmless: they are
                # filtered out by the URI-prefix edge projection anyway
                "object": pc.binary_join_element_wise(b["object"], sfx, ""),
            }))
        return pa.concat_tables(outs)

    triples = triples_dataset(sf_dir).map_batches(
        replicate, batch_format="pyarrow"
    ).materialize()
    n_triples = triples.count()

    t0 = time.time()
    pr = pagerank_dataset(triples, iters=3)
    n_nodes = pr.count()
    pr_s = time.time() - t0
    n_edges_per_iter = None  # edges processed per pass = URI-object triples

    t0 = time.time()
    top = degree_topk_dataset(triples, k=20).to_pandas()
    deg_s = time.time() - t0

    # edge count = URI-object triples (what both ops actually process)
    edges = triples.map_batches(
        lambda b: pa.table({"n": pa.array(
            [pc.sum(pc.cast(pc.starts_with(b["object"], "ex:"), pa.int64())).as_py() or 0],
            pa.int64())}),
        batch_format="pyarrow",
    ).to_pandas()["n"].sum()

    print({
        "replicate": repeat,
        "triples": int(n_triples),
        "edges": int(edges),
        "nodes": int(n_nodes),
        "pagerank_3iter_sec": round(pr_s, 1),
        "pagerank_edge_passes_per_s": int(3 * edges / pr_s),
        "degree_topk_sec": round(deg_s, 1),
        "top_hub": top.iloc[0]["node"] if len(top) else None,
        "_unused": n_edges_per_iter,
    })
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
