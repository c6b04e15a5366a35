"""Store-path scale probe: build a ~1M-triple synthetic KG, write it through
the DISTRIBUTED Ray store builder (``ParquetTripleStore.write_ray``), then run
the full informed search against the on-disk store (partition-pruned point
lookups + the lazy ``expand_dataset`` path for wide frontiers).

Prints one JSON line: triples, build seconds, search iterations/expansions,
expansions/s. Recorded per-round in BASELINE.md.

Usage: python scripts/store_scale_probe.py [n_battles] [hub_degree]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # ~7 triples per battle → ~1M triples at the default
    n_battles = int(sys.argv[1]) if len(sys.argv) > 1 else 140_000
    hub_degree = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from chronographer_ray.data.fixtures import synth_configs
    from chronographer_ray.data.synth import synth_kg
    from chronographer_ray.search.frontier import GraphSearch
    from chronographer_ray.sources.triple_store import ParquetTripleStore

    triples, side = synth_kg(
        n_battles=n_battles, n_offwindow=50, hub_degree=hub_degree
    )
    root = tempfile.mkdtemp(prefix="store_probe_")
    t0 = time.time()
    store = ParquetTripleStore.write_ray(
        rd.from_arrow(triples).repartition(32), root, partitions=32
    )
    build_s = time.time() - t0

    ds_cfg, s_cfg = synth_configs(side, iterations=6)
    gs = GraphSearch(
        store=store,
        dataset=ds_cfg,
        config=s_cfg,
        domain_map=side["domain"],
        range_map=side["range"],
        superclasses=side["superclasses"],
        gold_events=side["gold_events"],
        referents=side["referents"],
    )
    t0 = time.time()
    gs.run()
    search_s = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "store_scale_probe",
                "triples": triples.num_rows,
                "ray_build_sec": round(build_s, 2),
                "iterations": 6,
                "expansions": len(gs.visited),
                "search_sec": round(search_s, 2),
                "expansions_per_s": round(len(gs.visited) / search_s, 1),
                "writer": store.manifest.get("writer", "single"),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
