"""Scale probe for the round-3 text operators over a replicated ~1M-doc
corpus (sf0.1 × GRAFT_REPEAT, disjoint doc ids):

- build_positional_index  (postings explode → partition-sorted resumable
  sink; ~#tokens rows per doc, the classic positional-index cost)
- phrase_search           (pruned partition read + anchor-vote probe)
- winnowing_rows explode  (map-only per-char polynomial + window min)

Usage: python scripts/text_scale_probe.py [sf_dir] [repeat]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def consume(ds) -> int:
    n = 0
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        n += b.num_rows
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from chronographer_ray.pipelines.bench_pipeline import replicated_docs
    from chronographer_ray.stages.invindex import (
        build_positional_index,
        phrase_search,
    )
    from chronographer_ray.stages.text import (
        WINNOW_BATCH_SIZE,
        winnowing_batch,
    )

    n_docs = consume(replicated_docs(sf_dir, repeat))
    print(f"corpus: {n_docs} docs ({sf_dir} x {repeat})")

    root = tempfile.mkdtemp(prefix="posidx_probe_")
    try:
        t0 = time.time()
        build_positional_index(replicated_docs(sf_dir, repeat), root)
        dt = time.time() - t0
        print(f"build_positional_index: {dt:.1f}s "
              f"({n_docs / dt:,.0f} docs/s)")

        t0 = time.time()
        rows = consume(phrase_search(root, ["value", "table", "part"]))
        dt = time.time() - t0
        print(f"phrase_search: {dt:.1f}s rows={rows} "
              f"({n_docs / dt:,.0f} docs/s vs corpus)")
    finally:
        shutil.rmtree(root, ignore_errors=True)

    t0 = time.time()
    rows = consume(
        replicated_docs(sf_dir, repeat).map_batches(
            winnowing_batch, batch_format="pyarrow",
            batch_size=WINNOW_BATCH_SIZE))
    dt = time.time() - t0
    print(f"winnowing: {dt:.1f}s rows={rows} ({n_docs / dt:,.0f} docs/s)")

    ray.shutdown()


if __name__ == "__main__":
    main()
