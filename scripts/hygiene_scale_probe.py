"""Scale probe for the training-data hygiene operators: run each over a
replicated ~1M-doc corpus (sf0.1 × GRAFT_REPEAT, disjoint doc ids) and
print per-stage wall time + docs/s. Usage:

    python scripts/hygiene_scale_probe.py [sf_dir] [repeat]

Probes (each consumed fully, format-native blocks):
- quality_repetition  (map-only: tokenize + trigram stats)
- pii_redact          (map-only: Arrow RE2 scrub)
- benchmark_decontam  (0.1% benchmark split -> broadcast probe)
- corpus_mix          (splitmix64 per-source Bernoulli)
- sequence_pack       (distributed prefix sum, 32 ranges)
- train_shuffle       (splitmix64 rank prefix sum, 64 ranges, 8 shards)
"""
from __future__ import annotations

import os
import sys
import time

import pyarrow as pa

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
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from chronographer_ray.pipelines.bench_pipeline import replicated_docs
    from chronographer_ray.stages.decontam import decontam_report
    from chronographer_ray.stages.packing import sequence_pack_dataset
    from chronographer_ray.stages.pii import redact_dataset
    from chronographer_ray.stages.quality import repetition_filter_dataset
    from chronographer_ray.stages.sampling import (
        deterministic_shuffle_dataset,
        weighted_mix_dataset,
    )

    def docs():
        return replicated_docs(sf_dir, repeat)

    def with_source(ds):
        def add(b: pa.Table) -> pa.Table:
            import numpy as np

            ids = b["doc_id"].to_numpy(zero_copy_only=False) % 20
            return b.append_column(
                "source", pa.array([f"src{i}" for i in ids], pa.string())
            )

        return ds.map_batches(add, batch_format="pyarrow")

    n_docs = consume(docs())
    print(f"corpus: {n_docs} docs ({sf_dir} x {repeat})")

    probes = {
        "quality_repetition": lambda: repetition_filter_dataset(docs()),
        "pii_redact": lambda: redact_dataset(docs()),
        "benchmark_decontam": lambda: decontam_report(
            docs(), bench_mod=1000, bench_rem=7
        ),
        "corpus_mix": lambda: weighted_mix_dataset(
            with_source(docs()),
            lambda s: ((int(s[3:]) % 4) + 1) / 5.0,
            method="splitmix64",
        ),
        "sequence_pack": lambda: sequence_pack_dataset(docs(), capacity=512),
        "train_shuffle": lambda: deterministic_shuffle_dataset(
            docs(), n_shards=8, method="splitmix64"
        ),
    }
    for name, make in probes.items():
        t0 = time.time()
        rows = consume(make())
        dt = time.time() - t0
        print(f"{name}: {dt:.1f}s rows={rows} ({n_docs / dt:,.0f} docs/s)")

    ray.shutdown()


if __name__ == "__main__":
    main()
