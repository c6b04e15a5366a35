"""End-to-end training-data hygiene pipeline: the corpus-side flagship.

One streaming pass over a documents table, composing every hygiene
operator the way a real pre-training data build chains them:

    read → quality filter (Gopher repetition rules)
         → PII redaction (RE2 scrub)
         → exact dedup (fingerprint keep-first)
         → benchmark decontamination (broadcast shingle probe)
         → corpus mixing (per-source keep rates)
         → sequence packing (context-window binning)
         → resumable partitioned sink (+ deterministic shard/pos)

Composition notes (the order IS the design):
- quality/PII/dedup run before decontamination so the (expensive-ish)
  shingle probe sees the already-thinned corpus;
- dedup keeps the lexicographically-first fingerprint owner, so the
  pipeline is deterministic end-to-end — same input, same survivors,
  same bins, any cluster size;
- every stage is a map_batches (or the documented prefix-sum/groupby
  shape); the only driver state is the broadcast benchmark hash set and
  the tiny per-range prefix offsets.

Returns per-stage row counts so callers (CLI, bench, tests) can assert
the funnel; writes nothing unless ``out_root`` is given.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _with_source(ds, mod: int = 20):
    """Synthesize the source column when the input lacks one (the
    replicated bench corpus drops it): source = src<doc_id % mod>."""

    def add(b: pa.Table) -> pa.Table:
        if "source" in b.column_names:
            return b
        ids = b["doc_id"].to_numpy(zero_copy_only=False) % mod
        return b.append_column(
            "source", pa.array([f"src{i}" for i in ids], pa.string())
        )

    return ds.map_batches(add, batch_format="pyarrow")


def run_hygiene(docs_ds, *, bench_mod: int = 1000, bench_rem: int = 7,
                capacity: int = 512, n_shards: int = 8,
                mix_rate=None, out_root: str | None = None) -> dict:
    """Run the full hygiene chain over a (doc_id, text[, source]) Dataset."""
    from ..stages.decontam import collect_benchmark_hashes, decontam_overlap_dataset
    from ..stages.dedup import exact_dedup_dataset
    from ..stages.packing import sequence_pack_dataset
    from ..stages.pii import redact_batch
    from ..stages.quality import repetition_stats_batch
    from ..stages.sampling import weighted_mix_dataset

    counts: dict[str, int] = {}
    counts["input"] = docs_ds.count()

    # 1. quality + PII fused in one map (one tokenization-adjacent pass;
    #    emits the redacted text for every KEPT doc)
    def quality_and_redact(b: pa.Table) -> pa.Table:
        stats = repetition_stats_batch(b)
        kept = stats.filter(stats["keep_doc"])
        if kept.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "text": pa.array([], pa.string())}
            )
        keep_ids = kept["doc_id"].to_numpy(zero_copy_only=False)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(np.isin(ids, keep_ids)))
        red = redact_batch(sub)
        return pa.table({"doc_id": sub["doc_id"], "text": red["clean_text"]})

    clean = docs_ds.map_batches(
        quality_and_redact, batch_format="pyarrow", batch_size=128
    ).materialize()
    counts["after_quality_pii"] = clean.count()

    # 2. exact dedup (min-doc_id keeper per content fingerprint)
    groups = exact_dedup_dataset(clean).materialize()
    counts["after_exact_dedup"] = groups.count()

    def keep_survivors(b: pa.Table, id_ref) -> pa.Table:
        keep = ray.get(id_ref)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if keep.size == 0:
            return b.slice(0, 0)
        pos = np.searchsorted(keep, ids)
        pos[pos == keep.size] = 0
        return b.filter(pa.array(keep[pos] == ids))

    surv_arr = np.sort(
        np.array(
            [r["keeper"] for r in groups.select_columns(["keeper"]).take_all()],
            dtype=np.int64,
        )
    )
    # survivor-id broadcast: exact dedup emits one row per DISTINCT content
    # fingerprint, so this is bounded by the deduped corpus size — the same
    # budget class as the decontam benchmark set. At 10^12 docs swap for a
    # Dataset.join semi-join; the broadcast keeps the demo pipeline one pass.
    surv_ref = ray.put(surv_arr)
    deduped = clean.map_batches(
        lambda b: keep_survivors(b, surv_ref), batch_format="pyarrow"
    )

    # 3. decontamination: benchmark = doc_id % bench_mod == bench_rem
    def split(b: pa.Table, want_bench: bool) -> pa.Table:
        m = (b["doc_id"].to_numpy(zero_copy_only=False) % bench_mod) == bench_rem
        return b.filter(pa.array(m if want_bench else ~m))

    bench = deduped.map_batches(
        lambda b: split(b, True), batch_format="pyarrow"
    )
    train = deduped.map_batches(
        lambda b: split(b, False), batch_format="pyarrow"
    ).materialize()
    bench_ref = ray.put(collect_benchmark_hashes(bench))
    contaminated = decontam_overlap_dataset(train, bench_ref)
    bad = np.sort(
        np.array(
            [r["doc_id"] for r in contaminated.select_columns(["doc_id"]).take_all()],
            dtype=np.int64,
        )
    )
    counts["contaminated"] = int(bad.size)
    bad_ref = ray.put(bad)

    def drop_contaminated(b: pa.Table) -> pa.Table:
        flag = ray.get(bad_ref)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if flag.size == 0:
            return b
        pos = np.searchsorted(flag, ids)
        pos[pos == flag.size] = 0
        return b.filter(pa.array(flag[pos] != ids))

    decontaminated = train.map_batches(drop_contaminated, batch_format="pyarrow")

    # 4. corpus mixing
    rate = mix_rate or (lambda s: ((int(s[3:]) % 4) + 1) / 5.0)
    mixed = weighted_mix_dataset(
        _with_source(decontaminated), rate, method="splitmix64"
    ).materialize()
    counts["after_mix"] = mixed.count()

    # 5. sequence packing over the final corpus
    packed = sequence_pack_dataset(
        mixed.select_columns(["doc_id", "text"]), capacity=capacity
    )

    if out_root:
        from ..state.dataset_sink import write_resumable

        manifest = write_resumable(packed, out_root, "doc_id", n_parts=n_shards * 4)
        counts["packed_rows"] = manifest["total_rows"]
    else:
        counts["packed_rows"] = packed.count()
    return counts
