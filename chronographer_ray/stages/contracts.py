"""Record-level data contracts: rule checks over an event stream with a
violation bitmask per failing record (the validate / dead-letter-routing
stage every production ingest pipeline runs before analytics).

Map-only, zero shuffle: each rule is one vectorized Arrow/numpy
predicate; a record's violations OR into an int64 bitmask so ONE pass
evaluates the whole rule set and the output names exactly which rules
fired (bit i set = rule i violated). Only violating records are emitted
— at 100 TB the clean stream passes through untouched and the
dead-letter side output stays violation-bounded.

No reference counterpart (LLM-pipeline extension operator).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# rule bits (documented order is the contract):
#   bit 0: value is null or negative
#   bit 1: ts outside [2024-01-01, 2025-01-01)
#   bit 2: event_type not in the known vocabulary
#   bit 3: props is not a JSON object ('{...}')
KNOWN_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
TS_LO = np.datetime64("2024-01-01")
TS_HI = np.datetime64("2025-01-01")


def validate_events_batch(batch: pa.Table) -> pa.Table:
    """(event_id, violations, n_violations) for records failing ≥1 rule."""
    n = batch.num_rows
    mask = np.zeros(n, np.int64)

    value = batch["value"]
    bad_value = pc.or_kleene(
        pc.is_null(value), pc.less(value, 0.0)
    )
    mask |= pc.fill_null(bad_value, True).to_numpy(
        zero_copy_only=False).astype(np.int64) << 0

    ts = batch["ts"].to_numpy(zero_copy_only=False)
    mask |= ((ts < TS_LO) | (ts >= TS_HI)).astype(np.int64) << 1

    known = pa.array(sorted(KNOWN_EVENT_TYPES), pa.string())
    bad_type = pc.invert(pc.is_in(batch["event_type"], value_set=known))
    mask |= pc.fill_null(bad_type, True).to_numpy(
        zero_copy_only=False).astype(np.int64) << 2

    props = pc.fill_null(batch["props"], "")
    ok_props = pc.match_substring_regex(props, r"^\{.*\}$")
    mask |= pc.invert(ok_props).to_numpy(
        zero_copy_only=False).astype(np.int64) << 3

    keep = mask != 0
    nv = np.zeros(n, np.int64)
    for b in range(4):
        nv += (mask >> b) & 1
    idx = pa.array(np.flatnonzero(keep))
    return pa.table({
        "event_id": pc.take(batch["event_id"], idx),
        "violations": pa.array(mask[keep]),
        "n_violations": pa.array(nv[keep]),
    })


def validate_events_dataset(ds):
    """`validate_events_batch` over the stream — the dead-letter side
    output of an ingest contract check."""
    return ds.map_batches(validate_events_batch, batch_format="pyarrow")
