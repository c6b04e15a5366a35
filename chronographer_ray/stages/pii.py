"""PII redaction: scrub emails / phone numbers / IPv4 addresses from a text
column, fully vectorized.

Training-data hygiene pass (C4/Dolma-style PII scrubbing). Pure
``map_batches`` — no shuffle, no state: the regexes run through Arrow's
RE2 kernels (`pc.replace_substring_regex` / `pc.count_substring_regex`),
the same engine DuckDB uses, so the SQL oracle is bit-identical by
construction. Patterns are applied IN ORDER on the progressively-redacted
text (an email is consumed before the phone pattern can see its digits),
and ``n_redactions`` counts matches per pattern at its turn.

No reference-file counterpart: the reference (muhai-project/chronographer)
has no corpus-hygiene stage; this extends the engine per the LLM-pipeline
charter (SURVEY §2.9).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — applied in order. RE2-safe: no
# backrefs, no lookaround, so Arrow and DuckDB agree exactly.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+\d{1,3}[ -]\d{3}[ -]\d{3,5}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_batch(batch: pa.Table, text_col: str = "text",
                 out_col: str = "clean_text") -> pa.Table:
    """(doc_id, clean_text, n_redactions): sequential pattern scrub with a
    per-doc total match count."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # nulls (and the null-typed column of an empty batch) read as ""
    col = pc.fill_null(pc.cast(col, pa.string()), "")
    total = np.zeros(len(batch), dtype=np.int64)
    for _, pat, repl in PII_PATTERNS:
        total += pc.count_substring_regex(col, pat).to_numpy(zero_copy_only=False)
        col = pc.replace_substring_regex(col, pat, repl)
    out = batch.select([c for c in ("doc_id",) if c in batch.column_names])
    return out.append_column(out_col, col).append_column(
        "n_redactions", pa.array(total, pa.int64())
    )


def redact_dataset(ds, text_col: str = "text"):
    """Map-only redaction over a documents Dataset."""
    return ds.map_batches(
        lambda b: redact_batch(b, text_col), batch_format="pyarrow"
    )
