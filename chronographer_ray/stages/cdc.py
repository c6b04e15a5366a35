"""Content-defined chunking (CDC) — gear-hash boundary detection for
blob/record dedup (the multimodal-payload sibling of the text dedup
family: chunk identity survives byte-shifts, so shared sub-blobs dedup
across blobs that exact or fixed-stride chunking would miss).

Gear CDC (Xia et al., FAST'16 FastCDC lineage): the sequential recurrence
``h = (h << 1) + G[b_i]`` makes ``h_i`` a FIXED 64-byte windowed sum
``h_i = sum_{k=0..63} G[b_{i-k}] << k (mod 2^64)`` — older bytes shift
out. That windowed form is what this module computes, which buys two
things over the textbook sequential loop:

- **whole-batch vectorization**: 64 shifted-gather adds over the batch's
  flat byte stream (zero-copy from the Arrow binary buffer), the same
  flat-stream + window-validity-mask shape as
  ``dedup.shingle_hashes_flat`` — no per-byte Python anywhere;
- **a bit-exact SQL oracle**: the 64-term sum is declarative (per-byte
  unnest x 64-offset join, HUGEINT mulmod arithmetic), unlike the
  sequential recurrence.

A cut is placed after 0-based in-blob position i iff i >= window-1 (the
window lies fully inside the blob — also a built-in min first-chunk
size) and ``h_i & (2^bits - 1) == 0``; expected chunk size ~ 2^bits.
This is PURE content-defined chunking — no min/max clamps, so the
relation is stateless and oracle-checkable; production min/max
enforcement is a sparse post-pass over candidates (see
``cdc_chunks_dataset(min_size=, max_size=)``), tested by properties.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .sampling import splitmix64

WINDOW = 64

# 256-entry gear table: splitmix64 of the byte value (1..256 — avoid the
# 0 fixed point); uint64, embedded as literals in the SQL oracle
GEAR = splitmix64(np.arange(1, 257, dtype=np.uint64))


def _flat_bytes(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 byte stream, int64 offsets) for a string/binary Arrow
    column — zero-copy views of the Arrow data buffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        col = col.cast(pa.binary())
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = np.frombuffer(col.buffers()[1], np.int32,
                            count=len(col) + 1).astype(np.int64)
    data = col.buffers()[2]
    flat = (np.frombuffer(data, np.uint8, count=int(offsets[-1]))
            if data is not None and offsets[-1] else np.zeros(0, np.uint8))
    return flat, offsets


def gear_hashes(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """h_i for every flat position (64 shifted-gather adds, uint64
    wraparound); positions whose 64-byte window crosses a blob boundary
    are INVALID — callers mask with `window_valid`."""
    h = np.zeros(flat.size, np.uint64)
    g = GEAR[flat]
    for k in range(WINDOW):
        h[k:] += g[: flat.size - k] << np.uint64(k)
    return h


def window_valid(offsets: np.ndarray) -> np.ndarray:
    """True where the 64-byte window ending at this flat position lies
    fully inside one blob (in-blob 0-based index >= WINDOW-1)."""
    lens = np.diff(offsets)
    doc_idx = np.repeat(np.arange(lens.size), lens)
    in_doc = np.arange(int(offsets[-1])) - offsets[doc_idx]
    return in_doc >= WINDOW - 1


def cdc_chunks_dataset(ds, payload_col: str = "text", id_col: str = "doc_id",
                       bits: int = 5, min_size: int | None = None,
                       max_size: int | None = None):
    """Chunk every blob → (id, chunk_idx, offset, length, chunk_md5) rows.
    Map-only; chunk_idx/offset are 0-based, md5 is of the chunk bytes.
    ``min_size``/``max_size`` (production clamps) drop candidate cuts
    closer than min_size to the previous cut and force cuts at max_size —
    a sparse sequential pass over CANDIDATES (~n/2^bits of the bytes),
    not over bytes; they change the relation, so the SQL oracle drives
    the pure (None, None) form."""
    mask = np.uint64((1 << bits) - 1)

    def chunk(b: pa.Table) -> pa.Table:
        flat, offsets = _flat_bytes(b[payload_col])
        ids = b[id_col].to_numpy(zero_copy_only=False)
        cand = np.zeros(flat.size, bool)
        if flat.size:
            h = gear_hashes(flat, offsets)
            cand = ((h & mask) == np.uint64(0)) & window_valid(offsets)
        out_id, out_ix, out_off, out_len, out_md5 = [], [], [], [], []
        raw = flat.tobytes()
        for d in range(len(ids)):
            s, e = int(offsets[d]), int(offsets[d + 1])
            cuts = (np.flatnonzero(cand[s:e]) + 1).tolist()  # cut AFTER i
            if min_size or max_size:
                kept, last = [], 0
                limit = max_size or 1 << 62
                for c in cuts + [e - s]:
                    while c - last > limit:  # force cuts at max_size
                        last += limit
                        kept.append(last)
                    if c < e - s and c - last >= (min_size or 0):
                        kept.append(c)
                        last = c
                cuts = kept
            bounds = [0] + [c for c in cuts if c < e - s] + [e - s]
            for ix in range(len(bounds) - 1):
                lo, hi = bounds[ix], bounds[ix + 1]
                if hi == lo:
                    continue
                out_id.append(ids[d])
                out_ix.append(ix)
                out_off.append(lo)
                out_len.append(hi - lo)
                out_md5.append(hashlib.md5(raw[s + lo:s + hi]).hexdigest())
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_ix, pa.int64()),
            "offset": pa.array(out_off, pa.int64()),
            "length": pa.array(out_len, pa.int64()),
            "chunk_md5": pa.array(out_md5, pa.string()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow")
