"""Multimodal media processing — REAL raster decode/resize/frame-sample
kernels over a deterministic synthetic byte format, plus the original
opaque-ref actor plumbing.

Two families:

1. **GRB1** (graft raster binary v1) — a self-describing little-endian
   raster container: ``b"GRB1" | kind u8 | width u16 | height u16 |
   channels u8 | n_frames u16 | seed u64 | n_frames*h*w*ch payload
   bytes``. Media items derive deterministically from the testdata
   ``documents`` table (one item per 3 160-char text pieces, parameters
   from splitmix64 — every step exactly expressible in DuckDB SQL, so
   the decode/resize/frame-sample OUTPUTS have bit-exact oracles). The
   decoders parse the actual bytes (header unpack → ``np.frombuffer`` →
   reshape → integer channel statistics) — real kernels, not metadata
   echoes. External-format decoders (JPEG/PNG/WAV via PIL/ffmpeg, absent
   in this container) plug in by swapping the parse step and keeping the
   same actor/batch/output shape.

2. The original opaque-ref stubs (``FakeMediaDecoder`` & co.) retained
   for the interleaved-corpus plumbing tests: payloads that are refs
   into an external blob store, features faked deterministically.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from .sampling import splitmix64

FEATURE_DIM = 8

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("feature", pa.list_(pa.float32(), FEATURE_DIM)),
    ]
)


class FakeMediaDecoder:
    """Actor-pool stage: extract media spans → deterministic fake features.

    Real decoders (PIL / torchaudio / decord) load their model ONCE here in
    ``__init__``; ``__call__`` handles one Arrow batch of interleaved docs
    and emits one row per media span. Batch size should be small when
    payloads are inline binary (see SURVEY §2 multimodal notes).
    """

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim

    def _features(self, media_ref: str) -> list[float]:
        h = zlib.crc32(media_ref.encode("utf-8"))
        rs = np.random.RandomState(h % (2**31))
        return rs.rand(self.feature_dim).astype(np.float32).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized over the flattened span struct (the
        # caption_pairs_batch pattern): one flatten, boolean mask, gather
        # — the only remaining per-item work is the feature fn itself,
        # paid once per DISTINCT media_ref via dictionary encoding (refs
        # repeat across frames/docs; a real embedder batches here too)
        spans = batch["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        kind = flat.field("kind")
        media_mask = pa.compute.not_equal(kind, "text")
        parent_idx = np.repeat(
            np.arange(batch.num_rows),
            np.diff(spans.offsets.to_numpy(zero_copy_only=False)))
        mi = np.flatnonzero(media_mask.to_numpy(zero_copy_only=False))
        doc_ids = batch["doc_id"].take(pa.array(parent_idx[mi]))
        refs = flat.field("media_ref").take(pa.array(mi))
        enc = pa.compute.dictionary_encode(refs.combine_chunks()
                                           if isinstance(refs, pa.ChunkedArray)
                                           else refs)
        per_ref = [self._features(r) for r in enc.dictionary.to_pylist()]
        idx = enc.indices.to_numpy(zero_copy_only=False)
        feats = ([per_ref[i] for i in idx] if per_ref else [])
        return pa.Table.from_arrays(
            [doc_ids, refs, kind.take(pa.array(mi)),
             pa.array(feats, MEDIA_SCHEMA.field("feature").type)],
            schema=MEDIA_SCHEMA,
        )


class StrictMediaDecoder(FakeMediaDecoder):
    """The real-decoder integration point: fails loudly instead of faking."""

    def _features(self, media_ref: str) -> list[float]:
        raise NotImplementedError(
            "media decoding requires an image/audio library not present in "
            "this environment; plug a real decoder in here"
        )


def media_features_dataset(docs_ds, concurrency: int = 2, batch_size: int = 64):
    """Interleaved docs Dataset → media feature Dataset (actor pool)."""
    return docs_ds.map_batches(
        FakeMediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


FRAME_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),
        ("frame_ref", pa.string()),
    ]
)

RESIZE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("resized_ref", pa.string()),
    ]
)


class FakeFrameSampler:
    """Actor-pool stage: sample ``n_frames`` frames per VIDEO span.

    A real sampler (decord/ffmpeg) opens the container once per actor and
    seeks; this stub derives deterministic frame refs from the media_ref so
    the plumbing — one output row per (video, frame), small batches for
    large payloads — is real and tested. Swap ``_frames`` for a decoder.
    """

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def _frames(self, media_ref: str) -> list[str]:
        h = zlib.crc32(media_ref.encode("utf-8"))
        # deterministic pseudo-timestamps, sorted, unique per ref
        ts = sorted((h >> (3 * i)) % 997 for i in range(self.n_frames))
        return [f"{media_ref}#t={t}" for t in ts]

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, refs, idxs, frefs = [], [], [], []
        for doc_id, spans in zip(
            batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
        ):
            for span in spans or []:
                if span["kind"] != "video":
                    continue
                for i, fr in enumerate(self._frames(span["media_ref"])):
                    doc_ids.append(doc_id)
                    refs.append(span["media_ref"])
                    idxs.append(i)
                    frefs.append(fr)
        return pa.Table.from_pydict(
            {"doc_id": doc_ids, "media_ref": refs, "frame_idx": idxs,
             "frame_ref": frefs},
            schema=FRAME_SCHEMA,
        )


class FakeImageResizer:
    """Actor-pool stage: resize IMAGE spans to a target box.

    Stub geometry: source dimensions derived deterministically from the
    ref; output = aspect-preserving fit into ``(target, target)``. A real
    resizer (PIL) holds nothing heavier, but decode buffers argue for
    ``batch_size`` ≤ 64 on inline-binary payloads.
    """

    def __init__(self, target: int = 256):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, refs, ws, hs, outs = [], [], [], [], []
        for doc_id, spans in zip(
            batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
        ):
            for span in spans or []:
                if span["kind"] != "image":
                    continue
                h = zlib.crc32(span["media_ref"].encode("utf-8"))
                w0, h0 = 320 + h % 1600, 240 + (h >> 11) % 1200
                # longest edge lands EXACTLY on target (float-scale then
                # truncate can undershoot by a pixel)
                if w0 >= h0:
                    w1, h1 = self.target, max(1, round(h0 * self.target / w0))
                else:
                    w1, h1 = max(1, round(w0 * self.target / h0)), self.target
                doc_ids.append(doc_id)
                refs.append(span["media_ref"])
                ws.append(w1)
                hs.append(h1)
                outs.append(f"{span['media_ref']}?resize={self.target}")
        return pa.Table.from_pydict(
            {"doc_id": doc_ids, "media_ref": refs, "width": ws, "height": hs,
             "resized_ref": outs},
            schema=RESIZE_SCHEMA,
        )


def frame_sample_dataset(docs_ds, n_frames: int = 4, concurrency: int = 2,
                         batch_size: int = 64):
    return docs_ds.map_batches(
        FakeFrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


def resize_dataset(docs_ds, target: int = 256, concurrency: int = 2,
                   batch_size: int = 64):
    return docs_ds.map_batches(
        FakeImageResizer,
        fn_constructor_kwargs={"target": target},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


# --------------------------------------------------------------- GRB1
# Deterministic raster container + REAL decode kernels. Every derived
# quantity below (item inventory, dimensions, pixel values, resize index
# math) is integer arithmetic reproducible in DuckDB SQL — see the
# media_* oracles in __ray_entry__.py.

GRB1_MAGIC = b"GRB1"
GRB1_HEADER = struct.Struct("<4sBHHBHQ")  # magic kind w h ch nf seed = 20 B
GRB1_KINDS = ("image", "audio", "video")
# pixel(f, y, x, c) = (seed + 151 f + 53 y + 17 x + 101 c) mod 256 —
# distinct odd coefficients per axis so a transposed/misreshaped decode
# changes every channel sum (the oracle would catch it)
PX_F, PX_Y, PX_X, PX_C = 151, 53, 17, 101
_CHUNK_CHARS = 160   # matches interleave's text chunking
_ITEM_KEY_MULT = 1021


def media_item_counts(n_chars: np.ndarray) -> np.ndarray:
    """Media items per doc: one per 3 text pieces of ``_CHUNK_CHARS``
    (the interleaved corpus's span cadence — interleave.py:72)."""
    n = np.maximum(n_chars.astype(np.int64), 1)
    return (n + _CHUNK_CHARS - 1) // _CHUNK_CHARS // 3


def media_item_params(doc_id: np.ndarray, k: np.ndarray) -> dict:
    """Vectorized item parameters from splitmix64(doc_id*1021 + k).

    kind = u%3 → image/audio/video; image: w,h ∈ 8..32, ch ∈ 1..3, 1
    frame; audio: 1×(64..256) samples, ch ∈ 1..2; video: image dims with
    3..6 frames. seed = u (drives pixel content)."""
    u = splitmix64((doc_id * _ITEM_KEY_MULT + k).astype(np.uint64))
    kind_ix = (u % np.uint64(3)).astype(np.int64)
    w_img = 8 + ((u >> np.uint64(8)) % np.uint64(25)).astype(np.int64)
    h_img = 8 + ((u >> np.uint64(16)) % np.uint64(25)).astype(np.int64)
    ch_img = 1 + ((u >> np.uint64(24)) % np.uint64(3)).astype(np.int64)
    w_aud = 64 + ((u >> np.uint64(8)) % np.uint64(193)).astype(np.int64)
    ch_aud = 1 + ((u >> np.uint64(24)) % np.uint64(2)).astype(np.int64)
    nf_vid = 3 + ((u >> np.uint64(32)) % np.uint64(4)).astype(np.int64)
    is_aud = kind_ix == 1
    is_vid = kind_ix == 2
    return {
        "u": u,
        "kind_ix": kind_ix,
        "width": np.where(is_aud, w_aud, w_img),
        "height": np.where(is_aud, 1, h_img),
        "channels": np.where(is_aud, ch_aud, ch_img),
        "n_frames": np.where(is_vid, nf_vid, 1),
    }


def grb1_encode(kind_ix: int, w: int, h: int, ch: int, nf: int,
                seed: int) -> bytes:
    """Build one GRB1 payload; pixel block via numpy broadcasting."""
    s0 = np.int64(seed % 256)
    px = (
        s0
        + PX_F * np.arange(nf, dtype=np.int64)[:, None, None, None]
        + PX_Y * np.arange(h, dtype=np.int64)[None, :, None, None]
        + PX_X * np.arange(w, dtype=np.int64)[None, None, :, None]
        + PX_C * np.arange(ch, dtype=np.int64)[None, None, None, :]
    ) & 0xFF
    header = GRB1_HEADER.pack(GRB1_MAGIC, kind_ix + 1, w, h, ch, nf,
                              seed & 0xFFFFFFFFFFFFFFFF)
    return header + px.astype(np.uint8).tobytes()


MEDIA_ITEM_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("media_ref", pa.string()),
    ("payload", pa.binary()),
])


def media_items_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` kernel: flat documents → GRB1 media item rows.

    Stands in for the blob-store fetch of a real pipeline: parameters are
    vectorized; the per-item payload build is the synthesis cost a real
    job pays in I/O. Downstream decoders see ONLY (doc_id, media_ref,
    payload) — all typed metadata must be re-derived from the bytes."""
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    counts = media_item_counts(
        batch["n_chars"].to_numpy(zero_copy_only=False))
    d_rep = np.repeat(doc_ids, counts)
    k = np.concatenate([np.arange(c, dtype=np.int64) for c in counts]
                       or [np.array([], np.int64)])
    p = media_item_params(d_rep, k)
    refs, payloads = [], []
    for i in range(len(d_rep)):
        kix = int(p["kind_ix"][i])
        refs.append(
            f"mem://media/{GRB1_KINDS[kix]}/doc-{int(d_rep[i]):06d}-"
            f"{int(k[i]):03d}")
        payloads.append(grb1_encode(
            kix, int(p["width"][i]), int(p["height"][i]),
            int(p["channels"][i]), int(p["n_frames"][i]), int(p["u"][i])))
    return pa.Table.from_arrays(
        [pa.array(d_rep), pa.array(refs, pa.string()),
         pa.array(payloads, pa.binary())],
        schema=MEDIA_ITEM_SCHEMA,
    )


def media_items_dataset(sf_dir: str):
    """Lazy Dataset of GRB1 media items for a testdata sf dir (pruned
    read: only doc_id + n_chars leave the parquet)."""
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).map_batches(media_items_batch, batch_format="pyarrow")


def grb1_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a GRB1 payload → (kind_ix, uint8 array (nf, h, w, ch)).

    The REAL decode: header unpack + frombuffer + reshape; raises on bad
    magic or a truncated pixel block."""
    magic, kind_code, w, h, ch, nf, _seed = GRB1_HEADER.unpack_from(payload)
    if magic != GRB1_MAGIC:
        raise ValueError(f"not a GRB1 payload: {magic!r}")
    n_px = nf * h * w * ch
    arr = np.frombuffer(payload, np.uint8, offset=GRB1_HEADER.size)
    if len(arr) < n_px:
        raise ValueError("truncated GRB1 pixel block")
    return kind_code - 1, arr[:n_px].reshape(nf, h, w, ch)


FEATURES_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("media_ref", pa.string()),
    ("kind", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("channels", pa.int32()),
    ("n_frames", pa.int32()),
    ("channel", pa.int32()),
    ("px_sum", pa.int64()),
    ("mean_milli", pa.int64()),
])


class GRB1FeatureExtractor:
    """Actor-pool stage: decode GRB1 payloads → one row per (item,
    channel) with exact integer channel statistics. Nothing per-item is
    taken from metadata — dimensions and sums come out of the bytes."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[tuple] = []
        for doc_id, ref, payload in zip(
            batch["doc_id"].to_pylist(), batch["media_ref"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            kind_ix, arr = grb1_decode(payload)
            nf, h, w, ch = arr.shape
            n_per_ch = nf * h * w
            sums = arr.sum(axis=(0, 1, 2), dtype=np.int64)
            for c in range(ch):
                s = int(sums[c])
                rows.append((doc_id, ref, GRB1_KINDS[kind_ix], w, h, ch,
                             nf, c, s, 1000 * s // n_per_ch))
        cols = list(zip(*rows)) if rows else [[] for _ in FEATURES_SCHEMA]
        return pa.Table.from_arrays(
            [pa.array(list(c), f.type)
             for c, f in zip(cols, FEATURES_SCHEMA)],
            schema=FEATURES_SCHEMA,
        )


RESIZE_GRB_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("media_ref", pa.string()),
    ("out_w", pa.int32()),
    ("out_h", pa.int32()),
    ("channel", pa.int32()),
    ("px_sum", pa.int64()),
])


class GRB1Resizer:
    """Actor-pool stage: nearest-neighbor aspect-preserving resize of
    IMAGE payloads into a ``target``×``target`` box; emits the resized
    raster's exact per-channel sums (the oracle-checkable witness that
    the index math is right). Short-edge rounding is integer
    ((short*target + long//2) // long) — identical on the SQL side,
    unlike float round()."""

    def __init__(self, target: int = 16):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        rows: list[tuple] = []
        for doc_id, ref, payload in zip(
            batch["doc_id"].to_pylist(), batch["media_ref"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            kind_ix, arr = grb1_decode(payload)
            if GRB1_KINDS[kind_ix] != "image":
                continue
            _, h0, w0, ch = arr.shape
            if w0 >= h0:
                w1, h1 = t, max(1, (h0 * t + w0 // 2) // w0)
            else:
                w1, h1 = max(1, (w0 * t + h0 // 2) // h0), t
            sx = np.arange(w1, dtype=np.int64) * w0 // w1
            sy = np.arange(h1, dtype=np.int64) * h0 // h1
            resized = arr[0][np.ix_(sy, sx)]     # (h1, w1, ch)
            sums = resized.sum(axis=(0, 1), dtype=np.int64)
            for c in range(ch):
                rows.append((doc_id, ref, w1, h1, c, int(sums[c])))
        cols = list(zip(*rows)) if rows else [[] for _ in RESIZE_GRB_SCHEMA]
        return pa.Table.from_arrays(
            [pa.array(list(c), f.type)
             for c, f in zip(cols, RESIZE_GRB_SCHEMA)],
            schema=RESIZE_GRB_SCHEMA,
        )


FRAMES_GRB_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("media_ref", pa.string()),
    ("frame_idx", pa.int32()),
    ("channel", pa.int32()),
    ("px_sum", pa.int64()),
])


class GRB1FrameSampler:
    """Actor-pool stage: sample ``n_sample`` evenly-spaced frames from
    VIDEO payloads (frame i → index (i*n_frames)//n_sample; strictly
    increasing for n_frames ≥ n_sample) and emit each sampled frame's
    exact per-channel sums."""

    def __init__(self, n_sample: int = 3):
        self.n_sample = n_sample

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[tuple] = []
        for doc_id, ref, payload in zip(
            batch["doc_id"].to_pylist(), batch["media_ref"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            kind_ix, arr = grb1_decode(payload)
            if GRB1_KINDS[kind_ix] != "video":
                continue
            nf, h, w, ch = arr.shape
            for i in range(min(self.n_sample, nf)):
                fidx = i * nf // self.n_sample
                sums = arr[fidx].sum(axis=(0, 1), dtype=np.int64)
                for c in range(ch):
                    rows.append((doc_id, ref, fidx, c, int(sums[c])))
        cols = list(zip(*rows)) if rows else [[] for _ in FRAMES_GRB_SCHEMA]
        return pa.Table.from_arrays(
            [pa.array(list(c), f.type)
             for c, f in zip(cols, FRAMES_GRB_SCHEMA)],
            schema=FRAMES_GRB_SCHEMA,
        )


def _decode_pool(items_ds, cls, batch_size: int = 64, concurrency: int = 4,
                 **ctor):
    """Shared actor-pool shape for the GRB1 decoders: small batches
    (binary rows are the payload; a batch × concurrency must fit a
    worker heap at real media sizes), state in ``__init__``. The pool
    autoscales (1, concurrency) so a cluster with ≤ concurrency CPUs
    still leaves a slot for the upstream read tasks — a fixed-size pool
    equal to the CPU count livelocks the streaming executor (producer
    starvation, observed on a 4-CPU test cluster)."""
    return items_ds.map_batches(
        cls, fn_constructor_kwargs=ctor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=(1, concurrency), num_cpus=1,
    )


def media_features_grb(sf_dir: str, **kw):
    return _decode_pool(media_items_dataset(sf_dir), GRB1FeatureExtractor,
                        **kw)


def media_resize_grb(sf_dir: str, target: int = 16, **kw):
    return _decode_pool(media_items_dataset(sf_dir), GRB1Resizer,
                        target=target, **kw)


def media_frames_grb(sf_dir: str, n_sample: int = 3, **kw):
    return _decode_pool(media_items_dataset(sf_dir), GRB1FrameSampler,
                        n_sample=n_sample, **kw)


AUDIO_GRB_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("media_ref", pa.string()),
    ("channel", pa.int32()),
    ("n_samples", pa.int32()),
    ("sum_sq", pa.int64()),
    ("peak", pa.int64()),
    ("zero_crossings", pa.int64()),
])


class GRB1AudioAnalyzer:
    """Actor-pool stage: decode AUDIO payloads (1 × n_samples PCM-style
    uint8 rasters) → per (item, channel) real DSP statistics about the
    128 midline: signal energy (Σ (v-128)², the exact-integer RMS
    witness), peak amplitude max|v-128|, and zero-crossing count
    (adjacent sample pairs with strictly opposite sign; a sample ON the
    midline never counts — the integer-product < 0 rule both sides
    share). The audio analogue of `GRB1FeatureExtractor`: every number
    comes out of the decoded bytes, nothing from metadata."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[tuple] = []
        for doc_id, ref, payload in zip(
            batch["doc_id"].to_pylist(), batch["media_ref"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            kind_ix, arr = grb1_decode(payload)
            if GRB1_KINDS[kind_ix] != "audio":
                continue
            _, _, w, ch = arr.shape       # audio: (1, 1, n_samples, ch)
            for c in range(ch):
                a = arr[0, 0, :, c].astype(np.int64) - 128
                rows.append((
                    doc_id, ref, c, w,
                    int((a * a).sum()),
                    int(np.abs(a).max()) if w else 0,
                    int(np.count_nonzero(a[:-1] * a[1:] < 0)),
                ))
        cols = list(zip(*rows)) if rows else [[] for _ in AUDIO_GRB_SCHEMA]
        return pa.Table.from_arrays(
            [pa.array(list(c), f.type)
             for c, f in zip(cols, AUDIO_GRB_SCHEMA)],
            schema=AUDIO_GRB_SCHEMA,
        )


def media_audio_grb(sf_dir: str, **kw):
    return _decode_pool(media_items_dataset(sf_dir), GRB1AudioAnalyzer,
                        **kw)


PHASH_GRB_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("media_ref", pa.string()),
    ("phash", pa.string()),
    ("n_ones", pa.int64()),
])


class GRB1AverageHasher:
    """Actor-pool stage: perceptual average-hash (aHash) of IMAGE
    payloads → (doc_id, media_ref, phash hex, n_ones) — the classic
    near-duplicate image fingerprint (downsample to ``grid``×``grid``,
    threshold each cell against the mean, pack the bits). Near-dup
    images differ in a few bits; the hash is the bucketing key of an
    image-dedup sweep exactly as SimHash is for text.

    Every step is integer and thus SQL-reproducible: channel-0 frame-0
    nearest-neighbor downsample (the SAME index math as `GRB1Resizer`),
    mean = floor(Σcells / grid²), bit i set iff cell_i > mean, rows
    scanned top-to-bottom then left-to-right (bit index y·grid + x)."""

    def __init__(self, grid: int = 8):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        rows: list[tuple] = []
        for doc_id, ref, payload in zip(
            batch["doc_id"].to_pylist(), batch["media_ref"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            kind_ix, arr = grb1_decode(payload)
            if GRB1_KINDS[kind_ix] != "image":
                continue
            _, h0, w0, _ = arr.shape
            sy = np.arange(g, dtype=np.int64) * h0 // g
            sx = np.arange(g, dtype=np.int64) * w0 // g
            cells = arr[0][np.ix_(sy, sx)][:, :, 0].astype(np.int64)
            mean = int(cells.sum()) // (g * g)
            bits = (cells > mean).reshape(-1)
            val = 0
            for i in np.flatnonzero(bits):
                val |= 1 << int(i)
            rows.append((doc_id, ref, format(val, f"0{g * g // 4}x"),
                         int(bits.sum())))
        cols = list(zip(*rows)) if rows else [[] for _ in PHASH_GRB_SCHEMA]
        return pa.Table.from_arrays(
            [pa.array(list(c), f.type)
             for c, f in zip(cols, PHASH_GRB_SCHEMA)],
            schema=PHASH_GRB_SCHEMA,
        )


def media_phash_grb(sf_dir: str, grid: int = 8, **kw):
    return _decode_pool(media_items_dataset(sf_dir), GRB1AverageHasher,
                        grid=grid, **kw)


SCENE_GRB_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("media_ref", pa.string()),
    ("frame", pa.int32()),          # pair index: frames (frame, frame+1)
    ("delta_sum", pa.int64()),      # Σ |p(f+1) − p(f)| over h×w×ch
    ("is_cut", pa.int64()),         # mean abs delta > 128 (2Σ > 256·npix)
])


class GRB1SceneCutDetector:
    """Actor-pool stage: shot-boundary detection over VIDEO payloads by
    inter-frame absolute pixel difference (the classic pixel-delta scene
    detector, the first pass of any video dedup/sampling pipeline) —
    one row per consecutive frame pair with the exact integer delta
    energy and a mean-threshold cut flag. All arithmetic is uint8→int64
    exact, so the DuckDB oracle reproduces every row bit-for-bit."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[tuple] = []
        for doc_id, ref, payload in zip(
            batch["doc_id"].to_pylist(), batch["media_ref"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            kind_ix, arr = grb1_decode(payload)
            if GRB1_KINDS[kind_ix] != "video":
                continue
            nf, h, w, ch = arr.shape
            # per-pair int16 diff: |p(f+1)−p(f)| ≤ 255 fits int16, and
            # summing as int64 is exact — peak extra memory is ONE frame
            # in int16, not an 8× int64 copy of the whole decoded video
            deltas = np.empty(max(nf - 1, 0), np.int64)
            for f in range(nf - 1):
                d16 = arr[f + 1].astype(np.int16) - arr[f]
                deltas[f] = np.abs(d16, out=d16).sum(dtype=np.int64)
            npix = h * w * ch
            for f in range(nf - 1):
                d = int(deltas[f])
                rows.append((doc_id, ref, f, d, int(2 * d > 256 * npix)))
        cols = list(zip(*rows)) if rows else [[] for _ in SCENE_GRB_SCHEMA]
        return pa.Table.from_arrays(
            [pa.array(list(c), f.type)
             for c, f in zip(cols, SCENE_GRB_SCHEMA)],
            schema=SCENE_GRB_SCHEMA,
        )


def media_scene_cuts_grb(sf_dir: str, **kw):
    return _decode_pool(media_items_dataset(sf_dir), GRB1SceneCutDetector,
                        **kw)


def media_keyframes_grb(sf_dir: str, n_buckets: int = 16, **kw):
    """Keyframe per GRB1 video → (doc_id, media_ref, keyframe,
    delta_sum): the first frame of the strongest shot change (the later
    frame of the max-|Δ| pair; tie → earliest). Composes the scene-cut
    stage with one media_ref-bucket argmax exchange — a video's ≤ nf−1
    rows may straddle block boundaries, so the argmax cannot be
    block-local."""
    from ..functions.shuffles import bucketed_group_apply

    cuts = media_scene_cuts_grb(sf_dir, **kw)

    def argmax(t: pa.Table) -> pa.Table:
        srt = t.sort_by([("media_ref", "ascending"),
                         ("delta_sum", "descending"),
                         ("frame", "ascending")])
        refs = srt["media_ref"].to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], refs[1:] != refs[:-1]))
        srt = srt.filter(pa.array(first))
        frame = srt["frame"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": srt["doc_id"], "media_ref": srt["media_ref"],
            "keyframe": pa.array(frame + 1),
            "delta_sum": srt["delta_sum"],
        })

    return bucketed_group_apply(cuts, ["media_ref"], argmax,
                                n_buckets=n_buckets,
                                batch_format="pyarrow")


CAPTION_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("kind", pa.string()),
    ("caption", pa.string()),
    ("caption_offset", pa.int32()),
])


def caption_pairs_batch(batch: pa.Table) -> pa.Table:
    """Interleaved docs → (media span, caption) pairs: each media span is
    paired with the nearest PRECEDING text span in the same document —
    the caption-alignment pass of an image/audio-text pretraining
    pipeline (LAION-style pairing, but positional instead of alt-text).
    Fully vectorized over the flattened span struct (no per-span Python):
    a searchsorted over the text-span flat indices finds the nearest
    preceding text span, so runs of ADJACENT media spans all pair with
    the same caption; a media span with no in-doc preceding text span
    raises (loud diagnostic, never a silent mispair)."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    kind = np.asarray(flat.field("kind").to_pylist(), dtype=object)
    text = np.asarray(flat.field("text").to_pylist(), dtype=object)
    ref = flat.field("media_ref").to_numpy(zero_copy_only=False)
    off = flat.field("offset").to_numpy(zero_copy_only=False)
    parent_idx = np.repeat(
        np.arange(batch.num_rows),
        np.diff(spans.offsets.to_numpy(zero_copy_only=False)))
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    is_media = kind != "text"
    mi = np.flatnonzero(is_media)
    if len(mi) == 0:
        return pa.table({f.name: pa.array([], f.type)
                         for f in CAPTION_SCHEMA})
    # nearest PRECEDING text span: searchsorted over the text-span flat
    # indices (spans of one doc are contiguous in the flat stream, so the
    # nearest preceding text span globally IS the nearest in-doc one
    # whenever any exists in-doc — adjacent media spans pair correctly)
    text_idx = np.flatnonzero(~is_media)
    pos = np.searchsorted(text_idx, mi) - 1
    if (pos < 0).any():
        raise ValueError("media span without a preceding same-doc text span")
    prev = text_idx[pos]
    # a media span whose doc has NO preceding text span would gather a
    # previous doc's text — keep the loud diagnostic over mispairing
    if (parent_idx[prev] != parent_idx[mi]).any():
        raise ValueError("media span without a preceding same-doc text span")
    return pa.table({
        "doc_id": pa.array(doc_ids[parent_idx[mi]], pa.string()),
        "media_ref": pa.array(ref[mi], pa.string()),
        "kind": pa.array(kind[mi].tolist(), pa.string()),
        "caption": pa.array(text[prev].tolist(), pa.string()),
        "caption_offset": pa.array(off[prev].astype(np.int32),
                                   pa.int32()),
    })


def caption_pairs_dataset(docs_ds):
    """Map-only caption alignment over the interleaved corpus."""
    return docs_ds.map_batches(caption_pairs_batch, batch_format="pyarrow")
