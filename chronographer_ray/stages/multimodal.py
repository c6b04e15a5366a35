"""Multimodal span processing — decode / feature-extract plumbing.

Media payloads are opaque refs/binary columns with typed metadata; the
decode step itself is STUBBED (no image/audio libraries in this container):
``FakeMediaDecoder`` produces deterministic crc-derived features so the
Ray-side plumbing — actor-pool signature, batch sizing for large binary
rows, output schema — is real and tested, while ``StrictMediaDecoder``
raises ``NotImplementedError`` to mark the integration point for a real
decoder (swap the class, keep the pipeline).
"""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

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
        doc_ids, refs, kinds, feats = [], [], [], []
        for doc_id, spans in zip(
            batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
        ):
            for span in spans or []:
                if span["kind"] == "text":
                    continue
                doc_ids.append(doc_id)
                refs.append(span["media_ref"])
                kinds.append(span["kind"])
                feats.append(self._features(span["media_ref"]))
        return pa.Table.from_pydict(
            {"doc_id": doc_ids, "media_ref": refs, "kind": kinds, "feature": feats},
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
