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
