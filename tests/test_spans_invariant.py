"""The graft's per-row invariant: span sequence (kind, text, media_ref,
order) passes through every document stage byte-identical."""
import pyarrow as pa

from chronographer_ray.data.synth import synth_documents
from chronographer_ray.stages.linker import MentionLinker, mentions_to_edges
from chronographer_ray.data.synth import entity_label_map


def test_linker_preserves_spans_exactly():
    docs = synth_documents(n_docs=200)
    linker = MentionLinker(entity_label_map())
    out = linker(docs)
    assert out["doc_id"].to_pylist() == docs["doc_id"].to_pylist()
    assert out["spans"].to_pylist() == docs["spans"].to_pylist()
    # and the arrow buffers share MEMORY (zero-copy passthrough)
    a = out.column("spans").chunks[0].buffers()[1]
    b = docs.column("spans").chunks[0].buffers()[1]
    assert a.address == b.address


def test_linker_finds_seeded_mentions():
    docs = synth_documents(n_docs=200, hub_every=10)
    out = MentionLinker(entity_label_map())(docs)
    edges = mentions_to_edges(out)
    assert edges.num_rows > 0
    ents = set(edges["entity"].to_pylist())
    assert "http://ex.org/resource/Great_Revolution" in ents


def test_mention_offsets_point_at_surface():
    docs = synth_documents(n_docs=50)
    out = MentionLinker(entity_label_map())(docs)
    for spans, mentions in zip(out["spans"].to_pylist(), out["mentions"].to_pylist()):
        for m in mentions:
            span = spans[m["span_idx"]]
            assert span["kind"] == "text"
            assert span["text"][m["start"] : m["start"] + len(m["surface"])] == m["surface"]


def test_interleave_deterministic_and_monotonic_offsets(ray_session):
    from chronographer_ray.data.interleave import interleaved_table

    a = interleaved_table("/root/testdata/sf0.001")
    b = interleaved_table("/root/testdata/sf0.001")
    assert a.equals(b)
    for spans in a["spans"].to_pylist()[:100]:
        offsets = [s["offset"] for s in spans]
        assert offsets == sorted(offsets)
        for s in spans:
            assert (s["kind"] == "text") == (s["media_ref"] == "")


def test_media_decoder_preserves_nothing_but_extracts_media(ray_session):
    from chronographer_ray.stages.multimodal import FakeMediaDecoder

    docs = synth_documents(n_docs=100)
    feats = FakeMediaDecoder()(docs)
    n_media = sum(
        1 for spans in docs["spans"].to_pylist() for s in spans if s["kind"] != "text"
    )
    assert feats.num_rows == n_media
    assert all(len(f) == 8 for f in feats["feature"].to_pylist())
    # determinism
    feats2 = FakeMediaDecoder()(docs)
    assert feats.equals(feats2)


def test_strict_decoder_raises():
    import pytest

    from chronographer_ray.stages.multimodal import StrictMediaDecoder

    docs = synth_documents(n_docs=5)
    with pytest.raises(NotImplementedError):
        StrictMediaDecoder()(docs)


def test_frame_sampler_and_resizer_plumbing(ray_session):
    """Multimodal actor stages: one row per (video, frame) / per image,
    deterministic refs, typed schemas; aspect preserved by the resizer."""
    from chronographer_ray.data.interleave import interleaved_dataset
    from chronographer_ray.stages.multimodal import (
        frame_sample_dataset,
        resize_dataset,
    )

    docs = interleaved_dataset("/root/testdata/sf0.001")
    frames = frame_sample_dataset(docs, n_frames=3).to_pandas()
    assert set(frames.columns) == {"doc_id", "media_ref", "frame_idx", "frame_ref"}
    if len(frames):
        per = frames.groupby("media_ref")["frame_idx"].count()
        assert (per == 3).all()
        assert frames["frame_ref"].str.contains("#t=").all()

    sizes = resize_dataset(docs, target=128).to_pandas()
    if len(sizes):
        assert ((sizes["width"] <= 128) & (sizes["height"] <= 128)).all()
        assert ((sizes["width"] == 128) | (sizes["height"] == 128)).all()
