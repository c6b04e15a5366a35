"""GRB1 real-media kernels: byte-level decode, resize index math, frame
sampling — verified against brute-force per-pixel references and the
interleaved corpus's media-span cadence."""
import numpy as np
import pyarrow as pa
import pytest

from chronographer_ray.stages.multimodal import (
    GRB1_HEADER,
    GRB1_KINDS,
    PX_C,
    PX_F,
    PX_X,
    PX_Y,
    GRB1FeatureExtractor,
    GRB1FrameSampler,
    GRB1Resizer,
    grb1_decode,
    grb1_encode,
    media_item_counts,
    media_item_params,
    media_items_batch,
)


def _ref_pixel(s0, f, y, x, c):
    return (s0 + PX_F * f + PX_Y * y + PX_X * x + PX_C * c) % 256


def test_encode_decode_roundtrip():
    for kind_ix, w, h, ch, nf, seed in [
        (0, 8, 12, 3, 1, 12345),
        (1, 200, 1, 2, 1, 2**63 + 17),
        (2, 32, 32, 3, 6, 999999999999),
    ]:
        payload = grb1_encode(kind_ix, w, h, ch, nf, seed)
        assert len(payload) == GRB1_HEADER.size + nf * h * w * ch
        got_kind, arr = grb1_decode(payload)
        assert got_kind == kind_ix
        assert arr.shape == (nf, h, w, ch)
        s0 = seed % 256
        # brute-force per-pixel reference
        for f in (0, nf - 1):
            for y in (0, h - 1):
                for x in (0, w // 2, w - 1):
                    for c in range(ch):
                        assert arr[f, y, x, c] == _ref_pixel(s0, f, y, x, c)


def test_decode_rejects_bad_magic_and_truncation():
    payload = grb1_encode(0, 8, 8, 1, 1, 7)
    with pytest.raises(ValueError, match="not a GRB1"):
        grb1_decode(b"XXXX" + payload[4:])
    with pytest.raises(ValueError, match="truncated"):
        grb1_decode(payload[:-3])


def test_item_counts_match_interleave_media_cadence():
    # the GRB1 inventory must have the SAME cardinality as the
    # interleaved corpus's media spans (one per 3 text pieces)
    from chronographer_ray.data.interleave import interleave_batch

    texts = ["x" * n for n in (0, 1, 159, 160, 480, 481, 1600, 5000)]
    flat = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    docs = interleave_batch(flat)
    want = [
        sum(1 for s in spans if s["kind"] != "text")
        for spans in docs["spans"].to_pylist()
    ]
    got = media_item_counts(
        np.array([len(t) for t in texts], np.int64)).tolist()
    assert got == want


def test_features_match_brute_force():
    items = media_items_batch(pa.table({
        "doc_id": pa.array([3, 17, 250000], pa.int64()),
        "n_chars": pa.array([1000, 200, 2000], pa.int64()),
    }))
    feats = GRB1FeatureExtractor()(items)
    # every (item, channel) row's sum equals the brute-force raster sum
    by_ref = {}
    for i in range(len(items)):
        _, arr = grb1_decode(items["payload"][i].as_py())
        by_ref[items["media_ref"][i].as_py()] = arr
    assert feats.num_rows == sum(a.shape[3] for a in by_ref.values())
    for row in feats.to_pylist():
        arr = by_ref[row["media_ref"]]
        nf, h, w, ch = arr.shape
        assert (row["n_frames"], row["height"], row["width"],
                row["channels"]) == (nf, h, w, ch)
        want = int(arr[:, :, :, row["channel"]].sum(dtype=np.int64))
        assert row["px_sum"] == want
        assert row["mean_milli"] == 1000 * want // (nf * h * w)
    # decoded kinds agree with the refs' kind segment
    for ref, arr in by_ref.items():
        assert ref.split("/")[3] in GRB1_KINDS


def test_resize_matches_brute_force():
    items = media_items_batch(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "n_chars": pa.array(np.full(40, 1500, np.int64)),
    }))
    out = GRB1Resizer(target=16)(items)
    assert out.num_rows > 0
    by_ref = {items["media_ref"][i].as_py(): items["payload"][i].as_py()
              for i in range(len(items))}
    for row in out.to_pylist():
        _, arr = grb1_decode(by_ref[row["media_ref"]])
        _, h0, w0, ch = arr.shape
        w1, h1 = row["out_w"], row["out_h"]
        assert max(w1, h1) == 16 and min(w1, h1) >= 1
        # aspect: long edge lands exactly on target, short edge by
        # integer half-up rounding
        if w0 >= h0:
            assert (w1, h1) == (16, max(1, (h0 * 16 + w0 // 2) // w0))
        else:
            assert (w1, h1) == (max(1, (w0 * 16 + h0 // 2) // h0), 16)
        want = 0
        for y2 in range(h1):
            for x2 in range(w1):
                want += int(arr[0, y2 * h0 // h1, x2 * w0 // w1,
                                row["channel"]])
        assert row["px_sum"] == want


def test_frames_match_brute_force():
    items = media_items_batch(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "n_chars": pa.array(np.full(40, 1500, np.int64)),
    }))
    out = GRB1FrameSampler(n_sample=3)(items)
    assert out.num_rows > 0
    by_ref = {items["media_ref"][i].as_py(): items["payload"][i].as_py()
              for i in range(len(items))}
    seen_videos = set()
    for row in out.to_pylist():
        _, arr = grb1_decode(by_ref[row["media_ref"]])
        nf = arr.shape[0]
        assert nf >= 3
        assert row["frame_idx"] in {i * nf // 3 for i in range(3)}
        want = int(arr[row["frame_idx"], :, :, row["channel"]]
                   .sum(dtype=np.int64))
        assert row["px_sum"] == want
        seen_videos.add(row["media_ref"])
    # 3 sampled frames per video, each with `ch` channel rows
    per_video = {}
    for row in out.to_pylist():
        per_video.setdefault(row["media_ref"], set()).add(row["frame_idx"])
    assert all(len(v) == 3 for v in per_video.values())


def test_all_kinds_present_at_smallest_sf():
    import pyarrow.parquet as pq

    flat = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "n_chars"])
    items = media_items_batch(flat)
    kinds = {r.split("/")[3] for r in items["media_ref"].to_pylist()}
    assert kinds == {"image", "audio", "video"}


def test_audio_analyzer_matches_bruteforce():
    """Energy/peak/zero-crossings from the decoded bytes equal a direct
    per-sample recomputation from the pixel formula; a flat signal (all
    samples one side of 128) has zero crossings."""
    import numpy as np
    import pyarrow as pa

    from chronographer_ray.stages.multimodal import (
        GRB1AudioAnalyzer,
        grb1_encode,
    )

    # kind_ix 1 = audio: (1, 1, w, ch); seed chosen so v-128 changes sign
    payload = grb1_encode(1, 12, 1, 2, 1, seed=120)
    t = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "media_ref": ["mem://media/audio/doc-000007-000"],
        "payload": pa.array([payload], pa.binary()),
    })
    out = GRB1AudioAnalyzer()(t).to_pandas().set_index("channel")
    for c in (0, 1):
        v = (120 + 17 * np.arange(12) + 101 * c) % 256 - 128
        assert out.loc[c, "sum_sq"] == int((v * v).sum())
        assert out.loc[c, "peak"] == int(np.abs(v).max())
        assert out.loc[c, "zero_crossings"] == int(
            np.count_nonzero(v[:-1] * v[1:] < 0))
        assert out.loc[c, "n_samples"] == 12

    # constant-positive signal: v = 200-128 = 72 for every sample (w*17
    # and c*101 wrap mod 256 — pick w small so no wrap): zc must be 0
    p2 = grb1_encode(1, 4, 1, 1, 1, seed=200)
    t2 = pa.table({
        "doc_id": pa.array([8], pa.int64()),
        "media_ref": ["mem://media/audio/doc-000008-000"],
        "payload": pa.array([p2], pa.binary()),
    })
    o2 = GRB1AudioAnalyzer()(t2).to_pandas()
    assert int(o2["zero_crossings"].iloc[0]) == 0


def test_audio_analyzer_skips_non_audio():
    import pyarrow as pa

    from chronographer_ray.stages.multimodal import (
        GRB1AudioAnalyzer,
        grb1_encode,
    )

    t = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "media_ref": ["mem://media/image/doc-000001-000"],
        "payload": pa.array([grb1_encode(0, 8, 8, 3, 1, seed=5)],
                            pa.binary()),
    })
    out = GRB1AudioAnalyzer()(t)
    assert out.num_rows == 0
    assert out.schema.names == [
        "doc_id", "media_ref", "channel", "n_samples", "sum_sq", "peak",
        "zero_crossings"]


def test_average_hash_matches_bruteforce_and_flags_near_dups():
    """aHash from decoded bytes equals direct recomputation; an image
    differing by a constant brightness offset (same seed → same
    threshold structure) hashes identically, a different-seed image
    does not."""
    import numpy as np
    import pyarrow as pa

    from chronographer_ray.stages.multimodal import (
        GRB1AverageHasher,
        grb1_decode,
        grb1_encode,
    )

    def one(payload):
        t = pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "media_ref": ["mem://media/image/doc-000001-000"],
            "payload": pa.array([payload], pa.binary()),
        })
        return GRB1AverageHasher()(t).to_pandas().iloc[0]

    p = grb1_encode(0, 20, 12, 3, 1, seed=42)
    row = one(p)
    _, arr = grb1_decode(p)
    sy = np.arange(8) * 12 // 8
    sx = np.arange(8) * 20 // 8
    cells = arr[0][np.ix_(sy, sx)][:, :, 0].astype(np.int64)
    mean = int(cells.sum()) // 64
    bits = (cells > mean).reshape(-1)
    val = sum(1 << int(i) for i in np.flatnonzero(bits))
    assert row["phash"] == format(val, "016x")
    assert row["n_ones"] == int(bits.sum())
    # same dims, shifted seed WITHOUT mod-256 wrap in the sampled cells:
    # thresholding is shift-invariant → identical hash (the near-dup
    # property aHash exists for)
    assert one(grb1_encode(0, 20, 12, 3, 1, seed=43))["phash"] in (
        row["phash"],)
    # a different geometry changes the sampled lattice → different hash
    assert one(grb1_encode(0, 31, 9, 3, 1, seed=42))["phash"] != row["phash"]


def test_scene_cut_matches_bruteforce(ray_session):
    """Per frame pair: delta_sum = Σ|Δ| over the decoded rasters; one row
    per consecutive pair per VIDEO; images/audio excluded. Kernel applied
    directly to the items table (house style); the pooled wrapper is
    covered by the driver query + the autoscaling-pool probe below."""
    import numpy as np

    from chronographer_ray.stages.multimodal import (
        GRB1_KINDS,
        GRB1SceneCutDetector,
        grb1_decode,
        media_items_dataset,
    )

    items_tbl = None
    import pyarrow as pa

    parts = [b for b in media_items_dataset("/root/testdata/sf0.001")
             .iter_batches(batch_size=None, batch_format="pyarrow")]
    items_tbl = pa.concat_tables(parts)
    out = GRB1SceneCutDetector()(items_tbl).to_pandas()
    seen = 0
    by_ref = {r: g.sort_values("frame")
              for r, g in out.groupby("media_ref")}
    for doc_id, ref, payload in zip(items_tbl["doc_id"].to_pylist(),
                                    items_tbl["media_ref"].to_pylist(),
                                    items_tbl["payload"].to_pylist()):
        kind_ix, arr = grb1_decode(payload)
        if GRB1_KINDS[kind_ix] != "video":
            assert ref not in by_ref
            continue
        nf, h, w, ch = arr.shape
        sub = by_ref[ref]
        assert sub["frame"].tolist() == list(range(nf - 1))
        a = arr.astype(np.int64)
        for f in range(nf - 1):
            d = int(np.abs(a[f + 1] - a[f]).sum())
            row = sub[sub["frame"] == f].iloc[0]
            assert row["delta_sum"] == d
            assert row["is_cut"] == int(2 * d > 256 * h * w * ch)
        seen += 1
    assert seen > 0
    assert out["is_cut"].isin([0, 1]).all()


def test_keyframe_is_argmax_of_scene_cuts(ray_session):
    """keyframe = (argmax-delta frame) + 1 per video; ties take the
    earliest pair; exactly one row per video."""
    from chronographer_ray.stages.multimodal import (
        media_keyframes_grb,
        media_scene_cuts_grb,
    )

    sf = "/root/testdata/sf0.001"
    kf = media_keyframes_grb(sf).to_pandas().set_index("media_ref")
    cuts = media_scene_cuts_grb(sf).to_pandas()
    assert len(kf) == cuts["media_ref"].nunique()
    for ref, g in cuts.groupby("media_ref"):
        g = g.sort_values(["delta_sum", "frame"],
                          ascending=[False, True])
        assert kf.loc[ref, "keyframe"] == int(g.iloc[0]["frame"]) + 1
        assert kf.loc[ref, "delta_sum"] == int(g.iloc[0]["delta_sum"])


def test_caption_pairs_invariant_and_bruteforce(ray_session):
    """Every media span pairs with the text span immediately before it;
    one row per media span; captions/offsets exact."""
    from chronographer_ray.data.interleave import interleaved_dataset
    from chronographer_ray.stages.multimodal import caption_pairs_dataset

    sf = "/root/testdata/sf0.001"
    docs = interleaved_dataset(sf).to_pandas()
    out = caption_pairs_dataset(interleaved_dataset(sf)).to_pandas()

    expect = []
    for _, row in docs.iterrows():
        spans = list(row["spans"])
        for i, s in enumerate(spans):
            if s["kind"] == "text":
                continue
            prev = spans[i - 1]
            assert prev["kind"] == "text" and i > 0
            expect.append((row["doc_id"], s["media_ref"], s["kind"],
                           prev["text"], prev["offset"]))
    assert len(out) == len(expect)
    got = set(map(tuple, out[["doc_id", "media_ref", "kind", "caption",
                              "caption_offset"]].itertuples(index=False)))
    assert got == set(expect)


def test_caption_pairs_adjacent_media_spans(ray_session):
    """Two back-to-back media spans both pair with the NEAREST preceding
    text span (round-5 generalization: searchsorted over text-span
    indices, not immediate-predecessor); a doc whose first span is media
    still raises the loud diagnostic."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from chronographer_ray.stages.multimodal import caption_pairs_batch

    def doc(doc_id, spans):
        return {"doc_id": doc_id,
                "spans": [{"kind": k, "text": t, "media_ref": r,
                           "offset": i}
                          for i, (k, t, r) in enumerate(spans)]}

    docs = [
        doc("d1", [("text", "intro", ""), ("image", "", "m1"),
                   ("audio", "", "m2"), ("text", "tail", ""),
                   ("video", "", "m3")]),
        doc("d2", [("text", "only", "")]),
    ]
    batch = pa.Table.from_pylist(docs)
    out = caption_pairs_batch(batch).to_pandas()
    got = {(r.media_ref, r.caption, r.caption_offset)
           for r in out.itertuples(index=False)}
    assert got == {("m1", "intro", 0), ("m2", "intro", 0),
                   ("m3", "tail", 3)}

    bad = pa.Table.from_pylist(
        [doc("d3", [("image", "", "m9"), ("text", "late", "")])])
    with pytest.raises(ValueError):
        caption_pairs_batch(bad)

    # cross-doc guard: media span in a doc with no preceding text must
    # not silently steal the previous doc's caption
    bad2 = pa.Table.from_pylist(
        [doc("d4", [("text", "a", "")]),
         doc("d5", [("image", "", "m8"), ("text", "b", "")])])
    with pytest.raises(ValueError):
        caption_pairs_batch(bad2)
