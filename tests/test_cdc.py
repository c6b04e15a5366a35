"""Content-defined chunking: windowed==sequential gear, byte-shift
locality (the property CDC exists for), coverage/bounds, min/max clamps."""
import numpy as np
import pyarrow as pa

from chronographer_ray.stages.cdc import (
    GEAR,
    WINDOW,
    cdc_chunks_dataset,
    gear_hashes,
    window_valid,
)


def test_windowed_equals_sequential_gear():
    rs = np.random.RandomState(0)
    data = rs.randint(0, 256, 700).astype(np.uint8)
    offsets = np.array([0, 300, 700], np.int64)  # two blobs in one stream
    hv = gear_hashes(data, offsets)
    valid = window_valid(offsets)
    for s, e in ((0, 300), (300, 700)):
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for i in range(s, e):
                h = (h << np.uint64(1)) + GEAR[data[i]]
                if i - s >= WINDOW - 1:
                    assert valid[i] and hv[i] == h
                else:
                    assert not valid[i]


def _chunks(texts, **kw):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    return cdc_chunks_dataset(rd.from_arrow(t), **kw).to_pandas()


def _blob(seed, n):
    rs = np.random.RandomState(seed)
    return "".join(chr(c) for c in rs.randint(97, 123, n))


def test_coverage_contiguous_and_short_blob_single_chunk(ray_session):
    texts = [_blob(1, 500), _blob(2, 40), ""]
    df = _chunks(texts)
    for d, txt in enumerate(texts):
        g = df[df.doc_id == d].sort_values("chunk_idx")
        assert g["length"].sum() == len(txt)
        assert (g["offset"].to_numpy()
                == np.concatenate(([0], np.cumsum(g["length"])[:-1]))).all() \
            if len(g) else True
    assert len(df[df.doc_id == 1]) == 1  # < WINDOW bytes: no cut possible
    assert len(df[df.doc_id == 2]) == 0  # empty blob: no rows


def test_shift_locality_chunks_survive_prefix_insert(ray_session):
    """THE CDC property: prepending bytes must leave most chunk hashes
    intact (boundaries realign after the first cut) — fixed-stride
    chunking would lose every chunk."""
    body = _blob(3, 4000)
    shifted = _blob(4, 37) + body
    df = _chunks([body, shifted], bits=5)
    a = df[df.doc_id == 0]["chunk_md5"].tolist()
    b = df[df.doc_id == 1]["chunk_md5"].tolist()
    assert len(a) > 20
    shared = len(set(a) & set(b))
    assert shared >= len(a) - 3, (shared, len(a))


def test_min_max_clamps(ray_session):
    texts = [_blob(5, 3000)]
    pure = _chunks(texts, bits=5)
    clamped = _chunks(texts, bits=5, min_size=24, max_size=200)
    assert clamped["length"].sum() == 3000
    assert (clamped["length"] <= 200).all()
    # every chunk except possibly the last respects min_size
    assert (clamped["length"].to_numpy()[:-1] >= 24).all()
    # clamps must actually change something on this input
    assert not pure["length"].equals(clamped["length"]) or len(pure) != len(clamped)


def test_determinism_across_runs(ray_session):
    texts = [_blob(6, 1000), _blob(7, 800)]
    a = _chunks(texts).sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    b = _chunks(texts).sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert a.equals(b)
