"""Adapter-conformance tests for the model stages (T1 linker, T2 frames).

The reference integrates spaCy + DBpedia Spotlight
(``/root/reference/src/build_ng/dbpedia_spotlight.py:25-44``) and
FrameSemanticTransformer (``src/build_ng/frame_semantics.py:40,140``); the
sandbox stubs them. These tests prove the ``__init__``/``__call__`` actor
contract is the ONLY coupling: a second fake with a completely different
internal shape (an eager "model object" with its own annotate API, no dict,
no regex, no lexicon) drops into the UNTOUCHED pipelines
(``link_documents`` / ``frame_kg_dataset``) and the pipeline-level
invariants still hold. Swapping in the real models is the same exercise.

The fakes are defined INSIDE the tests: cloudpickle then ships them by
value to the Ray workers, exactly how a user-supplied adapter class from a
driver script would travel.
"""
import pyarrow as pa

from chronographer_ray.pipelines.flagship import link_documents

SF = "/root/testdata/sf0.001"


def _make_spotlightish():
    """A differently-shaped 'remote annotator': eager per-text API returning
    dicts (the shape Spotlight's REST payload has), no label dict at all."""

    class SpotlightishModel:
        def annotate(self, text):
            out = []
            for tok in text.split():
                w = tok.strip(".,;:!?\"'()")
                if w.istitle() and len(w) > 3:  # NER-ish heuristic, model-owned
                    out.append(
                        {"@surfaceForm": w, "@URI": f"http://alt.example/{w}",
                         "@offset": text.find(w)}
                    )
            return out

    return SpotlightishModel


def _collect(ds) -> pa.Table:
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    assert "mentions" in t.column_names
    return t


def test_alt_linker_subclass_swaps_in(ray_session):
    """Adapter subclass (override __init__/_link_text only — the documented
    integration points) runs through the untouched link_documents pipeline;
    the inherited batch walk is reused as-is."""
    from chronographer_ray.stages.linker import MentionLinker

    Spotlightish = _make_spotlightish()

    class AltLinker(MentionLinker):
        def __init__(self, endpoint: str = "fake://spotlight"):
            self.model = Spotlightish()  # no label dict, no regex

        def _link_text(self, text):
            return [
                (a["@surfaceForm"], a["@URI"], a["@offset"])
                for a in self.model.annotate(text)
            ]

    ds = link_documents(SF, concurrency=1, linker_cls=AltLinker, linker_kwargs={})
    t = _collect(ds)
    ents = [m["entity"] for row in t["mentions"].to_pylist() for m in row]
    assert ents and all(e.startswith("http://alt.example/") for e in ents)


def test_independent_linker_class_swaps_in(ray_session):
    """A from-scratch class (no inheritance) satisfying only the
    __init__/__call__ + output-schema contract also drops in, and the span
    passthrough invariant still holds at the pipeline level."""
    Spotlightish = _make_spotlightish()

    class AltLinkerBatch:
        def __init__(self):
            self.model = Spotlightish()

        def __call__(self, batch: pa.Table) -> pa.Table:
            spans_col = batch["spans"]
            if isinstance(spans_col, pa.ChunkedArray):
                spans_col = spans_col.combine_chunks()
            offs = spans_col.offsets.to_pylist()
            base = offs[0]
            values = spans_col.flatten()
            kinds = values.field("kind").to_pylist()
            texts = values.field("text").to_pylist()
            m_surface, m_entity, m_span, m_start = [], [], [], []
            m_offsets = [0]
            for i in range(batch.num_rows):
                lo, hi = offs[i] - base, offs[i + 1] - base
                for j in range(lo, hi):
                    if kinds[j] != "text" or not texts[j]:
                        continue
                    for a in self.model.annotate(texts[j]):
                        m_surface.append(a["@surfaceForm"])
                        m_entity.append(a["@URI"])
                        m_span.append(j - lo)
                        m_start.append(a["@offset"])
                m_offsets.append(len(m_surface))
            struct = pa.StructArray.from_arrays(
                [
                    pa.array(m_surface, pa.string()),
                    pa.array(m_entity, pa.string()),
                    pa.array(m_span, pa.int32()),
                    pa.array(m_start, pa.int32()),
                ],
                names=["surface", "entity", "span_idx", "start"],
            )
            mentions = pa.ListArray.from_arrays(
                pa.array(m_offsets, pa.int32()), struct
            )
            return batch.append_column("mentions", mentions)

    ds = link_documents(
        SF, concurrency=1, linker_cls=AltLinkerBatch, linker_kwargs={}
    )
    t = _collect(ds)

    from chronographer_ray.data.interleave import interleaved_dataset

    orig = pa.Table.from_pandas(
        interleaved_dataset(SF).to_pandas(), preserve_index=False
    ).sort_by("doc_id")
    got = t.select(["doc_id", "spans"]).sort_by("doc_id")
    assert got["spans"].to_pylist() == orig["spans"].to_pylist()


def test_alt_frame_detector_swaps_in(ray_session):
    """T2: a detector with a different model shape (no lexicon kwarg,
    overrides only _detect — where detect_frames_bulk plugs in) runs
    through the untouched frame_kg_dataset pipeline."""
    import ray.data as rd

    from chronographer_ray.build_ng.text_kg import FrameDetector, frame_kg_dataset

    class AltFrameDetector(FrameDetector):
        def __init__(self):  # no lexicon arg — model owns its weights
            pass

        def _detect(self, sentence):
            toks = sentence.split()
            if len(toks) < 3:
                return []
            return [
                {
                    "name": "Alt_frame",
                    "trigger": toks[len(toks) // 2].strip(".,;:!?"),
                    "elements": [
                        {"name": "Alt_element", "text": " ".join(toks[:2])}
                    ],
                }
            ]

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    ["The fleet sailed to the port. Short.", "Nothing here."],
                    pa.string(),
                ),
            }
        )
    )
    out = frame_kg_dataset(
        docs, concurrency=1, detector_cls=AltFrameDetector, detector_kwargs={}
    ).to_pandas()
    assert (
        out["object"]
        == "https://w3id.org/framester/data/framesterabox/Alt_frame"
    ).any()


def test_default_pipelines_unchanged(ray_session):
    """Sanity: the default models still produce their round-1 shapes after
    the integration-point refactor."""
    t = _collect(link_documents(SF, concurrency=1))
    ents = {m["entity"] for row in t["mentions"].to_pylist() for m in row}
    assert ents  # default label map links something
