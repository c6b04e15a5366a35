"""Text-driven narrative-graph branch — frame semantics over abstracts.

The reference builds per-abstract NIF/Framester graphs with a T5 frame
transformer + spaCy + DBpedia Spotlight (``src/build_ng/frame_semantics.py``,
``experiments_run/build_kg_with_frames.py``). None of those models exist in
this container, so the model stage is a DETERMINISTIC stub with the exact
actor-pool execution shape: ``FrameDetector.__init__`` does the one-time
setup (frame lexicon compile — where the T5 weights would load) and
``__call__`` scores one Arrow batch of sentences. Swapping in
``FrameSemanticTransformer.detect_frames_bulk`` changes only ``_detect``.

Triple emission mirrors the reference graph shape
(``frame_semantics.py:58-117``): per abstract a ``nif:Phrase`` node with
``nif:sentence`` links, per frame a ``CorpusEntry`` annotation with
``fromDocument`` / ``onFrame`` / ``onLemma``, per frame element a
``MappedRole`` with ``withfnfe`` / ``rdf:value`` / ``nif:superString`` and —
J9 — a ``skos:related`` edge to every linked entity whose surface form is
contained in the element text (``frame_semantics.py:102-105``).
"""
from __future__ import annotations

from urllib.parse import quote

import pyarrow as pa

NS_EX = "http://example.com/"
NS_NIF = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"
NS_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
NS_SKOS = "http://www.w3.org/2004/02/skos/core#"
NS_WSJ = "https://w3id.org/framester/wsj/"
NS_FRAME = "https://w3id.org/framester/data/framesterabox/"
NS_GFE = "https://w3id.org/framester/framenet/abox/gfe/"


def strip_lang_literals(batch: pa.Table, column: str = "object",
                        lang: str = "@en") -> pa.Table:
    """M18 — keep rows whose literal carries ``lang``, strip the tag and the
    surrounding quotes (``experiments_run/build_kg_with_frames.py:32-41``)."""
    vals = batch[column].to_pylist()
    keep_idx, stripped = [], []
    for i, v in enumerate(vals):
        if v is not None and lang in v:
            keep_idx.append(i)
            stripped.append(v.replace(lang, "").replace('"', ""))
    out = batch.take(pa.array(keep_idx, pa.int64()))
    return out.set_column(
        out.schema.get_field_index(column), column, pa.array(stripped, pa.string())
    )


def split_sentences(text: str) -> list[str]:
    """Deterministic sentence splitter (spaCy stand-in): split on '.', '!',
    '?' keeping non-empty stripped sentences."""
    out, cur = [], []
    for ch in text or "":
        cur.append(ch)
        if ch in ".!?":
            s = "".join(cur).strip()
            if s:
                out.append(s)
            cur = []
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


class FrameDetector:
    """T2 — batched frame scorer actor (FrameSemanticTransformer stand-in).

    The stub lexicon maps trigger tokens to (frame, frame-elements): the
    frame is detected when its trigger occurs in the sentence; elements are
    the text left/right of the trigger — the same `(frame, trigger_location,
    frame_elements[])` result shape ``detect_frames_bulk`` returns.
    """

    DEFAULT_LEXICON = {
        "ordered": ("Commerce_buy", ("Buyer", "Goods")),
        "shipped": ("Sending", ("Sender", "Theme")),
        "supplied": ("Supply", ("Supplier", "Theme")),
        "signed": ("Sign_agreement", ("Signatory", "Agreement")),
        "met": ("Meet_with", ("Party_1", "Party_2")),
        "built": ("Building", ("Agent", "Created_entity")),
    }

    def __init__(self, lexicon: dict | None = None):
        self.lexicon = dict(lexicon or self.DEFAULT_LEXICON)

    def _detect(self, sentence: str) -> list[dict]:
        toks = sentence.split()
        low = [t.strip(".,;:!?").lower() for t in toks]
        frames = []
        for i, t in enumerate(low):
            hit = self.lexicon.get(t)
            if not hit:
                continue
            name, (left_el, right_el) = hit
            elements = []
            left = " ".join(toks[:i]).strip()
            right = " ".join(toks[i + 1:]).strip()
            if left:
                elements.append({"name": left_el, "text": left})
            if right:
                elements.append({"name": right_el, "text": right})
            frames.append(
                {"name": name, "trigger": toks[i].strip(".,;:!?"), "elements": elements}
            )
        return frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch of ``(doc_id, text, mentions?)`` abstracts → frame-graph
        triples. ``mentions`` (from :class:`MentionLinker`) feeds the J9
        surface-form→entity ``skos:related`` join."""
        has_mentions = "mentions" in batch.column_names
        subjects, predicates, objects = [], [], []

        def emit(s: str, p: str, o: str) -> None:
            subjects.append(s)
            predicates.append(p)
            objects.append(o)

        for row_idx in range(batch.num_rows):
            doc_id = batch["doc_id"][row_idx].as_py()
            text = batch["text"][row_idx].as_py() or ""
            surf_to_ent = {}
            if has_mentions:
                for m in batch["mentions"][row_idx].as_py() or []:
                    surf_to_ent.setdefault(m["surface"], m["entity"])

            abs_iri = NS_EX + quote(str(doc_id))
            emit(abs_iri, NS_RDF + "type", NS_NIF + "Phrase")
            emit(abs_iri, NS_RDF + "value", text)
            sentences = split_sentences(text)
            for i, sent in enumerate(sentences):
                sent_iri = f"{abs_iri}_{i}"
                emit(abs_iri, NS_NIF + "sentence", sent_iri)
                emit(sent_iri, NS_RDF + "type", NS_NIF + "Sentence")
                emit(sent_iri, NS_RDF + "value", sent)

                for fi, frame in enumerate(self._detect(sent)):
                    fa = f"{sent_iri}_{fi}"
                    emit(fa, NS_RDF + "type", NS_WSJ + "CorpusEntry")
                    emit(fa, NS_WSJ + "fromDocument", sent_iri)
                    emit(fa, NS_WSJ + "onFrame", NS_FRAME + frame["name"])
                    emit(fa, NS_WSJ + "onLemma", frame["trigger"])
                    for ei, el in enumerate(frame["elements"]):
                        fe = f"{fa}_{ei}"
                        emit(fa, NS_WSJ + "withmappedrole", fe)
                        emit(fe, NS_RDF + "type", NS_WSJ + "MappedRole")
                        emit(fe, NS_WSJ + "withfnfe", NS_GFE + el["name"])
                        emit(fe, NS_RDF + "value", el["text"])
                        # J9: substring containment within document scope
                        for surface, entity in surf_to_ent.items():
                            if surface in el["text"]:
                                emit(fe, NS_SKOS + "related", entity)
                        kind = "Word" if len(el["text"].split()) == 1 else "Phrase"
                        emit(fe, NS_RDF + "type", NS_NIF + kind)
                        emit(fe, NS_NIF + "superString", sent_iri)

        return pa.table(
            {
                "subject": pa.array(subjects, pa.string()),
                "predicate": pa.array(predicates, pa.string()),
                "object": pa.array(objects, pa.string()),
            }
        )


def frame_kg_dataset(docs_ds, lexicon: dict | None = None,
                     concurrency: int = 2, batch_size: int = 128,
                     detector_cls: type = FrameDetector,
                     detector_kwargs: dict | None = None):
    """Documents ``(doc_id, text[, mentions])`` → frame-graph triples via a
    frame-scorer actor pool (the canonical batched-model scorer, T2).

    ``detector_cls`` is the model integration point: any callable class with
    the same ``__init__(**kwargs)`` / ``__call__(pa.Table) -> pa.Table``
    contract drops in without touching this pipeline (the real
    ``FrameSemanticTransformer`` adapter overrides ``_detect`` only;
    conformance is tested with a second, differently-shaped fake in
    ``tests/test_adapter_conformance.py``)."""
    kwargs = detector_kwargs if detector_kwargs is not None else {"lexicon": lexicon}
    return docs_ds.map_batches(
        detector_cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
