"""ConceptNet local assertions — reader, prefix join, NP encoding.

The reference loads a filtered ConceptNet TSV into a per-process pandas
frame and filters it with per-row ``str.startswith`` loops
(``src/build_ng/concept_net.py:46-49``, ``:92-108``); NP encoding walks
spaCy noun chunks (``src/build_ng/np_encoding.py:28-104``). Here the
assertions table is an Arrow table (broadcast via ``ray.put`` when used
inside map_batches), the prefix join is a vectorized ``pc.starts_with``
semi-join (J12), and the NP extractor is a deterministic heuristic stub
with the same triple-emission shape (T6).
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

ASSERTION_SCHEMA = pa.schema(
    [
        ("triple_id", pa.string()),
        ("predicate", pa.string()),
        ("subject", pa.string()),
        ("object", pa.string()),
        ("metadata", pa.string()),
    ]
)

NS_EX = "http://example.com/"
NS_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
NS_SKOS = "http://www.w3.org/2004/02/skos/core#"


def read_assertions(path: str):
    """S11 — ConceptNet assertions TSV (5 unnamed columns) → Dataset with
    the reference's column names (``concept_net.py:46-49``)."""
    import ray.data as rd
    from ray.data.datasource import CSVDatasource  # noqa: F401  (parse opts live below)
    from pyarrow import csv as pacsv

    return rd.read_csv(
        path,
        read_options=pacsv.ReadOptions(
            column_names=[f.name for f in ASSERTION_SCHEMA], autogenerate_column_names=False
        ),
        parse_options=pacsv.ParseOptions(delimiter="\t"),
    )


def concept_prefix_filter(assertions: pa.Table, labels, lang: str = "en",
                          column: str = "subject") -> pa.Table:
    """J12 — keep assertions whose ``column`` starts with any
    ``/c/{lang}/{label}/`` prefix. The reference's row-wise
    ``apply(startswith)`` loop becomes one regex-free vectorized pass:
    extract the concept segment (``/c/en/<concept>/``) and hash-join it
    against the label set — O(rows) instead of O(rows × labels)."""
    prefix = f"/c/{lang}/"
    seg = pc.split_pattern(assertions[column], "/")
    # require a trailing '/' after the concept (the reference's f"/c/en/{x}/");
    # this ALSO guards the list_element below — extracting element 3 on a
    # batch containing a short/malformed URI (e.g. '/c/en') raises
    # ArrowInvalid for the whole batch, so the length filter runs FIRST
    lens = pc.list_value_length(seg)
    keep = pc.and_(pc.greater(lens, 4), pc.starts_with(assertions[column], prefix))
    cand = assertions.filter(keep)
    if cand.num_rows == 0:
        return cand
    # '/c/en/label/...' splits to ['', 'c', 'en', 'label', ...] — element 3
    concept = pc.list_element(pc.split_pattern(cand[column], "/"), 3)
    hit = pc.is_in(concept, value_set=pa.array(sorted(set(labels)), pa.string()))
    return cand.filter(hit)


def concepts_for_labels(assertions: pa.Table, labels, lang: str = "en") -> pa.Table:
    """Reference ``get_concepts_local(entity=True)`` parity: subject-side
    prefix match, projected to (subject, predicate, object)
    (``concept_net.py:92-102``; note the reference ORs subject with subject —
    a bug we mirror semantically by matching subject only)."""
    out = concept_prefix_filter(assertions, labels, lang, "subject")
    return out.select(["subject", "predicate", "object"])


_NP_STOP = {"the", "a", "an", "of", "and", "to", "in", "on", "for", "with", "by"}


def noun_phrases(text: str) -> list[list[str]]:
    """Deterministic noun-chunk stand-in: maximal runs of non-stopword
    alphabetic tokens (lowered, punctuation stripped). Root = last token
    (English NP head-final heuristic)."""
    chunks, cur = [], []
    for tok in (text or "").split():
        w = tok.strip(".,;:!?\"'()").lower()
        if w and w not in _NP_STOP and w.replace("-", "").isalpha():
            cur.append(w)
        else:
            if cur:
                chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return chunks


class NounPhraseEncoder:
    """T6 — NP→KG encoding actor: per frame-element text, emit ``hasNP`` /
    ``root`` / token triples, with ``skos:related`` links into ConceptNet
    for tokens whose ``/c/{lang}/{token}/`` concept exists in the broadcast
    assertions table (``np_encoding.py:60-104``)."""

    def __init__(self, assertions, lang: str = "en"):
        import ray

        table: pa.Table = (
            assertions if isinstance(assertions, pa.Table) else ray.get(assertions)
        )
        prefix = f"/c/{lang}/"
        seg = pc.split_pattern(table["subject"], "/")
        # length guard BEFORE list_element: a short URI raises for the batch
        mask = pc.and_(
            pc.greater_equal(pc.list_value_length(seg), 4),
            pc.starts_with(table["subject"], prefix),
        )
        subj_ok = table["subject"].filter(mask)
        self.known = set(
            pc.list_element(pc.split_pattern(subj_ok, "/"), 3).to_pylist()
        )
        self.lang = lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        subjects, predicates, objects = [], [], []

        def emit(s, p, o):
            subjects.append(s)
            predicates.append(p)
            objects.append(o)

        for fe_iri, text in zip(
            batch["fe_iri"].to_pylist(), batch["text"].to_pylist()
        ):
            for np_idx, chunk in enumerate(noun_phrases(text)):
                np_iri = f"{fe_iri}_{np_idx}"
                emit(fe_iri, NS_EX + "hasNP", np_iri)
                emit(np_iri, NS_RDF + "value", " ".join(chunk))
                for t_idx, tok in enumerate(chunk):
                    tok_iri = f"{np_iri}_{t_idx}"
                    pred = NS_EX + ("root" if t_idx == len(chunk) - 1 else "NOUN")
                    emit(np_iri, pred, tok_iri)
                    emit(tok_iri, NS_RDF + "value", tok)
                    if tok in self.known:
                        emit(tok_iri, NS_RDF + "type", NS_EX + "CN_ENT")
                        emit(tok_iri, NS_SKOS + "related", f"/c/{self.lang}/{tok}")

        return pa.table(
            {
                "subject": pa.array(subjects, pa.string()),
                "predicate": pa.array(predicates, pa.string()),
                "object": pa.array(objects, pa.string()),
            }
        )
