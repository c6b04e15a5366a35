"""Configuration dataclasses for the search + build pipelines.

Mirrors the semantics of the reference's per-experiment JSON config and
per-dataset YAML (reference: ``src/framework.py:272-385``,
``dataset-config/dbpedia.yaml``) without any code reuse: plain dataclasses,
validated eagerly, serializable to/from JSON for checkpoint manifests.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict
from typing import Optional

# --- public SEM event ontology IRIs (semanticweb.cs.vu.nl/2009/11/sem/) ----
SEM = "http://semanticweb.cs.vu.nl/2009/11/sem/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
SEM_EVENT = SEM + "Event"
SEM_HAS_ACTOR = SEM + "hasActor"
SEM_HAS_PLACE = SEM + "hasPlace"
SEM_HAS_BEGIN = SEM + "hasBeginTimeStamp"
SEM_HAS_END = SEM + "hasEndTimeStamp"
SEM_EVENT_TYPE = SEM + "eventType"
SEM_SUB_EVENT_OF = SEM + "subEventOf"
SEM_HAS_SUB_EVENT = SEM + "hasSubEvent"

# narrative-frame → SEM predicate (reference: generic_kb_to_ng.py:55-65)
NF_TO_PRED = {
    "who": SEM_HAS_ACTOR,
    "what": SEM_EVENT_TYPE,
    "when_bts": SEM_HAS_BEGIN,
    "when_ets": SEM_HAS_END,
    "where": SEM_HAS_PLACE,
    "part_of": SEM_SUB_EVENT_OF,
    "part_of_inverse": SEM_HAS_SUB_EVENT,
}

# narrative-frame → trigger substrings in predicate labels
# (reference: generic_kb_to_ng.py:66-76)
NF_TO_STR = {
    "who": ["person", "combatant", "commander", "participant"],
    "what": ["type"],
    "when_bts": ["start time", "date", "point in time"],
    "when_ets": ["end time"],
    "where": ["place", "location", "country"],
    "part_of": ["partof", "part of"],
    "part_of_inverse": ["has part", "significant event"],
}
STR_TO_NF = {s: nf for nf, strs in NF_TO_STR.items() for s in strs}

RANKING_STRATEGIES = (
    "pred_freq",
    "inverse_pred_freq",
    "entropy_pred_freq",
    "pred_object_freq",
    "inverse_pred_object_freq",
    "entropy_pred_object_freq",
)


@dataclass
class DatasetConfig:
    """Per-KG configuration (the reference's ``dataset-config/*.yaml``)."""

    config_type: str = "synth"
    # predicates never traversed (M1 anti-filter)
    predicate_filter: list[str] = field(default_factory=list)
    rdf_type: str = RDF_TYPE
    point_in_time: list[str] = field(default_factory=list)
    start_dates: list[str] = field(default_factory=list)
    end_dates: list[str] = field(default_factory=list)
    places: list[str] = field(default_factory=list)
    person: list[str] = field(default_factory=list)
    sub_class_of: list[str] = field(
        default_factory=lambda: ["http://www.w3.org/2000/01/rdf-schema#subClassOf"]
    )
    owl_thing: str = "http://www.w3.org/2002/07/owl#Thing"
    # node IRIs starting with any of these prefixes are dropped (M3)
    filter_out_prefixes: list[str] = field(default_factory=list)
    # namespace filter: keep nodes starting with this, plus literals (M2)
    start_uri: str = ""
    # apply the URI-year regex WHEN filter (reference: dbpedia only)
    regex_year_filter: bool = True

    @classmethod
    def from_yaml(cls, path: str) -> "DatasetConfig":
        """Load a reference-format dataset YAML (``dataset-config/*.yaml``:
        dbpedia/wikidata/yago) — the user-extension surface of SURVEY §2.10.
        Unknown keys (``category``, ``domain``, ``range``, ...) are ignored;
        the regex-year WHEN filter follows the reference's dbpedia-only rule."""
        import yaml

        with open(path, encoding="utf-8") as f:
            raw = yaml.safe_load(f)
        return cls(
            config_type=raw.get("config_type", "synth"),
            predicate_filter=raw.get("predicate_filter", []),
            rdf_type=raw.get("rdf_type", RDF_TYPE),
            point_in_time=raw.get("point_in_time", []),
            start_dates=raw.get("start_dates", []),
            end_dates=raw.get("end_dates", []),
            places=raw.get("places", []),
            person=raw.get("person", []),
            sub_class_of=raw.get(
                "sub_class_of", ["http://www.w3.org/2000/01/rdf-schema#subClassOf"]
            ),
            owl_thing=raw.get("owl_thing", "http://www.w3.org/2002/07/owl#Thing"),
            filter_out_prefixes=raw.get("filter_out", []),
            start_uri=raw.get("start_uri", ""),
            regex_year_filter=raw.get("config_type") == "dbpedia",
        )

    @property
    def temporal_preds(self) -> list[str]:
        return self.point_in_time + self.start_dates + self.end_dates

    @property
    def default_preds(self) -> list[str]:
        """Predicates fetched in the 'specific outgoing' 1-hop (J2)."""
        return [self.rdf_type] + self.temporal_preds


@dataclass
class SearchConfig:
    """Per-experiment configuration (the reference's JSON config)."""

    start: str = ""
    iterations: int = 10
    type_ranking: str = "entropy_pred_object_freq"
    walk: str = "informed"  # "informed" | "random"
    node_selection: str = "all"  # "all" | "random"
    domain_range: bool = True
    filter_what: bool = True
    filter_where: bool = True
    filter_when: bool = True
    filter_who: bool = False
    # list of (name, class IRI) targets, e.g. [("event", ".../Event")]
    rdf_type: list[tuple[str, str]] = field(default_factory=list)
    start_date: Optional[str] = None  # "YYYY-MM-DD"
    end_date: Optional[str] = None
    max_uri: int = 1_000_000
    uri_limit: Optional[int] = None  # random-walk per-iter sample size
    seed: int = 23  # reference fixes random.seed(23)
    low_threshold: int = 1  # ranker band filter (exclusive)
    high_threshold: int = 200

    def __post_init__(self) -> None:
        if self.type_ranking not in RANKING_STRATEGIES:
            raise ValueError(f"unknown type_ranking {self.type_ranking!r}")
        if self.walk not in ("informed", "random"):
            raise ValueError(f"unknown walk {self.walk!r}")
        if self.node_selection not in ("all", "random"):
            raise ValueError(f"unknown node_selection {self.node_selection!r}")
        self.rdf_type = [tuple(t) for t in self.rdf_type]

    @property
    def dates(self) -> Optional[list[str]]:
        if self.start_date and self.end_date:
            return [self.start_date, self.end_date]
        return None

    @property
    def target_class_iris(self) -> list[str]:
        return [iri for _, iri in self.rdf_type]

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "SearchConfig":
        return cls(**json.loads(s))
