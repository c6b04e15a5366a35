"""Ready-made configs + stores over the synthetic KG (test/bench harness)."""
from __future__ import annotations

from ..config import DatasetConfig, SearchConfig
from ..sources.triple_store import ArrowTripleStore
from .synth import synth_kg


def synth_configs(side: dict, iterations: int = 10, type_ranking: str = "entropy_pred_object_freq"):
    dataset = DatasetConfig(
        config_type="synth",
        predicate_filter=side["predicate_filter"],
        point_in_time=side["point_in_time"],
        start_dates=side["start_dates"],
        end_dates=side["end_dates"],
        places=side["places"],
        person=side["person"],
        filter_out_prefixes=side["filter_out_prefixes"],
        start_uri=side["start_uri"],
        regex_year_filter=True,
    )
    search = SearchConfig(
        start=side["seed_event"],
        iterations=iterations,
        type_ranking=type_ranking,
        rdf_type=side["target"],
        start_date=side["dates"][0],
        end_date=side["dates"][1],
    )
    return dataset, search


def make_search(iterations: int = 10, type_ranking: str = "entropy_pred_object_freq", **kg_kwargs):
    """(GraphSearch over an in-memory store, side dict) on the synthetic KG."""
    from ..search.frontier import GraphSearch

    triples, side = synth_kg(**kg_kwargs)
    dataset, search_cfg = synth_configs(side, iterations, type_ranking)
    gs = GraphSearch(
        store=ArrowTripleStore(triples),
        dataset=dataset,
        config=search_cfg,
        domain_map=side["domain"],
        range_map=side["range"],
        superclasses=side["superclasses"],
        gold_events=side["gold_events"],
        referents=side["referents"],
    )
    return gs, side
