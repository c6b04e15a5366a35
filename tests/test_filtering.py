"""Narrative filter (M7-M9) — mirrors the reference's src/tests/test_filtering.py
scenarios: temporal discard, regex-year discard, location/person discard."""
import pyarrow as pa

from chronographer_ray.config import DatasetConfig, SearchConfig
from chronographer_ray.search.filtering import NarrativeFilter, extract_first_year

DS = DatasetConfig(
    point_in_time=["p:date"],
    start_dates=["p:start"],
    end_dates=["p:end"],
    places=["c:Place"],
    person=["c:Person"],
    regex_year_filter=True,
)


def cfg(**kw):
    base = dict(
        start="s", rdf_type=[("event", "c:Event")],
        start_date="1789-01-01", end_date="1799-12-31",
        filter_where=True, filter_when=True, filter_who=True,
    )
    base.update(kw)
    return SearchConfig(**base)


def spo(rows):
    return pa.table(
        {
            "subject": [r[0] for r in rows],
            "predicate": [r[1] for r in rows],
            "object": [r[2] for r in rows],
        }
    )


EMPTY = spo([])


def test_temporal_discard_rules():
    type_date = spo(
        [
            ("n:ended_early", "p:end", "1788-01-01"),    # end < window start
            ("n:starts_late", "p:start", "1800-05-05"),  # start > window end
            ("n:pit_out", "p:date", "1801-01-01"),       # point in time outside
            ("n:pit_in", "p:date", "1795-06-01"),        # inside → kept
            ("n:ok", "p:start", "1790-01-01"),
        ]
    )
    f = NarrativeFilter(DS, cfg(filter_where=False, filter_who=False))
    out = f(EMPTY, EMPTY, type_date, ["1789-01-01", "1799-12-31"])
    assert set(out) == {"n:ended_early", "n:starts_late", "n:pit_out"}


def test_regex_year_discard():
    ingoing = spo([("n:1810_Fest", "p", "seed"), ("n:1795_Battle", "p", "seed")])
    outgoing = spo([("seed", "p", "n:1788_Prelude")])
    f = NarrativeFilter(DS, cfg(filter_where=False, filter_who=False))
    out = f(ingoing, outgoing, spo([("x", "p:date", "1790-01-01")]), ["1789-01-01", "1799-12-31"])
    assert set(out) == {"n:1810_Fest", "n:1788_Prelude"}


def test_regex_default_year_is_window_start():
    # no 4-digit year in the IRI → default = window start year → kept
    years = extract_first_year(pa.array(["n:NoYearHere"]), default="1789").to_pylist()
    assert years == ["1789"]


def test_location_and_person_discard():
    type_date = spo(
        [("n:paris", "rdf:type", "c:Place"), ("n:louis", "rdf:type", "c:Person"),
         ("n:event", "rdf:type", "c:Event")]
    )
    f = NarrativeFilter(DS, cfg(filter_when=False))
    out = f(EMPTY, EMPTY, type_date, None)
    assert set(out) == {"n:paris", "n:louis"}


def test_filters_disabled():
    type_date = spo([("n:paris", "rdf:type", "c:Place")])
    f = NarrativeFilter(DS, cfg(filter_where=False, filter_when=False, filter_who=False))
    assert f(EMPTY, EMPTY, type_date, ["1789-01-01", "1799-12-31"]) == []
