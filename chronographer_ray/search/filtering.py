"""Narrative (what/where/when/who) filters — M7, M8, M9.

Computes the per-hop discard set from the 'specific outgoing' type/date
triples, vectorized over Arrow. Semantics follow the reference's
``src/filtering.py:52-138``; implementation is new (Arrow kernels, no pandas
row loops).
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DatasetConfig, SearchConfig
from ..stages.filters import unique_strings

_YEAR_RE = r"\d{4}"


class NarrativeFilter:
    """Stateless-per-hop filter producing the node discard list.

    - WHERE: subjects typed as a place class (``src/filtering.py:99-110``)
    - WHO: subjects typed as a person class
    - WHEN (temporal): subjects whose end date < window start, start date >
      window end, or point-in-time outside the window — lexicographic string
      comparison on normalized date literals (``src/filtering.py:52-63``)
    - WHEN (regex): nodes whose IRI embeds a 4-digit year outside the window
      (first match; default = window start year) (``src/filtering.py:65-97``)
    """

    def __init__(self, dataset: DatasetConfig, search: SearchConfig):
        self.ds = dataset
        self.cfg = search

    def _discard_typed(self, type_date: pa.Table, classes: list[str]) -> list[str]:
        if not classes or type_date.num_rows == 0:
            return []
        hit = type_date.filter(
            pc.is_in(type_date["object"], value_set=pa.array(classes, pa.string()))
        )
        return unique_strings(hit, "subject")

    def _discard_temporal(self, type_date: pa.Table, dates: list[str]) -> list[str]:
        temporal = self.ds.temporal_preds
        if not temporal or type_date.num_rows == 0:
            return []
        t = type_date.filter(
            pc.is_in(type_date["predicate"], value_set=pa.array(temporal, pa.string()))
        )
        if t.num_rows == 0:
            return []

        def _in(preds: list[str]) -> pa.ChunkedArray:
            if not preds:
                return pa.chunked_array([pa.array([False] * t.num_rows)])
            return pc.is_in(t["predicate"], value_set=pa.array(preds, pa.string()))

        obj = t["object"]
        bad = pc.and_(_in(self.ds.end_dates), pc.less(obj, dates[0]))
        bad = pc.or_(bad, pc.and_(_in(self.ds.start_dates), pc.greater(obj, dates[1])))
        pit = _in(self.ds.point_in_time)
        bad = pc.or_(bad, pc.and_(pit, pc.less(obj, dates[0])))
        bad = pc.or_(bad, pc.and_(pit, pc.greater(obj, dates[1])))
        return unique_strings(t.filter(bad), "subject")

    def _discard_regex(
        self, ingoing: pa.Table, outgoing: pa.Table, dates: list[str]
    ) -> list[str]:
        y0, y1 = dates[0][:4], dates[1][:4]
        out: list[str] = []
        for tbl, col in ((ingoing, "subject"), (outgoing, "object")):
            if tbl.num_rows == 0:
                continue
            years = extract_first_year(tbl[col], default=y0)
            bad = pc.or_(pc.less(years, y0), pc.greater(years, y1))
            out.extend(unique_strings(tbl.filter(bad), col))
        # the reference dedups ACROSS the two directions (`list(set(...))`
        # around get_to_discard_regex in src/filtering.py:134-136)
        return list(dict.fromkeys(out))

    def __call__(
        self,
        ingoing: pa.Table,
        outgoing: pa.Table,
        type_date: pa.Table,
        dates: list[str] | None,
    ) -> list[str]:
        """Discard list for one hop (order preserved, duplicates removed per
        sub-filter as in the reference's ``list(set(...))`` per component)."""
        to_discard: list[str] = []
        if self.cfg.filter_where:
            to_discard += self._discard_typed(type_date, self.ds.places)
        if self.cfg.filter_who:
            to_discard += self._discard_typed(type_date, self.ds.person)
        if dates:
            if self.cfg.filter_when:
                to_discard += self._discard_temporal(type_date, dates)
            if self.cfg.filter_when and self.ds.regex_year_filter:
                to_discard += self._discard_regex(ingoing, outgoing, dates)
        return to_discard


def extract_first_year(col: pa.ChunkedArray | pa.Array, default: str) -> pa.ChunkedArray:
    """First ``\\d{4}`` match in each string; ``default`` where no match.

    Vectorized stand-in for the reference's per-row ``re.findall`` helper
    (``src/filtering.py:66-77``).
    """
    ex = pc.extract_regex(col, pattern=f"(?P<y>{_YEAR_RE})")
    years = pc.struct_field(ex, "y")
    return pc.fill_null(years, default)
