"""Path ranking — A2 (entropy re-score) + A3 (top-1 selection).

Operates on the small driver-side path-occurrence dict (distinct paths ≪
edges; the per-hop counting itself is a Ray ``groupby().count()`` — see
``search/ordering.py``). Semantics follow the reference's ``src/ranker.py``:

- priority classes: keys are prefixed ``1-`` (superclass hits the target
  class), ``2-`` (reserved), ``3-`` (other); the lowest present class wins
  and only its keys are ranked;
- band filter ``low < count < high`` applied for frequency strategies, with
  fallback to the unfiltered dict when nothing survives;
- entropy strategy rescores with ``-(c/Σc)·log(c/Σc)`` over the WHOLE dict
  (no band filter);
- ``inverse_*`` strategies rank ascending;
- tie-break: stable sort ⇒ first-inserted key wins. The occurrence dict is
  built in deterministic first-occurrence order, making the tie-break
  explicit (the reference relies on Python dict insertion order).
"""
from __future__ import annotations

from math import log
from typing import Optional


class Ranker:
    def __init__(
        self,
        type_ranking: str = "entropy_pred_freq",
        low_threshold: int = 1,
        high_threshold: int = 200,
    ):
        self.type_ranking = type_ranking
        self.low_threshold = low_threshold
        self.high_threshold = high_threshold

    @staticmethod
    def priority_subset(occ: dict[str, float]) -> dict[str, float]:
        """Keep only the keys of the highest-priority class present (1→2→3)."""
        for cls in ("1", "2", "3"):
            subset = {k: v for k, v in occ.items() if k.startswith(cls)}
            if subset:
                return subset
        return occ

    @staticmethod
    def entropy_scores(occ: dict[str, float]) -> dict[str, float]:
        total = sum(occ.values())
        return {k: -(v / total) * log(v / total) for k, v in occ.items()}

    def _top1(
        self, occ: dict[str, float], descending: bool, band_filter: bool
    ) -> tuple[Optional[str], Optional[float]]:
        occ = self.priority_subset(occ)
        items = sorted(occ.items(), key=lambda kv: kv[1], reverse=descending)
        if band_filter:
            banded = [
                (k, v) for k, v in items if self.low_threshold < v < self.high_threshold
            ]
            if banded:
                return banded[0]
        if items:
            return items[0]
        return None, None

    def __call__(self, occurrences: dict[str, float]) -> tuple[Optional[str], Optional[float]]:
        if not occurrences:
            return None, None
        t = self.type_ranking
        if "pred" not in t:
            raise ValueError(f"not implemented: {t}")
        if "inverse" in t:
            return self._top1(occurrences, descending=False, band_filter=True)
        if "entropy" in t:
            return self._top1(self.entropy_scores(occurrences), descending=True, band_filter=False)
        return self._top1(occurrences, descending=True, band_filter=True)
