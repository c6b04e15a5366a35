"""Search evaluation — A5 (P/R/F1 vs a gold event list) + M14 (referent map).

Semantics follow the reference's ``src/metrics.py:62-121`` (set
intersection/difference arithmetic, referent canonicalization before
comparison, F1 = tp / (tp + 0.5·(fp+fn))). New implementation.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable


def canonicalize(found: Iterable[str], referents: dict[str, str]) -> list[str]:
    """M14 — map alias IRIs to canonical IRIs via the broadcast referents dict."""
    return [referents.get(u, u) for u in found]


@dataclass
class PRF:
    precision: float
    recall: float
    f1: float
    true_pos: int = 0
    false_pos: int = 0
    false_neg: int = 0

    def as_dict(self) -> dict:
        return {
            "precision": self.precision,
            "recall": self.recall,
            "f1": self.f1,
        }


def prf(found: Iterable[str], gold: Iterable[str], referents: dict[str, str] | None = None) -> PRF:
    found_set = set(canonicalize(found, referents or {}))
    gold_set = set(gold)
    tp = len(found_set & gold_set)
    fp = len(found_set - gold_set)
    fn = len(gold_set - found_set)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    denom = tp + 0.5 * (fp + fn)
    f1 = tp / denom if denom else 0.0
    return PRF(precision, recall, f1, tp, fp, fn)
