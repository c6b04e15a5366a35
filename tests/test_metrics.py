"""P/R/F1 arithmetic + referent canonicalization — mirrors the reference's
src/tests/test_metrics.py expectations."""
import pytest

from chronographer_ray.search.metrics import prf


def test_perfect_match():
    m = prf(["a", "b"], ["a", "b"])
    assert (m.precision, m.recall, m.f1) == (1.0, 1.0, 1.0)


def test_counts_and_scores():
    m = prf(["a", "b", "c"], ["a", "d"])
    assert (m.true_pos, m.false_pos, m.false_neg) == (1, 2, 1)
    assert m.precision == pytest.approx(1 / 3)
    assert m.recall == pytest.approx(1 / 2)
    assert m.f1 == pytest.approx(1 / (1 + 0.5 * 3))


def test_empty_found():
    m = prf([], ["a"])
    assert (m.precision, m.recall, m.f1) == (0.0, 0.0, 0.0)


def test_referent_canonicalization():
    m = prf(["alias"], ["canonical"], referents={"alias": "canonical"})
    assert m.f1 == 1.0


def test_found_duplicates_are_set_semantics():
    m = prf(["a", "a", "a"], ["a"])
    assert m.f1 == 1.0
