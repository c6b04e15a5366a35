"""Ranker semantics — mirrors the reference's src/tests/test_ranker.py
scenario: a two-path occurrence dict, exact top-1 expectations for all six
strategies, priority classes and the band filter."""
import math

import pytest

from chronographer_ray.search.ranker import Ranker

# two paths in priority class 1, counts 15 and 3
OCC = {"1-ingoing-p;o": 15, "1-outgoing-s;q": 3}


def test_pred_freq_max():
    key, score = Ranker("pred_object_freq")(OCC)
    assert key == "1-ingoing-p;o"
    assert score == 15


def test_inverse_pred_freq_min():
    key, score = Ranker("inverse_pred_object_freq")(OCC)
    assert key == "1-outgoing-s;q"
    assert score == 3


def test_entropy_scoring():
    key, score = Ranker("entropy_pred_object_freq")(OCC)
    tot = 18
    expected = {k: -(v / tot) * math.log(v / tot) for k, v in OCC.items()}
    best = max(expected, key=expected.get)
    assert key == best
    assert score == pytest.approx(expected[best])


def test_priority_class_wins_over_count():
    occ = {"3-common": 1000, "1-rare": 2}
    key, _ = Ranker("pred_freq")(occ)
    assert key == "1-rare"


def test_band_filter_excludes_extremes_with_fallback():
    # count 1 is <= low threshold, 500 >= high threshold → band empty → fallback max
    occ = {"1-a": 1, "1-b": 500}
    key, score = Ranker("pred_freq")(occ)
    assert (key, score) == ("1-b", 500)
    # 150 survives the band even though 500 is larger
    occ = {"1-a": 500, "1-b": 150}
    key, score = Ranker("pred_freq")(occ)
    assert (key, score) == ("1-b", 150)


def test_tie_break_first_inserted():
    occ = {"1-first": 5, "1-second": 5}
    key, _ = Ranker("pred_freq")(occ)
    assert key == "1-first"


def test_empty_occurrences():
    assert Ranker("pred_freq")({}) == (None, None)


def test_unknown_strategy_rejected():
    with pytest.raises(ValueError):
        Ranker("object_freq")({"1-a": 2})
