"""Record-level data contracts: rule bitmask semantics."""
import numpy as np
import pyarrow as pa

from chronographer_ray.stages.contracts import validate_events_batch


def _batch(**over):
    base = {
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array(np.array(["2024-06-01"], "datetime64[us]")),
        "event_type": ["click"],
        "value": pa.array([1.5], pa.float64()),
        "props": ['{"k": 1}'],
    }
    base.update(over)
    return pa.table(base)


def test_clean_record_emits_nothing():
    assert validate_events_batch(_batch()).num_rows == 0


def test_each_rule_sets_its_bit():
    cases = [
        ({"value": pa.array([-0.5], pa.float64())}, 1),
        ({"ts": pa.array(np.array(["2025-06-01"], "datetime64[us]"))}, 2),
        ({"event_type": ["bogus"]}, 4),
        ({"props": ["not json"]}, 8),
    ]
    for over, bit in cases:
        out = validate_events_batch(_batch(**over)).to_pandas()
        assert len(out) == 1
        assert int(out["violations"].iloc[0]) == bit
        assert int(out["n_violations"].iloc[0]) == 1


def test_null_value_and_combined_rules():
    out = validate_events_batch(_batch(
        value=pa.array([None], pa.float64()), props=["broken"],
    )).to_pandas()
    assert int(out["violations"].iloc[0]) == 1 + 8
    assert int(out["n_violations"].iloc[0]) == 2


def test_cli_quality_ops(ray_session, tmp_path, capsys):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from chronographer_ray.__main__ import cmd_quality

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["the quick brown fox jumps over things",
                 "the quick brown fox jumps over things",
                 "totally different content right here now"],
    })
    docs_path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, docs_path)

    class A:
        pass

    for op, extra in [("classify", {}), ("df-score", {}),
                      ("snippets", {"term": "quick"}),
                      ("containment", {"tau": 0.9}),
                      ("cross-decontam", {"eval_docs": docs_path})]:
        a = A()
        a.op, a.docs, a.id_col, a.text_col = op, docs_path, "doc_id", "text"
        a.eval_docs = extra.get("eval_docs")
        a.term = extra.get("term", "the")
        a.window, a.tau = 40, extra.get("tau", 0.8)
        a.out, a.head = None, 20
        cmd_quality(a)
        assert capsys.readouterr().out.strip()

    import pytest

    a = A()
    a.op, a.docs, a.id_col, a.text_col = ("cross-decontam", docs_path,
                                          "doc_id", "text")
    a.eval_docs, a.term, a.window, a.tau = None, "the", 40, 0.8
    a.out, a.head = None, 20
    with pytest.raises(SystemExit):
        cmd_quality(a)
