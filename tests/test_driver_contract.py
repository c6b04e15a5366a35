"""Shape guard for the driver contract: every oracle has a query, every
query is callable, and the three entry functions exist."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import __ray_entry__ as entrymod  # noqa: E402


def test_contract_shape():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), sorted(set(oracles) - set(qs))
    assert len(qs) >= 47
    assert len(oracles) >= 33
    assert all(callable(fn) for fn in qs.values())
    assert callable(entrymod.entry)


def test_oracle_sql_mentions_named_columns():
    """Aggregate/computed columns must be AS-aliased — the driver hashes by
    sorted column name, so an unaliased aggregate breaks the compare."""
    for name, sql in entrymod.oracle_sql().items():
        lowered = sql.lower()
        assert "count(*)" not in lowered or " as " in lowered, name
