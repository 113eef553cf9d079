"""Driver-contract invariants for __spark_entry__ (no Spark session
needed): every queries() entry has a DuckDB oracle except the documented
rows-only case, the oracle dict has no orphans, and the priority prefix
that steers the driver's ~50-query verification window is well-formed."""

import __spark_entry__ as entry

# the model-UDF pipeline is the single rows-only query by design
# (langid/perplexity UDFs are not SQL-expressible; parity is pinned by
# tests/test_pipeline_f1.py against the pure-pandas oracle)
ROWS_ONLY = {"full_pipeline"}


def test_every_query_has_an_oracle():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(qs) - set(oracles) == ROWS_ONLY
    assert not set(oracles) - set(qs), "orphan oracle entries"


def test_priority_prefix_is_window_sized_and_first():
    qs = list(entry.queries())
    assert len(entry._PRIORITY) <= 50, "prefix must fit the driver window"
    assert qs[: len(entry._PRIORITY)] == entry._PRIORITY
    assert len(set(entry._PRIORITY)) == len(entry._PRIORITY), "duplicates"


def test_oracle_sql_is_text():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name
