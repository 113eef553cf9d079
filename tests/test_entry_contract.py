"""Driver-contract invariants for __spark_entry__ (no Spark session
needed): every queries() entry has a DuckDB oracle except the documented
rows-only case, the oracle dict has no orphans, and the priority prefix
that steers the driver's ~50-query verification window is well-formed."""

import __spark_entry__ as entry

# r5: the rows-only set is EMPTY — `full_pipeline` (model-UDF pipeline,
# no SQL oracle) was retired once `full_pipeline_micro` gave the complete
# keep/drop pipeline a hash-matched DuckDB replay and test_pipeline_f1
# pinned the production UDF twin at F1 = 1.0; every remaining query has
# a full value-hash oracle
ROWS_ONLY = set()


def test_every_query_has_an_oracle():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(qs) - set(oracles) == ROWS_ONLY
    assert not set(oracles) - set(qs), "orphan oracle entries"


def test_priority_is_self_aiming():
    """Queries without a driver-green CORRECTNESS row in any committed
    round file sort FIRST (inside the ~50-query driver window); verified
    ones follow. A brand-new query is unverified by construction, so the
    mechanism needs no manual curation when operators are added."""
    qs = list(entry.queries())
    verified = entry._driver_verified()
    unverified = [n for n in qs if n not in verified]
    assert qs[: len(unverified)] == unverified
    # the driver window verifies ~50 queries per round; the backlog must
    # fit in ONE window (VERDICT r4 tightened this from two: a two-window
    # allowance let the unverified set ratchet). The backlog is the
    # BUDGET for new queries in the round that creates it.
    assert len(unverified) <= 50, (
        "unverified backlog exceeds ONE driver window — "
        "stop adding queries until the gate catches up"
    )
    # the mechanism, not the snapshot: an unknown name is never verified
    fake = dict(entry.queries())
    fake["__brand_new_query__"] = fake[qs[0]]
    assert list(entry._prioritize(fake))[: len(unverified) + 1][-1] in fake
    assert "__brand_new_query__" in list(entry._prioritize(fake))[
        : len(unverified) + 1
    ]
    # verified tail rotates by STALENESS: least-recently-green first
    latest = entry._verified_latest_round()
    tail_rounds = [latest[n] for n in qs[len(unverified):]]
    assert tail_rounds == sorted(tail_rounds)


def test_driver_verified_reads_round_files():
    v = entry._driver_verified()
    # r01-r03 are committed: the long-green core families must be in it
    for name in ("quality_scores", "exact_dedup", "tpch_q1"):
        assert name in v, name


def test_oracle_sql_is_text():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name
