"""Count-min sketch + histogram quantiles: overestimate guarantee,
shard mergeability, absent-term zero, quantile correctness within one
bin, the anti-reinlining barrier, and the DuckDB mirrors."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import analytics, cms

DOCS = "/root/testdata/sf0.001/documents.parquet"
TERMS = ["vector", "hash", "window", "nosuchterm"]


def test_cms_never_undercounts(spark):
    docs = spark.read.parquet(DOCS)
    true = {
        r.term: r.cnt
        for r in docs.select(F.explode(cms._tokens()).alias("term"))
        .filter(F.col("term").isin([t for t in TERMS]))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    est = {r.term: r.est_count for r in cms.cms_term_counts(docs, TERMS).collect()}
    for t in TERMS:
        assert est[t] >= true.get(t, 0)
    assert est["nosuchterm"] >= 0


def test_cms_exact_on_tiny_vocab(spark):
    # far fewer distinct terms than w: no collisions, estimates exact
    docs = spark.createDataFrame(
        [(0, "apple apple pear"), (1, "apple fig")], "doc_id long, text string"
    )
    est = {r.term: r.est_count for r in cms.cms_term_counts(docs, ["apple", "pear", "kiwi"]).collect()}
    assert est == {"apple": 3, "pear": 1, "kiwi": 0}


def test_cms_sketch_merges_by_cell_sum(spark):
    docs = spark.read.parquet(DOCS)
    whole = cms.cms_build(docs).toPandas().set_index(["row", "cell"]).cnt
    parts = [
        cms.cms_build(docs.filter(F.col("doc_id") % 2 == i)) for i in range(2)
    ]
    merged = (
        parts[0]
        .unionByName(parts[1])
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
        .toPandas()
        .set_index(["row", "cell"])
        .cnt
    )
    pd.testing.assert_series_equal(
        whole.sort_index(), merged.sort_index(), check_dtype=False
    )


def test_cms_oracle_matches(spark):
    docs = spark.read.parquet(DOCS)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    sp = (
        cms.cms_term_counts(docs, TERMS)
        .toPandas()
        .sort_values("term")
        .reset_index(drop=True)
        .astype({"est_count": "int64"})
    )
    dk = (
        con.execute(cms.cms_term_counts_sql(TERMS))
        .fetchdf()
        .sort_values("term")
        .reset_index(drop=True)
        .astype({"est_count": "int64"})
    )
    pd.testing.assert_frame_equal(sp, dk)


def test_hist_quantiles_within_one_bin_of_exact(spark):
    df = spark.range(10_000).selectExpr("id AS v")
    got = {r.q: r.value_lower_edge for r in cms.hist_quantiles(df, "v", 0, 10_240, 256).collect()}
    width = 10_240 // 256
    for q in (1, 25, 50, 75, 99):
        exact = q * 10_000 // 100
        assert abs(got[q] - exact) <= width


def test_hist_clamps_out_of_domain(spark):
    df = spark.createDataFrame([(-5,), (9999,), (10,)], "v long")
    bins = {r.bin: r.cnt for r in cms.hist_sketch(df, "v", 0, 100, 10).collect()}
    # -5 clamps to bin 0, 9999 clamps to bin 9, 10 lands in [10,20)
    assert bins == {0: 1, 1: 1, 9: 1}


def test_hist_on_computed_score_does_not_reinline(spark):
    """The observe barrier keeps the 21-rule scoring tree OUT of the
    binning stage: the scan's data filters stay empty-ish and the plan
    stays small (pre-barrier this query stalled for minutes)."""
    import time

    docs = spark.read.parquet(DOCS)
    scored = analytics.scored_documents(docs)
    t0 = time.time()
    rows = cms.hist_quantiles(scored, "total_score", 0, 512).collect()
    assert len(rows) == 5
    assert time.time() - t0 < 60


def test_hist_oracle_matches(spark):
    from metadata_quality_stack_spark.oracle import sqlgen

    docs = spark.read.parquet(DOCS)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    scored = analytics.scored_documents(docs)
    sp = (
        cms.hist_quantiles(scored, "total_score", 0, 512)
        .toPandas()
        .sort_values("q")
        .reset_index(drop=True)
        .astype("int64")
    )
    dk = (
        con.execute(
            cms.hist_quantiles_sql(
                "total_score", 0, 512,
                from_clause=f"({sqlgen.native_scoring_sql()})",
            )
        )
        .fetchdf()
        .sort_values("q")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(sp, dk)
