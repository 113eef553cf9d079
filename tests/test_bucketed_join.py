"""Co-located bucketed join: two tables bucketed on the join key must
join with ZERO Exchange (the storage layout replaces the shuffle)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators.analytics import scored_documents
from metadata_quality_stack_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)


def plan_str(df, mode="simple"):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scores = scored_documents(docs).select("doc_id", "total_score", "keep")
    meta = docs.select("doc_id", "source", "lang")
    try:
        write_bucketed(scores, "t_scores", "doc_id", 8,
                       path=str(tmp_path / "scores"))
        write_bucketed(meta, "t_meta", "doc_id", 8,
                       path=str(tmp_path / "meta"))
        # force a non-broadcast join so the shuffle question is real
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, "t_scores", "t_meta", "doc_id")
            plan = plan_str(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # and the result is right
            assert joined.count() == docs.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_scores")
        spark.sql("DROP TABLE IF EXISTS t_meta")


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join over plain parquet shuffles both sides —
    the bucketed layout is what removes the Exchanges."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.select("doc_id", "n_chars")
    b = docs.select("doc_id", "lang")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_str(a.join(b, "doc_id"))
        assert plan.count("Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
