"""Bucketed results tables: co-located joins without shuffles.

The quality-filter results are re-joined constantly downstream (scores
back to pages for export, dedup clusters to scores, per-url audits). At
100 TB every such equi-join shuffles BOTH sides unless the storage
layout already co-locates equal keys. Spark bucketing is that layout:
``bucketBy(n, key)`` writes each bucket's rows into dedicated files plus
catalog metadata, and a join of two tables bucketed the same way
compiles to a SortMergeJoin with ZERO Exchange — the join cost becomes a
local sort-merge per bucket.

This is the storage-side twin of sources/sink.py's commit buckets: the
sink's ``bucket=`` dirs give resumable writes and partition-pruned
reads; catalog bucketing gives shuffle-free joins. A production deploy
uses Iceberg's ``bucket(n, url)`` partition transform for the same
effect; the mechanism here is the built-in catalog so the plan shape is
testable in this sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (+ sorted within buckets) catalog table.
    Sorting by the bucket key lets the bucketed join skip its sort too."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Equi-join of two co-bucketed tables — shuffle-free by layout."""
    return spark.table(left_table).join(spark.table(right_table), on)
