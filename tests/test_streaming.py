"""Structured Streaming lift: streaming result == batch result on the same
input, checkpointed resume skips committed files, watermarked window agg.
"""

import pytest
from pyspark.sql import functions as F

from metadata_quality_stack_spark.plans.pipeline import quality_pipeline
from metadata_quality_stack_spark.sources.pages import generate_pages
from metadata_quality_stack_spark.streaming.stream import (
    stream_lang_histogram,
    stream_quality,
)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    pdf = generate_pages(200, seed=11).drop(columns=["row_class"])
    spark.createDataFrame(pdf).repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_stream_matches_batch(spark, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_quality(spark, pages_dir, out, ckpt)
    q.awaitTermination(120)

    streamed = spark.read.parquet(out)
    batch = quality_pipeline(
        spark.read.parquet(pages_dir), id_cols=("url", "warc_ts"), lang_col="lang"
    )
    cols = ["url", "total_score", "rating", "keep", "scrubbed_text"]
    s = sorted(tuple(r) for r in streamed.select(*cols).collect())
    b = sorted(tuple(r) for r in batch.select(*cols).collect())
    assert s == b


def test_stream_resume_no_duplicates(spark, pages_dir, tmp_path):
    """availableNow run, then new files land, then a second run with the
    SAME checkpoint: only new files processed, no duplicate urls."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_quality(spark, pages_dir, out, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    extra = generate_pages(50, seed=99).drop(columns=["row_class"])
    extra["url"] = extra["url"] + "/late"
    spark.createDataFrame(extra).coalesce(1).write.mode("append").parquet(pages_dir)

    stream_quality(spark, pages_dir, out, ckpt).awaitTermination(120)
    result = spark.read.parquet(out)
    assert result.count() == n1 + 50
    dups = (
        result.groupBy("url").count().filter(F.col("count") > 1).count()
    )
    assert dups == 0


def test_windowed_lang_histogram(spark, pages_dir, tmp_path):
    agg = stream_lang_histogram(spark, pages_dir, watermark="1 hour", window_size="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("lang_hist")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT lang, sum(n_docs) AS n FROM lang_hist GROUP BY lang"
    ).collect()
    want = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(pages_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r["lang"]: r["n"] for r in got} == want
