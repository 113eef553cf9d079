"""Kill-and-rerun resume test (SURVEY.md §5.2 item 6): inject a crash
mid-run, rerun, and require the final table to be identical to a
one-shot run — no duplicates, no holes."""

import shutil
import tempfile

import pytest

from metadata_quality_stack_spark.plans.pipeline import quality_pipeline
from metadata_quality_stack_spark.sources.pages import pages_spark_df
from metadata_quality_stack_spark.sources.sink import (
    SnapshotManifest,
    read_results,
    run_incremental,
)


def _transform(df):
    return quality_pipeline(df, id_cols=("url",), lang_col="lang", include_text=False)


def test_kill_and_rerun_identical(spark):
    docs = pages_spark_df(spark, n_rows=300, seed=13)
    one_shot_dir = tempfile.mkdtemp()
    resumed_dir = tempfile.mkdtemp()
    try:
        run_incremental(spark, docs, one_shot_dir, _transform, n_buckets=6)

        with pytest.raises(RuntimeError, match="injected failure"):
            run_incremental(
                spark, docs, resumed_dir, _transform, n_buckets=6, fail_after=2
            )
        m = SnapshotManifest(resumed_dir)
        assert len(m.entries) == 2  # partial progress persisted

        summary = run_incremental(spark, docs, resumed_dir, _transform, n_buckets=6)
        assert summary["rows"] == 300

        a = read_results(spark, one_shot_dir).orderBy("url").toPandas()
        b = read_results(spark, resumed_dir).orderBy("url").toPandas()
        a = a[sorted(a.columns)].reset_index(drop=True)
        b = b[sorted(b.columns)].reset_index(drop=True)
        assert len(a) == len(b) == 300
        assert a["url"].is_unique and b["url"].is_unique
        for c in a.columns:
            if c == "drop_reasons":
                assert [list(x) for x in a[c]] == [list(x) for x in b[c]]
            else:
                assert (a[c] == b[c]).all(), c
    finally:
        shutil.rmtree(one_shot_dir, ignore_errors=True)
        shutil.rmtree(resumed_dir, ignore_errors=True)


def test_single_scan_regardless_of_buckets(spark):
    """The sink must process all uncommitted buckets in ONE pass over the
    input: transform is invoked once, not once per bucket (the per-bucket
    full-rescan anti-pattern from round 1)."""
    docs = pages_spark_df(spark, n_rows=200, seed=23)
    out = tempfile.mkdtemp()
    calls = []

    def counting_transform(df):
        calls.append(1)
        return _transform(df)

    try:
        stats = run_incremental(
            spark, docs, out, counting_transform, n_buckets=8
        )
        assert stats["rows"] == 200
        assert len(calls) == 1
        # resume path: 3 committed, 5 remaining -> still one transform call
        m = SnapshotManifest(out)
        for b in (0, 1, 2):
            del m.entries[str(b)]
        m.commit(3, m.entries["3"])  # persist the trimmed manifest
        del calls[:]
        stats = run_incremental(
            spark, docs, out, counting_transform, n_buckets=8
        )
        assert stats["rows"] == 200
        assert len(calls) == 1
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_rerun_skips_completed(spark):
    docs = pages_spark_df(spark, n_rows=120, seed=17)
    out = tempfile.mkdtemp()
    try:
        run_incremental(spark, docs, out, _transform, n_buckets=4)
        m1 = SnapshotManifest(out).entries.copy()
        run_incremental(spark, docs, out, _transform, n_buckets=4)
        m2 = SnapshotManifest(out).entries
        assert m1 == m2  # second run did nothing (wall_s identical)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_bounded_files_per_bucket(spark, tmp_path):
    """Small-files bound (VERDICT r2 #4): the sink's (bucket, salt)
    repartition means each bucket=<b>/ dir receives parquet files from at
    most n_salts tasks — NOT one file per write task per bucket. With 32
    shuffle partitions and 8 buckets the unbounded layout would emit up
    to 32 files per dir; the bound is n_salts=4."""
    import os

    docs = pages_spark_df(spark, n_rows=400, seed=29)
    out = str(tmp_path / "out")
    n_salts = 4
    stats = run_incremental(
        spark, docs, out, _transform, n_buckets=8, n_salts=n_salts
    )
    assert stats["rows"] == 400
    for d in os.listdir(out):
        if not d.startswith("bucket="):
            continue
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet")
        ]
        assert 1 <= len(files) <= n_salts, (d, files)
    # resume after trimming the manifest still lands exact rows
    m = SnapshotManifest(out)
    for b in (0, 1):
        del m.entries[str(b)]
    m.commit(2, m.entries["2"])
    stats = run_incremental(
        spark, docs, out, _transform, n_buckets=8, n_salts=n_salts
    )
    assert stats["rows"] == 400
    assert read_results(spark, out).count() == 400


def test_day_partitioned_sink_prunes(spark, tmp_path):
    """partition_by layers day=... dirs inside each bucket; a day filter
    on the reader hits partition pruning (PartitionFilters in the scan)."""
    import io
    import os
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from metadata_quality_stack_spark.plans.pipeline import quality_pipeline
    from metadata_quality_stack_spark.sources.pages import pages_spark_df
    from metadata_quality_stack_spark.sources.sink import run_incremental

    pages = pages_spark_df(spark, 150, seed=17)
    out = str(tmp_path / "out")

    def transform(df):
        scored = quality_pipeline(df, id_cols=("url", "warc_ts"), lang_col="lang",
                                  include_text=False)
        return scored.withColumn("day", F.to_date("warc_ts"))

    stats = run_incremental(
        spark, pages, out, transform, n_buckets=4, partition_by="day"
    )
    assert stats["rows"] == 150
    bucket0 = os.path.join(out, "bucket=0")
    assert any(d.startswith("day=") for d in os.listdir(bucket0))
    # multiple partitioned roots need basePath; bucket + day both become
    # partition columns of the unified read
    result = spark.read.option("basePath", out).parquet(
        os.path.join(out, "bucket=*")
    )
    assert result.count() == 150
    one_day = result.select("day").first()["day"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        result.filter(F.col("day") == F.lit(one_day)).explain("formatted")
    assert "PartitionFilters: [isnotnull(day" in buf.getvalue()


def test_read_pages_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    """Crawl dumps always contain mangled lines: they must degrade to
    quarantine rows, not fail the shard; html survives base64 round-trip."""
    import base64
    import json as json_mod

    from metadata_quality_stack_spark.sources.pages import read_pages_jsonl

    p = tmp_path / "dump.jsonl"
    rows = [
        {"url": "http://a.example/1", "warc_ts": "2024-01-05 10:00:00",
         "html_b64": base64.b64encode(b"<html>hi</html>").decode(),
         "text": "hi", "lang": "en"},
        {"url": "http://a.example/2", "warc_ts": "2024-01-05 11:00:00",
         "html_b64": None, "text": "bonjour le monde", "lang": "fr"},
    ]
    lines = [json_mod.dumps(r) for r in rows]
    lines.insert(1, '{"url": "http://bad.example/x", "text": "trunca')  # mangled
    p.write_text("\n".join(lines) + "\n")

    good, quarantined = read_pages_jsonl(spark, str(p))
    g = {r["url"]: r for r in good.collect()}
    assert set(g) == {"http://a.example/1", "http://a.example/2"}
    assert bytes(g["http://a.example/1"]["html"]) == b"<html>hi</html>"
    assert g["http://a.example/2"]["html"] is None
    q = quarantined.collect()
    assert len(q) == 1 and "trunca" in q[0]["_corrupt_record"]
    # the good side feeds the normal pipeline unchanged
    from metadata_quality_stack_spark.plans.pipeline import quality_pipeline

    out = quality_pipeline(good, id_cols=("url",), lang_col="lang",
                           include_text=False)
    assert out.count() == 2

def test_snapshot_time_travel(spark, tmp_path):
    """Iceberg-style snapshot log: a crashed run appends NO snapshot
    (its partial buckets become visible only in the snapshot the resume
    completes); a completed run appends one; idempotent reruns don't
    grow the log; a pinned read resolves the snapshot's bucket set via
    PARTITION pruning so unpinned bucket dirs never reach the scan."""
    import io
    import os
    from contextlib import redirect_stdout

    from metadata_quality_stack_spark.sources.sink import SnapshotLog

    docs = pages_spark_df(spark, n_rows=200, seed=21)
    out = str(tmp_path / "tt")

    with pytest.raises(RuntimeError, match="injected failure"):
        run_incremental(spark, docs, out, _transform, n_buckets=6, fail_after=2)
    # crash: partial manifest, but no snapshot — time travel can never
    # land on a half-written state
    assert len(SnapshotManifest(out).entries) == 2
    assert not os.path.exists(os.path.join(out, "_snapshots.json"))

    s = run_incremental(spark, docs, out, _transform, n_buckets=6)
    assert s["snapshot_id"] == 0
    log = SnapshotLog(out)
    assert [x["snapshot_id"] for x in log.snapshots] == [0]
    assert log.buckets_at(0) == list(range(6))

    # idempotent rerun of the finished table: same state, no new snapshot
    s2 = run_incremental(spark, docs, out, _transform, n_buckets=6)
    assert s2["snapshot_id"] == 0
    assert len(SnapshotLog(out).snapshots) == 1

    pinned = read_results(spark, out, snapshot=0)
    assert pinned.count() == 200
    buf = io.StringIO()
    with redirect_stdout(buf):
        pinned.explain()
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan

    with pytest.raises(ValueError, match="snapshot 7 not in log"):
        read_results(spark, out, snapshot=7).count()
