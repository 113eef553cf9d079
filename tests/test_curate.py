"""End-to-end curation plan: funnel consistency, stage-order semantics,
hostile rows, and the no-pushdown filter barrier (the filter(keep)
codegen-overflow regression)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators.rules import apply_quality, filter_scored
from metadata_quality_stack_spark.plans.curate import curate, curation_accounting

META = {"lang": "lang", "source": "source", "n_chars": "n_chars"}


def _docs(spark):
    good = "The quick brown fox jumps over the lazy dog and then ran away. " * 8
    rows = []
    for i in range(40):
        rows.append((i, good + f"tail {i % 10}", "en", f"src{i % 4}"))  # 10 dup groups of 4
    rows += [(100, "", "en", "src0"), (101, "   ", None, None)]  # hostile
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    return df.withColumn("n_chars", F.length("text"))


def test_funnel_accounting_consistent(spark):
    docs = _docs(spark)
    funnel = {r.stage: r.n for r in
              curation_accounting(docs, meta_cols=META, sample_pct=100,
                                  per_source_cap=2).collect()}
    assert funnel["input"] == 42
    assert funnel["quality_kept"] == 40           # hostile rows dropped
    assert funnel["unique"] == 10                 # 10 distinct texts
    assert funnel["sampled"] == 10                # 100% sample
    assert funnel["capped"] <= funnel["sampled"]
    out = curate(docs, meta_cols=META, sample_pct=100, per_source_cap=2)
    assert out.count() == funnel["capped"]
    # canonical copy = min doc_id of each dup group
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert all(i < 10 for i in ids)


def test_cap_applies_after_dedup_and_sample(spark):
    docs = _docs(spark)
    out = curate(docs, meta_cols=META, per_source_cap=1)
    per_src = out.groupBy("source").count().collect()
    assert all(r["count"] <= 1 for r in per_src)


def test_export_roundtrip_and_pruning(spark, tmp_path):
    import os

    from pyspark.sql import functions as SF

    from metadata_quality_stack_spark.plans.curate import export_curated

    docs = _docs(spark).withColumn(
        "lang", SF.coalesce(SF.col("lang"), SF.lit("und"))
    )
    out = curate(docs, meta_cols=META)
    d = str(tmp_path / "export")
    manifest = export_curated(out, d, fmt="parquet", partition_by="lang")
    assert manifest["rows"] == out.count()
    assert any(p.startswith("lang=") for p in os.listdir(d))
    back = spark.read.option("basePath", d).parquet(d)
    assert back.count() == manifest["rows"]
    # JSONL flavor for line-based loaders
    d2 = str(tmp_path / "export_json")
    m2 = export_curated(out, d2, fmt="json", partition_by=None)
    assert m2["rows"] == manifest["rows"]


def test_filter_scored_blocks_pushdown(spark):
    """The observe barrier must keep the keep-filter above the scoring
    projections: the pushed-down form inlines a ~36KB condition at the
    scan and overflows codegen (the regression this guards against)."""
    docs = _docs(spark)
    scored = apply_quality(docs, meta_cols=META)
    flt = filter_scored(scored, F.col("keep"))
    opt = flt._jdf.queryExecution().optimizedPlan().toString()
    # the barrier node is present and the filter condition is tiny (an
    # attribute test, not an inlined expression tree)
    assert "CollectMetrics" in opt
    filter_lines = [ln for ln in opt.splitlines() if ln.strip().startswith(("Filter", "+- Filter", ":- Filter")) or "Filter " in ln]
    assert filter_lines and all(len(ln) < 500 for ln in filter_lines), filter_lines
    assert flt.count() == 40
