"""Packaging/deploy test: the engine ships as a --py-files zip and runs
end-to-end through spark-submit (north rule: "run via spark-submit
--py-files"), producing the resumable manifest + metrics sidecar.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_pyfiles_job(spark, tmp_path):
    sys.path.insert(0, REPO)
    from metadata_quality_stack_spark.sources.pages import generate_pages
    from tools.build_pyfiles import build

    zip_path = build(str(tmp_path / "engine.zip"))
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    pdf = generate_pages(120, seed=5).drop(columns=["row_class"])
    spark.createDataFrame(pdf).repartition(2).write.parquet(pages_dir)
    n_blocked = sum(pdf.url.str.contains("//medium.example.org/"))
    assert n_blocked > 0
    bl_path = str(tmp_path / "blocked.txt")
    with open(bl_path, "w") as f:
        f.write("medium.example.org\n\n")  # blank line must be ignored

    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "job.py"),
            "--input", pages_dir, "--output", out_dir, "--buckets", "4",
            "--blocklist", bl_path,
        ],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(
        [line for line in proc.stdout.splitlines() if line.startswith("{")][-1]
    )
    assert stats["rows"] == 120 - n_blocked  # blocked domain never scored
    assert 0 < stats["kept"] < 120 - n_blocked
    manifest = json.load(open(os.path.join(out_dir, "_manifest.json")))
    assert len(manifest) == 4
    result = spark.read.parquet(os.path.join(out_dir, "bucket=*"))
    assert result.count() == 120 - n_blocked
    assert os.path.isdir(os.path.join(out_dir, "_metrics", "lang_histogram"))
    # the blocked domain never reaches the results table
    from pyspark.sql import functions as F

    assert (
        result.filter(F.col("url").contains("//medium.example.org/")).count()
        == 0
    )
    # commit buckets are keyed on the CANONICAL url: every row's bucket
    # dir must equal pmod(xxhash64(url_norm), buckets), so recrawl
    # variants of one page can never split across commit buckets
    result2 = spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "bucket=*")
    )
    assert "url_norm" in result2.columns
    mismatched = result2.filter(
        F.pmod(F.xxhash64(F.col("url_norm")), F.lit(4)) != F.col("bucket")
    ).count()
    assert mismatched == 0
