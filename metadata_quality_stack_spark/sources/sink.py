"""Append-only results sink with an Iceberg-style snapshot manifest for
mid-run resume (north rule: "resumable from checkpoint with per-partition
lineage + metrics").

Unit of commit = bucket (pmod(xxhash64(url), n_buckets)). At 100 TB the
bucket is the input's physical partition (crawl shard / warc day) so each
incremental pass prunes at the scan; here buckets are hash-derived because
the toy corpus is one file. Protocol per bucket:

  1. write parquet to  <out>/bucket=<b>/        (overwrite -> idempotent)
  2. append {bucket, rows, kept, wall_s} to <out>/_manifest.json (atomic
     rename), including per-bucket lineage metrics

A rerun skips every bucket already in the manifest; a bucket killed
mid-write is simply overwritten on the next run — no duplicates
(SURVEY.md §5.2 item 6 kill-and-rerun test).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotManifest:
    def __init__(self, out_dir: str) -> None:
        self.path = os.path.join(out_dir, "_manifest.json")
        self.entries: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.entries = json.load(f)

    def done(self, bucket: int) -> bool:
        return str(bucket) in self.entries

    def commit(self, bucket: int, info: dict) -> None:
        self.entries[str(bucket)] = info
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.entries, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)  # atomic snapshot swap


def run_incremental(
    spark: SparkSession,
    input_df: DataFrame,
    out_dir: str,
    transform,
    key_col: str = "url",
    n_buckets: int = 8,
    fail_after: int | None = None,
    partition_by: str | None = None,
) -> dict:
    """Run ``transform(bucket_df)`` bucket-by-bucket with checkpointed
    commits. ``fail_after`` injects a crash after N buckets (tests).

    ``partition_by`` (e.g. a ``day`` column the transform emits) layers a
    hive-partitioned layout inside each bucket — downstream readers that
    filter on it get partition pruning at the scan (the 100 TB results
    table is day × bucket)."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = SnapshotManifest(out_dir)
    bucket_col = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    done = 0
    for b in range(n_buckets):
        if manifest.done(b):
            continue
        t0 = time.time()
        part = input_df.filter(bucket_col == b)
        result = transform(part)
        path = os.path.join(out_dir, f"bucket={b}")
        writer = result.write.mode("overwrite")
        if partition_by and partition_by in result.columns:
            writer = writer.partitionBy(partition_by)
        writer.parquet(path)
        written = spark.read.parquet(path)
        aggs = [
            F.count("*").alias("rows"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("kept"),
        ]
        if "scrub_count" in written.columns:
            aggs.append(F.sum("scrub_count").alias("scrubbed"))
        stats = written.agg(*aggs).collect()[0]
        entry = {
            "rows": int(stats["rows"]),
            "kept": int(stats["kept"] or 0),
            "wall_s": round(time.time() - t0, 3),
        }
        if "scrub_count" in written.columns:
            entry["scrubbed"] = int(stats["scrubbed"] or 0)
        if "drop_reasons" in written.columns:
            # per-bucket lineage: why documents were dropped, histogram
            entry["drop_reasons"] = {
                r["reason"]: r["n"]
                for r in written.select(
                    F.explode("drop_reasons").alias("reason")
                )
                .groupBy("reason")
                .agg(F.count("*").alias("n"))
                .collect()
            }
        manifest.commit(b, entry)
        done += 1
        if fail_after is not None and done >= fail_after:
            raise RuntimeError(f"injected failure after {done} buckets")
    return {
        "buckets": n_buckets,
        "rows": sum(e["rows"] for e in manifest.entries.values()),
        "kept": sum(e["kept"] for e in manifest.entries.values()),
    }


def read_results(spark: SparkSession, out_dir: str) -> DataFrame:
    # basePath so nested hive layouts (bucket=*/day=*) unify into one read
    # with bucket and any inner partition columns exposed for pruning
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "bucket=*")
    )
