"""Isolated A/B of argmin-with-payload (curate's canonical-per-
fingerprint dedup) formulations. min_by with STRING values silently
compiles to SortAggregate (hash agg needs fixed-width buffers), so this
measures what that sort actually costs against two hash-aggregable
rewrites, on synthetic slim rows shaped like curate's dedup input
(no scoring UDFs — pure aggregate-stage comparison).

  S  status quo: min_by(string, long) -> SortAggregate
  H  hash agg (min id + min_by int) + re-join raw (doc_id, source, lang)
  D  hash agg over xxhash64(source/lang) + broadcast dict decode

Usage: python tools/argmin_bench.py [n_rows] [dup_factor] [reps]
Interleaves variants; prints per-rep and best-of wall times.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dup = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from pyspark.sql import functions as F

    from metadata_quality_stack_spark import get_spark

    spark = get_spark(app_name="argmin-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # slim rows: ~n/dup distinct fingerprints, unique doc_id, 20 sources
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.md5(F.conv(F.col("id") % (n // dup), 10, 16)).alias("fingerprint"),
            F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
            F.concat(F.lit("l"), (F.col("id") % 7).cast("string")).alias("lang"),
            (F.col("id") % 400).cast("int").alias("total_score"),
        )
        .localCheckpoint()  # freeze input so variants measure agg only
    )
    meta = base.select("doc_id", "source", "lang").localCheckpoint()

    def variant_s():
        return base.groupBy("fingerprint").agg(
            *[
                F.min_by(c, "doc_id").alias(c)
                for c in ("doc_id", "source", "lang", "total_score")
            ]
        )

    def variant_h():
        ids = base.groupBy("fingerprint").agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("total_score", "doc_id").alias("total_score"),
        )
        return ids.join(meta, "doc_id")

    def variant_d():
        enc = base.select(
            "fingerprint",
            "doc_id",
            "total_score",
            F.xxhash64("source").alias("src_h"),
            F.xxhash64("lang").alias("lang_h"),
        )
        agg = enc.groupBy("fingerprint").agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("total_score", "doc_id").alias("total_score"),
            F.min_by("src_h", "doc_id").alias("src_h"),
            F.min_by("lang_h", "doc_id").alias("lang_h"),
        )
        src_d = meta.select("source").distinct().select(
            F.xxhash64("source").alias("src_h"), "source"
        )
        lang_d = meta.select("lang").distinct().select(
            F.xxhash64("lang").alias("lang_h"), "lang"
        )
        return (
            agg.join(F.broadcast(src_d), "src_h")
            .join(F.broadcast(lang_d), "lang_h")
            .drop("src_h", "lang_h")
        )

    variants = {"S": variant_s, "H": variant_h, "D": variant_d}
    # verify identical results once
    rows = {}
    for k, v in variants.items():
        rows[k] = sorted(
            map(tuple, v().select("fingerprint", "doc_id", "source", "lang", "total_score").collect())
        )
        plan = v()._jdf.queryExecution().executedPlan().toString()
        aggs = [
            w
            for w in ("SortAggregate", "HashAggregate")
            if w in plan
        ]
        print(f"{k}: aggs={aggs} rows={len(rows[k])}")
    assert rows["S"] == rows["H"] == rows["D"], "variants disagree!"

    best = {k: float("inf") for k in variants}
    for r in range(reps):
        for k, v in variants.items():
            t0 = time.time()
            v().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[k] = min(best[k], dt)
            print(f"rep{r} {k}: {dt:.2f}s")
    print("BEST:", {k: round(v, 2) for k, v in best.items()})


if __name__ == "__main__":
    main()
