"""Train/eval decontamination: flag training documents that share word
n-grams with an evaluation set.

The standard pre-training hygiene step (publicly described in the GPT-3
appendix and the Dolma/RedPajama pipelines): any training document that
shares an n-gram with a benchmark document is flagged (and usually
dropped) so downstream eval numbers aren't inflated by memorized test
data. The reference stack has no analog — this sits on the
beyond-reference training-data axis (SURVEY.md §2.9/§6), reusing the
same 3-word shingle definition as the MinHash dedup family
(operators/dedup.py) so one shingle extraction serves both.

Scale shape (100 TB train side, benchmark-suite-sized eval side):

* The eval shingle set is DISTINCT'd then broadcast — benchmarks are
  MBs, not TBs, so the big side never shuffles: explode + broadcast
  hash join + partial-aggregated groupBy(doc_id) is map-heavy with one
  exchange on doc_id (bounded by #contaminated docs, not #shingles).
* Shingle explosion stays JVM-side (same native `transform`/`slice`
  expressions as dedup.py — no Python in the hot path).
* Here eval is carved out of the one `documents` table by a
  deterministic id rule (doc_id % eval_mod == 0) because the sandbox
  must synthesize its own eval split; in production the two sides are
  separate tables and each is scanned once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators.dedup import _shingles, shingles_sql

EVAL_MOD = 41  # doc_id % EVAL_MOD == 0 -> held-out "benchmark" doc


def decontaminate(docs: DataFrame, eval_mod: int = EVAL_MOD) -> DataFrame:
    """Per-train-doc contamination report: distinct shingles shared with
    the eval split. Returns only contaminated docs (n_shared >= 1) —
    the actionable set; clean docs are the complement by doc_id.

    Columns: doc_id, n_shingles (distinct shingles in the doc),
    n_shared (of those, how many appear in ANY eval doc),
    contamination_ratio = n_shared / n_shingles.
    """
    arr = docs.select("doc_id", _shingles(F.col("text")).alias("arr"))
    ev = (
        arr.filter(F.col("doc_id") % eval_mod == 0)
        .select(F.explode("arr").alias("s"))
        .distinct()
    )
    tr = arr.filter(F.col("doc_id") % eval_mod != 0).select(
        "doc_id",
        F.size("arr").cast("long").alias("n_shingles"),
        F.explode("arr").alias("s"),
    )
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.count("*").alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias(
                "contamination_ratio"
            ),
        )
    )


def decontaminate_sql(table: str = "documents", eval_mod: int = EVAL_MOD) -> str:
    """DuckDB mirror of :func:`decontaminate` (same shingle definition)."""
    return f"""
WITH arr AS (SELECT doc_id, {shingles_sql("text")} AS arr FROM {table}),
ev AS (SELECT DISTINCT unnest(arr) AS s FROM arr WHERE doc_id % {eval_mod} = 0),
tr AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_shingles, unnest(arr) AS s
       FROM arr WHERE doc_id % {eval_mod} <> 0)
SELECT tr.doc_id,
       any_value(n_shingles) AS n_shingles,
       count(*) AS n_shared,
       round(count(*) / any_value(n_shingles), 6) AS contamination_ratio
FROM tr JOIN ev USING (s)
GROUP BY tr.doc_id
"""
