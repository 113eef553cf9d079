"""Corpus shaping operators for training-data pipelines: deterministic
sampling, per-key quotas, score quantiles.

These are the operations a 100 TB curation run does between scoring and
export: carve a stable dev split, cap any one domain's contribution, and
read the score distribution before choosing thresholds. All native
expressions; the sample bucket is md5-derived (not engine-internal
xxhash) so the DuckDB oracle computes identical membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SAMPLE_BUCKETS = 100


def sample_bucket(id_col: F.Column) -> F.Column:
    """Stable 0..99 bucket from md5 of the stringified id — content-
    derived, so the same document lands in the same split across runs,
    clusters, and engines (the property rand()-sampling lacks)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 7), 16, 10).cast(
            "long"
        )
        % SAMPLE_BUCKETS
    )


def deterministic_sample(
    df: DataFrame, id_col: str = "doc_id", rate_pct: int = 10
) -> DataFrame:
    """Keep ~rate_pct% of rows, selected by content hash. Map-only: the
    predicate evaluates inside the scan stage, no shuffle, and composes
    with partition pruning upstream."""
    return df.filter(sample_bucket(F.col(id_col)) < rate_pct)


def cap_per_key(
    df: DataFrame, key_col: str, n: int, order_col: str
) -> DataFrame:
    """At most ``n`` rows per key, deterministic preference order — the
    per-domain quota every crawl-curation pipeline applies so one hot
    domain cannot dominate the corpus. One shuffle on the key; skewed
    keys are exactly the rows being truncated, and AQE's skew-join
    splitting applies to the window exchange."""
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def score_quantiles(
    scored: DataFrame, probs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9)
) -> DataFrame:
    """Exact score quantiles (linear interpolation — Spark ``percentile``
    == DuckDB ``quantile_cont``), the threshold-choosing readout. Exact,
    not approx_percentile: the oracle must match bit-for-bit; at 100 TB
    swap in approx_percentile(…, accuracy) behind the same column names."""
    return scored.agg(
        *[
            F.round(
                F.expr(f"percentile(total_score, {p!r})"), 4
            ).alias(f"p{int(p * 100)}")
            for p in probs
        ]
    )
