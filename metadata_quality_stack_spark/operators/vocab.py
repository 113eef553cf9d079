"""Vocabulary membership — the reference's most important implicit join
(SURVEY.md §2.3 J1/J2): "is this value in the allowed set?" scored as
(compliant_count, population) per record.

Reference semantics replicated exactly:

* `VocabularyComplianceChecker.check` (`src/api/validators.py:417-429`):
  hash-set probe per value; only URI-shaped values can match — literal
  values inflate the denominator and never match (`:425-427`).
* Headerless-CSV header swallow (`src/api/validators.py:385-415` uses
  ``csv.DictReader`` on a header-less file): the FIRST vocabulary row is
  consumed as the header and is never in the allowed set. ``load_vocab``
  reproduces this quirk by default — do not "fix" it (SURVEY.md §4.3 #3).
* Label-chase fallback (`VocabularyLabelComplianceChecker_NTI.check`,
  `src/api/validators.py:605-646`): match a lowercased label list, else
  substring-of-value containment.

Spark mapping: the vocabulary is tiny (7..2,108 rows in the reference) —
it rides as a broadcast literal set compiled into native expressions
(`isin` / chained contains), i.e. a broadcast hash semi-join that never
shuffles the big side. At 100 TB this is the only sane plan; Catalyst
would pick BroadcastHashJoin for a table-form vocabulary too, but the
literal-set compile keeps the probe inside whole-stage codegen with zero
join machinery.
"""

from __future__ import annotations

import csv

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

URI_RE = "^https?://"  # the web-doc analog of "is a URIRef"


def load_vocab(
    path: str, column: int = 0, emulate_header_swallow: bool = True
) -> list[str]:
    """Read an allowed-value vocabulary from a headerless CSV.

    ``emulate_header_swallow=True`` drops the first data row, mirroring the
    reference's csv.DictReader-on-headerless-file bug (validators.py:402:
    access_rights.csv loses CONFIDENTIAL; 6 of 7 rows usable)."""
    with open(path, newline="") as f:
        rows = [r[column].strip() for r in csv.reader(f) if len(r) > column]
    return rows[1:] if emulate_header_swallow else rows


def membership(value: Column, allowed: list[str], uri_only: bool = True) -> Column:
    """Boolean probe: value in the broadcast set. With ``uri_only`` only
    URI-shaped values can match (J1's literal-never-matches rule)."""
    hit = value.isin(allowed)
    if uri_only:
        hit = hit & value.rlike(URI_RE)
    return F.coalesce(hit, F.lit(False))


def label_membership(value: Column, labels: list[str]) -> Column:
    """J2 fallback semantics: lowercased value equals a label, OR a label
    is a substring of the lowercased value (validators.py:627)."""
    low = F.lower(F.trim(value))
    hit = low.isin([label.lower() for label in labels])
    for label in labels:
        hit = hit | F.contains(low, F.lit(label.lower()))
    return F.coalesce(hit, F.lit(False))


def vocabulary_compliance(
    df: DataFrame,
    values_col: str,
    allowed: list[str],
    id_col: str = "doc_id",
    uri_only: bool = True,
) -> DataFrame:
    """Per-record (compliant, population, pct) over an array column of
    values — the J1 checker as a per-row ARRAY REDUCTION, fully map-only
    (the 'join' is the broadcast literal set compiled into the filter
    lambdas). The earlier explode_outer + groupBy(doc_id) formulation
    paid an exchange of |values| rows to compute what is a per-row
    expression (VERDICT r2 'What's wrong #3') — at 3-element arrays that
    was noise, at 100 TB it was the wrong shape. No Exchange in this
    plan (asserted in tests/test_plan_shapes.py)."""
    vals = F.coalesce(F.col(values_col), F.array().cast("array<string>"))

    def _hit(v: Column) -> Column:
        h = v.isin(allowed)
        if uri_only:
            h = h & v.rlike(URI_RE)
        return h

    population = F.size(F.filter(vals, lambda v: v.isNotNull()))
    compliant = F.size(F.filter(vals, lambda v: v.isNotNull() & _hit(v)))
    return df.select(
        F.col(id_col),
        compliant.cast("long").alias("compliant"),
        population.cast("long").alias("population"),
        F.coalesce(
            compliant.cast("double")
            / F.nullif(population.cast("double"), F.lit(0.0)),
            F.lit(0.0),
        ).alias("pct"),
    )


def url_status_compliance(docs: DataFrame) -> DataFrame:
    """J7 — the reference's URL-status enrichment (accessURL/downloadURL
    probe results joined back into scoring, validators.py checker family).
    Per-record network I/O is externalized by design (never driver-side
    HTTP in a Spark job); the probe results arrive as a STATUS DIMENSION
    keyed by source/host, broadcast-joined to the corpus — the only sane
    shape at 100 TB (the dim is |hosts|-sized, the fact side never
    shuffles). Here the dim is synthesized deterministically from the
    source key (status derived from its hash class), standing in for the
    crawler's fetch-status sidecar table.

    Output: per-source doc counts with their status and OK rate."""
    status_dim = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            F.when(F.length("source") % 7 == 0, F.lit(404))
            .when(F.length("source") % 5 == 0, F.lit(503))
            .otherwise(F.lit(200))
            .alias("status"),
        )
    )
    joined = docs.join(F.broadcast(status_dim), "source")
    return (
        joined.groupBy("source", "status")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("ok", F.col("status") == 200)
    )


def source_compliance(
    docs: DataFrame, allowed_sources: list[str]
) -> DataFrame:
    """Corpus-level compliance of the ``source`` column against a broadcast
    allow-list (scalar-value J1: population = docs with a value)."""
    hit = F.col("source").isin(allowed_sources)
    return docs.agg(
        F.sum(F.when(F.col("source").isNotNull() & hit, 1).otherwise(0)).alias(
            "compliant"
        ),
        F.sum(F.when(F.col("source").isNotNull(), 1).otherwise(0)).alias("population"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("source").isNotNull() & hit, 1).otherwise(0)).cast(
                    "double"
                )
                / F.nullif(
                    F.sum(F.when(F.col("source").isNotNull(), 1).otherwise(0)).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("pct"),
    )
