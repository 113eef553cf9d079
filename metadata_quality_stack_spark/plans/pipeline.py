"""The full quality-filter pipeline (north rule §3.4 target lifecycle):

    read pages -> PII scrub -> model scorers (langid, perplexity UDFs)
    -> native heuristic rules (one projection) -> weighted rollup
    -> rating -> keep/drop + drop_reasons -> results + per-partition metrics

Plan shape at 100 TB: the whole per-document stage is map-only (scan ->
project -> two Arrow UDF stages -> project); zero shuffles until the
metrics sidecar groupBys. Filters on e.g. ``lang`` push down to the
parquet/Iceberg scan; the ``html`` column is never read unless text
extraction is requested (column pruning).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metadata_quality_stack_spark import config
from metadata_quality_stack_spark.functions.scrub import scrub_columns
from metadata_quality_stack_spark.operators.rules import (
    final_scores,
    model_rule_percentages,
    scoring_stages,
)


def model_scores_udf():
    """Fused langid + perplexity scorer: one Arrow transfer of the text,
    one python worker chain, struct(lang_pred, lang_conf, ppl) out.
    Iterator form — both models build once per worker process."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("lang_pred string, lang_conf double, ppl double")
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        from metadata_quality_stack_spark.functions.langid import (
            get_model as get_langid,
        )
        from metadata_quality_stack_spark.functions.perplexity import (
            get_model as get_ppl,
        )

        lid, ppl = get_langid(), get_ppl()
        for texts in it:
            out = lid.score_batch(texts)
            out["ppl"] = ppl.score_batch(texts)
            yield out

    return _udf


def quality_pipeline(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("url",),
    lang_col: str | None = "lang",
    source_col: str | None = None,
    n_chars_col: str | None = None,
    profile: str = "webtext",
    include_text: bool = True,
    toxic_terms: list[str] | None = None,
) -> DataFrame:
    """Score + scrub every document. Returns one row per input row with:
    id cols, scrubbed_text (+scrub counts), dimension scores, total_score,
    rating, keep, drop_reasons, lang_pred, lang_conf, ppl.

    If ``text_col`` is absent but an ``html`` binary column exists, text is
    extracted first via the native byte-identical extractor
    (sources.pages.extract_text_column) — still map-only, still codegen."""
    if text_col not in df.columns and "html" in df.columns:
        from metadata_quality_stack_spark.sources.pages import extract_text_column

        df = df.withColumn(text_col, extract_text_column(F.col("html"))).drop("html")
    text = F.col(text_col)

    # Stage 1 — model scorers (the only Python in the plan; Arrow-batched,
    # iterator-form so weights build once per worker). Both models run in
    # ONE fused UDF: the document text crosses the JVM<->Python Arrow pipe
    # once, not once per model — at 100 TB the text transfer IS the cost
    # of this stage. The struct result is materialized once then
    # field-extracted, so the UDF executes once per row.
    df1 = (
        df.withColumn("_m", model_scores_udf()(text))
        .withColumn("lang_pred", F.col("_m.lang_pred"))
        .withColumn("lang_conf", F.col("_m.lang_conf"))
        .withColumn("ppl", F.col("_m.ppl"))
        .drop("_m")
        .select(*id_cols, *([lang_col] if lang_col else []),
                *(c for c in (source_col, n_chars_col) if c),
                text_col, "lang_pred", "lang_conf", "ppl")
    )

    # Stages 2-3 — features then rule percentages, as staged projections
    # (codegen locals: each feature computed once per row; see rules.stage)
    meta_cols = {"lang": lang_col, "source": source_col, "n_chars": n_chars_col}

    def model_pcts(meta):
        return model_rule_percentages(
            meta["lang"], F.col("lang_pred"), F.col("lang_conf"), F.col("ppl")
        )

    with_pcts = scoring_stages(df1, text_col, meta_cols, profile, extra_pcts=model_pcts)

    # Stage 4 — rollup + scrub in the final projection
    carry = [*id_cols]
    if lang_col:
        carry.append(lang_col)
    carry += ["lang_pred", "lang_conf", "ppl", text_col]
    scored = final_scores(with_pcts, carry, profile)

    scrub = scrub_columns(F.col(text_col))
    out_cols = [F.col(c) for c in scored.columns if c != text_col] + [
        scrub["scrub_count"].alias("scrub_count"),
        scrub["scrub_email_count"].alias("scrub_email_count"),
        scrub["scrub_ip_count"].alias("scrub_ip_count"),
        scrub["scrub_phone_count"].alias("scrub_phone_count"),
    ]
    if include_text or toxic_terms:
        out_cols.append(scrub["scrubbed_text"].alias("scrubbed_text"))
    out = scored.select(*out_cols)
    if toxic_terms:
        # Toxicity masking (north rule: PII/toxicity scrub) runs AFTER the
        # PII chain, on the scrubbed text. The stage() barrier keeps
        # CollapseProject from inlining the whole scrub when-chain into the
        # three toxicity references — scrubbed text is computed once.
        from metadata_quality_stack_spark.functions.scrub import toxicity_columns
        from metadata_quality_stack_spark.operators.rules import stage

        base = [c for c in out.columns if c != "scrubbed_text"]
        pre = stage(out, base, {"_scrubbed": F.col("scrubbed_text")})
        tox = toxicity_columns(F.col("_scrubbed"), toxic_terms)
        final = [F.col(c) for c in base] + [tox["tox_count"].alias("tox_count")]
        if include_text:
            final.append(tox["detoxed_text"].alias("scrubbed_text"))
        out = pre.select(*final)
    return out


def partition_metrics(result: DataFrame, lang_col: str = "lang_pred") -> dict[str, DataFrame]:
    """The per-partition metrics sidecar (north rule): lang histogram,
    drop-reason counts, scrub counts, rating histogram. Each is one
    partial-aggregated groupBy (map-side combine, small shuffle)."""
    return {
        "lang_histogram": result.groupBy(lang_col).agg(F.count("*").alias("n_docs")),
        "rating_histogram": result.groupBy("rating").agg(F.count("*").alias("n_docs")),
        "drop_reasons": (
            result.select(F.explode("drop_reasons").alias("reason"))
            .groupBy("reason")
            .agg(F.count("*").alias("n_docs"))
        ),
        "scrub_totals": result.agg(
            F.sum("scrub_email_count").alias("emails_scrubbed"),
            F.sum("scrub_ip_count").alias("ips_scrubbed"),
            F.sum("scrub_phone_count").alias("phones_scrubbed"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("docs_kept"),
            F.count("*").alias("docs_total"),
        ),
    }


def salted_repartition(
    df: DataFrame, n_partitions: int, domain_col: str, fine_col: str, n_salts: int = 16
) -> DataFrame:
    """Skew handling for domain-heavy crawl shards (north rule): compose a
    salt from the high-cardinality column so one hot domain spreads over
    ``n_salts`` partitions instead of one."""
    salt = F.pmod(F.xxhash64(F.col(fine_col)), F.lit(n_salts))
    return df.repartition(n_partitions, F.col(domain_col), salt)
