"""Profile variants (reference METRICS_BY_PROFILE / RATING_THRESHOLDS_BY_
PROFILE, src/api/config.py:30-46,312-349): the NTI-shaped profile selects
a rule subset plus one profile-specific rule, rates with its own
thresholds, and reproduces the content-path checker-registration quirk
(validators.py:1053 + :925-927)."""

import pytest
from pyspark.sql import functions as F

from metadata_quality_stack_spark import config
from metadata_quality_stack_spark.operators.rules import apply_quality

META = {"lang": "lang", "source": "source", "n_chars": "n_chars"}


def _docs(spark):
    rows = [
        # clean prose: passes everything
        (0, "The quick brown fox jumps over the lazy dog. " * 10, "en", "src1"),
        # non-ascii heavy: fails ascii_ratio (nti-specific) but not webtext
        (1, "éèêë " * 200, "fr", "src2"),
        (2, "", "en", "src1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    return df.withColumn("n_chars", F.length("text"))


def test_budget_tables_match_reference_shape():
    nti = config.RULES_BY_PROFILE["webtext_nti"]
    by_dim: dict = {}
    for r in nti:
        by_dim[r["dimension"]] = by_dim.get(r["dimension"], 0) + r["weight"]
    assert by_dim == config.DIMENSION_MAX_BY_PROFILE["webtext_nti"]
    assert sum(by_dim.values()) == config.MAX_SCORE_BY_PROFILE["webtext_nti"] == 310
    assert config.thresholds_for("webtext_nti_native") == {
        "excellent": 264, "good": 166, "sufficient": 91,
    }
    # shared rules keep identical weights across profiles
    web = {r["id"]: r for r in config.RULES_BY_PROFILE["webtext"]}
    for r in nti:
        if r["id"] in web:
            assert r["weight"] == web[r["id"]]["weight"], r["id"]
            assert r["dimension"] == web[r["id"]]["dimension"], r["id"]


def test_nti_profile_matches_pandas_oracle_and_own_thresholds(spark):
    from metadata_quality_stack_spark.oracle.scoring import score_pandas

    docs = _docs(spark)
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    for profile in ("webtext_native", "webtext_nti_native"):
        scored = (
            apply_quality(docs, meta_cols=META, profile=profile)
            .orderBy("doc_id")
            .collect()
        )
        exp = score_pandas(
            pdf, lang_col="lang", source_col="source",
            n_chars_col="n_chars", profile=profile,
        )
        t = config.thresholds_for(profile)
        for i, row in enumerate(scored):
            assert row.total_score == int(exp["total_score"].iloc[i]), (profile, i)
            assert row.rating == exp["rating"].iloc[i], (profile, i)
            assert row.keep == bool(exp["keep"].iloc[i]), (profile, i)
            # rating really uses the profile's own cuts
            ts = row.total_score
            want = (
                "Excellent" if ts >= t["excellent"]
                else "Good" if ts >= t["good"]
                else "Sufficient" if ts >= t["sufficient"]
                else "Bad"
            )
            assert row.rating == want
        # dimension ceilings respect the profile budget
        dmax = config.DIMENSION_MAX_BY_PROFILE[config.base_profile(profile)]
        for row in scored:
            for d in config.DIMENSIONS:
                assert getattr(row, d) <= dmax[d]
    # the two profiles genuinely classify differently somewhere
    nti = apply_quality(docs, meta_cols=META, profile="webtext_nti_native")
    web = apply_quality(docs, meta_cols=META, profile="webtext_native")
    r_nti = {r.doc_id: r.rating for r in nti.collect()}
    r_web = {r.doc_id: r.rating for r in web.collect()}
    assert r_nti != r_web


def test_ascii_ratio_is_nti_specific(spark):
    ids_web = {r["id"] for r in config.RULES_BY_PROFILE["webtext"]}
    assert "ascii_ratio" not in ids_web
    scored = apply_quality(_docs(spark), meta_cols=META, profile="webtext_nti_native")
    r1 = scored.filter(F.col("doc_id") == 1).first()
    # non-ascii doc: ascii_ratio ~ 1/5 -> interop loses most of the 30 pts
    assert "ascii_ratio" in list(r1.drop_reasons)


def test_content_path_quirk_drops_profile_only_rules(spark):
    """validate-from-content registers DEFAULT-profile checkers only:
    the nti-specific rule is silently skipped, thresholds stay nti."""
    prof = config.resolve_profile("webtext_nti_native", via_content=True)
    rules = config.RULES_BY_PROFILE[prof]
    assert all(r["id"] != "ascii_ratio" for r in rules)
    assert config.thresholds_for(prof)["excellent"] == 264
    scored = apply_quality(_docs(spark), meta_cols=META, profile=prof)
    r0 = scored.filter(F.col("doc_id") == 0).first()
    full = apply_quality(_docs(spark), meta_cols=META, profile="webtext_nti_native")
    f0 = full.filter(F.col("doc_id") == 0).first()
    # doc 0 is pure ascii (pct 1.0): skipping the rule costs exactly 30
    assert r0.total_score == f0.total_score - 30
    # url-path scoring keeps the rule
    assert config.resolve_profile("webtext_nti_native") == "webtext_nti_native"


def test_full_profiles_reject_apply_quality(spark):
    with pytest.raises(ValueError):
        apply_quality(_docs(spark), meta_cols=META, profile="webtext_nti")


def test_full_nti_pipeline_matches_pandas_oracle(spark):
    """The MODEL-rule pipeline under the second profile: Spark plan vs the
    pure-pandas oracle, exact keep/rating/total parity (the profile twin
    of tests/test_pipeline_f1.py)."""
    from metadata_quality_stack_spark.oracle.scoring import score_pandas
    from metadata_quality_stack_spark.plans.pipeline import quality_pipeline
    from metadata_quality_stack_spark.sources.pages import pages_spark_df

    pages = pages_spark_df(spark, n_rows=150, seed=31)
    out = (
        quality_pipeline(
            pages, id_cols=("url",), lang_col="lang",
            profile="webtext_nti", include_text=False,
        )
        .orderBy("url")
        .collect()
    )
    pdf = pages.toPandas().sort_values("url").reset_index(drop=True)
    exp = score_pandas(pdf, lang_col="lang", profile="webtext_nti")
    assert len(out) == len(exp)
    for i, row in enumerate(out):
        assert row.total_score == int(exp["total_score"].iloc[i]), row.url
        assert row.rating == exp["rating"].iloc[i], row.url
        assert row.keep == bool(exp["keep"].iloc[i]), row.url
