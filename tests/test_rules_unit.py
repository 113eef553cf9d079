"""Per-operator unit tests (SURVEY.md §5.2 item 3): hostile inputs through
the native rule engine; rounding-tie parity of the HALF_EVEN formula."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators.rules import apply_quality, half_even_int
from metadata_quality_stack_spark.oracle import scoring as oracle

HOSTILE = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "",
            "   \n\n  ",
            "x",
            "the line\n" * 40 + "tail of the usual words in the day.",
            "# # # the # word # is # hash # the # end #.",
        ],
        "lang": ["en", "en", "en", "en", None],
        "source": ["s", "s", "s", "s", None],
        "n_chars": [0, 7, 1, None, 44],
    }
)


def test_hostile_rows_native(spark):
    df = spark.createDataFrame(HOSTILE)
    got = (
        apply_quality(df, meta_cols={"lang": "lang", "source": "source", "n_chars": "n_chars"})
        .select("doc_id", "total_score", "rating", "keep", "drop_reasons")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = oracle.score_pandas(
        HOSTILE, lang_col="lang", source_col="source", n_chars_col="n_chars",
        profile="webtext_native",
    )
    assert (got["total_score"].values == exp["total_score"].values).all()
    assert (got["keep"].values == exp["keep"].values).all()
    # empty/whitespace/short/repetitive/symbol docs all drop
    assert not got["keep"].any()


@pytest.mark.parametrize(
    "x",
    [0.0, 0.5, 1.5, 2.5, 3.5, 12.5, 13.5, 12.4999999999, 12.5000000001, 96.5, 97.5, 100.0],
)
def test_half_even_matches_python_round(spark, x):
    # Python round() is the reference semantics (validators.py:1002)
    expected = round(x)
    assert oracle.half_even_int(x) == expected
    got = spark.range(1).select(half_even_int(F.lit(float(x))).alias("v")).collect()[0]["v"]
    assert got == expected, f"x={x}"


def test_oracle_features_empty():
    f = oracle._features("")
    assert f["n_words"] == 0 and f["n_lines"] == 0
    pcts = oracle._native_pcts(f, "en", "s", 0)
    assert pcts["word_count"] == 0.0
    assert pcts["alpha_ratio"] == 0.0  # 0-division guard
    assert pcts["chars_consistent"] == 1.0


def test_mean_word_len_bounds():
    f = oracle._features("aaaaaaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbbbbbb")
    pcts = oracle._native_pcts(f, "en", "s", None)
    assert pcts["mean_word_length"] == 0.0  # mean len 27 > 12
    assert math.isclose(pcts["word_diversity"], 1.0)


def test_rule_ablation_directions(spark):
    """Removing a failing HARD rule admits its victims; removing a
    passing points-carrying rule can only lose points (never admit);
    invariants: n_keep_without = base + admitted - dropped, and a rule
    whose pct is 1.0 everywhere admits nobody."""
    from metadata_quality_stack_spark.operators import analytics

    good = "the quick brown fox jumps over the lazy dog and runs on. " * 20
    docs = spark.createDataFrame(
        [
            (0, good, "en", "src1", len(good)),       # passes everything
            (1, "zz qq ww " * 40, "en", "src1", 360), # fails stopword gate
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r.rule_id: r for r in analytics.rule_ablation(docs).collect()}
    for r in rows.values():
        assert r.n_keep_without == r.n_keep_base + r.n_admitted - r.n_dropped
    sw = rows["stopword_density"]
    assert sw.n_admitted >= 1  # the gibberish doc comes back without the gate
