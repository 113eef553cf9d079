"""Trained quality classifier: learning on separable data, determinism,
empty-doc safety, and the map-only shape of the scoring stage."""

import pytest
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import classifier


@pytest.fixture(scope="module")
def corpus(spark):
    """Same two-vocabulary construction as tests/test_dsir.py: target
    sources speak vocabulary A, raw sources speak vocabulary B."""
    rows = []
    for i in range(40):
        rows.append((i, "alpha beta gamma delta " * 5, "en", "src0", 100))
    for i in range(40, 120):
        rows.append((i, "omega sigma tau upsilon " * 5, "en", "src9", 100))
    rows.append((120, "", "en", "src9", 0))  # empty doc: bias-only
    rows.append((121, "alpha beta gamma delta " * 5, "en", "src9", 100))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_learns_separable_vocab(corpus):
    out = {r["doc_id"]: r for r in classifier.classifier_scores(corpus).collect()}
    # every target doc scores above every pure raw-vocab doc
    t_min = min(out[i]["score_micros"] for i in range(40))
    r_max = max(out[i]["score_micros"] for i in range(40, 120))
    assert t_min > r_max
    # the raw-source doc written in target vocabulary scores WITH the
    # target class — the classifier generalizes from text, not source
    assert out[121]["score_micros"] == out[0]["score_micros"]
    # 3 GD rounds fully separate this corpus
    for i in range(40):
        assert out[i]["pred"] == 1
    for i in range(40, 120):
        assert out[i]["pred"] == 0
    # empty doc carries only the bias weight; majority class is raw
    assert out[120]["pred"] == 0


def test_weights_shape_and_determinism(corpus):
    a = classifier.train_weights(corpus)
    b = classifier.train_weights(corpus)
    assert a == b
    assert len(a) == classifier.N_WEIGHTS
    assert all(isinstance(v, int) for v in a)
    # the bias slot learned the negative class prior
    assert a[classifier.BIAS] < 0


def test_scoring_stage_is_map_only(corpus, capsys):
    df = classifier.classifier_scores(corpus, rounds=1)
    df.explain("formatted")
    plan = capsys.readouterr().out
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_gradient_round_is_bounded_key_agg(corpus):
    """The per-round exchange carries at most N_WEIGHTS keys."""
    w = [0] * classifier.N_WEIGHTS
    base = corpus.select(
        classifier._features(F.col("text")).alias("bs"),
        classifier._label(F.col("source")).alias("y"),
    )
    r = classifier._resid_micros(
        classifier._score_micros(F.col("bs"), w), F.col("y")
    )
    grad = (
        base.select(r.alias("r"), F.explode(F.col("bs")).alias("b"))
        .groupBy("b")
        .agg(F.sum("r").alias("g"))
    )
    rows = grad.collect()
    assert len(rows) <= classifier.N_WEIGHTS
    assert all(0 <= x["b"] <= classifier.BIAS for x in rows)
