"""Per-metric report surfaces (reference models.py:31-42 metrics[] array,
converters.py:70-137 nested DQV): hostile-row behavior and shape."""

import json

from pyspark.sql import functions as F

from metadata_quality_stack_spark import config
from metadata_quality_stack_spark.operators.rules import metric_report
from metadata_quality_stack_spark.operators.textops import report_dqv

META = {"lang": "lang", "source": "source", "n_chars": "n_chars"}


def _hostile(spark):
    rows = [
        (0, "", None, None),
        (1, "   \n\t  ", "en", ""),
        (2, "word", "en", "src1"),
        (3, "The quick brown fox jumps over the lazy dog. " * 5, "en", "src1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    return df.withColumn("n_chars", F.length("text"))


def test_metric_report_shape_and_hostile_rows(spark):
    rep = metric_report(_hostile(spark), meta_cols=META)
    rows = rep.collect()
    n_rules = len(config.RULES_BY_PROFILE["webtext_native"])
    assert len(rows) == 4 * n_rules
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert 0.0 <= r.pct <= 1.0
        assert abs(r.points - round(r.pct * r.weight, 4)) < 1e-6
    # empty doc: word_count fails, population-0 fractions degrade to 0
    m0 = {r.metric: r for r in by_doc[0]}
    assert m0["word_count"].pct == 0.0
    assert m0["terminal_punct"].pct == 0.0
    assert m0["lang_present"].pct == 0.0  # null lang
    # every rule of the profile appears exactly once per doc
    assert sorted(m0) == sorted(r["id"] for r in config.RULES_BY_PROFILE["webtext_native"])
    # i18n labels + severity metadata per metric (validators.py:968-969;
    # sh:severity census): labels non-empty both languages, severity
    # partitions exactly along the HARD_RULES membership
    for r in rows:
        assert r.label_en and r.label_es
        assert (r.label_en, r.label_es) == config.labels_for(r.metric)
        assert r.severity == (
            "violation" if r.metric in config.HARD_RULES else "warning"
        )
    assert {r.severity for r in rows} == {"violation", "warning"}


def test_report_dqv_is_valid_json_and_consistent(spark):
    rep = report_dqv(_hostile(spark), meta_cols=META).collect()
    assert len(rep) == 4
    for r in rep:
        doc = json.loads(r.report)  # parses as real JSON
        assert doc["doc_id"] == r.doc_id
        assert set(doc["dimensions"]) == set(config.DIMENSIONS)
        ms = doc["measurements"]
        assert len(ms) == len(config.RULES_BY_PROFILE["webtext_native"])
        # totalScore consistent with the dimensions object
        assert doc["totalScore"] == sum(doc["dimensions"].values())
        for m in ms:
            assert 0.0 <= m["percentage"] <= 1.0
            assert abs(m["points"] - round(m["percentage"] * m["weight"], 4)) < 5e-4
            assert m["label_en"] and m["label_es"]
            assert m["severity"] in ("violation", "warning")
