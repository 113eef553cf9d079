"""Gopher repetition suite: hand-computed signals, hostile rows,
cross-engine parity on adversarial text, and the map-only plan shape."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import gopher

MICROS = gopher.MICROS

ROWS = [
    # doc 0: one line repeated 3x -> dup_line_frac 2/3; every bigram is
    # "a b" or "b a" so top-2-gram occupancy is high
    (0, "a b a b\na b a b\na b a b", "en", "src0", 23),
    # doc 1: clean prose, no repetition at any n
    (1, "the quick brown fox jumps over one lazy dog", "en", "src0", 43),
    # doc 2: paragraph duplicated (blank-line separated)
    (2, "para one here\n\npara one here", "en", "src1", 28),
    # hostile rows
    (3, "", "en", "src1", 0),
    (4, "   \n\t\n  ", "en", "src1", 8),
    (5, "word", "en", "src1", 4),
    (6, "x " * 40, "en", "src1", 80),  # 40 identical unigrams
]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


@pytest.fixture(scope="module")
def result(docs):
    return {r["doc_id"]: r.asDict() for r in gopher.gopher_repetition(docs).collect()}


def test_hand_computed_lines(result):
    r = result[0]
    assert r["n_lines"] == 3
    # 2 of 3 line occurrences are repeats
    assert r["dup_line_frac_micros"] == round(MICROS * 2 / 3)
    assert r["dup_line_char_frac_micros"] == round(MICROS * 2 / 3)
    # clean doc: nothing duplicated at any n
    c = result[1]
    assert c["dup_line_frac_micros"] == 0
    assert all(c[f"dup{n}gram_char_frac_micros"] == 0 for n in gopher.DUP_NS)


def test_hand_computed_paragraphs(result):
    r = result[2]
    assert r["dup_para_frac_micros"] == round(MICROS * 1 / 2)
    assert r["dup_para_char_frac_micros"] == round(MICROS * 1 / 2)
    # its two lines (split on single \n) include one empty -> dropped,
    # leaving two identical non-empty lines
    assert r["n_lines"] == 2
    assert r["dup_line_frac_micros"] == round(MICROS * 1 / 2)


def test_degenerate_repetition_saturates(result):
    # "x x x ... x": the top 2-gram "x x" occupies every position
    r = result[6]
    assert r[f"top2gram_char_frac_micros"] == MICROS
    for n in gopher.DUP_NS:
        # all 40-n+1 n-grams identical -> dup chars (k-1)/k of total
        k = 40 - n + 1
        assert r[f"dup{n}gram_char_frac_micros"] == round(MICROS * (k - 1) / k)


def test_hostile_rows_all_zero(result):
    for d in (3, 4, 5):
        r = result[d]
        for col, v in r.items():
            if col == "doc_id":
                continue
            if d == 5 and col == "n_lines":
                assert v == 1
                continue
            assert v == 0, f"doc {d} col {col}: {v}"


def test_oracle_parity_on_hostile_rows(spark, docs):
    """The sf0.01 gate never sees empty/whitespace/1-token docs; replay
    the oracle SQL on this table and require exact equality."""
    pdf = pd.DataFrame(
        ROWS, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.execute(gopher.gopher_repetition_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        gopher.gopher_repetition(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = want[sorted(want.columns)].astype("int64")
    got = got[sorted(got.columns)].astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_plan_is_map_only(docs, capsys):
    df = gopher.gopher_repetition(docs)
    df.explain("formatted")
    plan = capsys.readouterr().out
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_fast_variant_parity_and_plan(spark, docs, capsys):
    """The pandas-UDF production twin must be integer-exact-equal to the
    column version — on the hostile inline rows AND the sf0.001 corpus —
    and stay map-only (one Arrow crossing, no Exchange)."""
    slow = {r["doc_id"]: r.asDict() for r in gopher.gopher_repetition(docs).collect()}
    fast = {r["doc_id"]: r.asDict() for r in gopher.gopher_repetition_fast(docs).collect()}
    assert fast == slow

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = gopher.gopher_repetition(corpus).toPandas().sort_values("doc_id")
    b = gopher.gopher_repetition_fast(corpus).toPandas().sort_values("doc_id")
    assert (a.reset_index(drop=True) == b[a.columns].reset_index(drop=True)).all().all()

    df = gopher.gopher_repetition_fast(corpus)
    df.explain("formatted")
    plan = capsys.readouterr().out
    assert "Exchange" not in plan
    # exactly one Arrow crossing (node appears once in the plan tree,
    # once in the formatted detail section)
    assert plan.count("ArrowEvalPython (") == 1


def test_repetition_filter_thresholds(spark):
    from metadata_quality_stack_spark.operators.gopher import (
        GOPHER_THRESHOLDS_MICROS,
        gopher_repetition_filter,
    )

    # genuinely repetition-free: every token unique corpus-wide (a
    # templated sentence would legitimately trip the dup-n-gram signals)
    clean = "\n".join(
        " ".join(f"w{i}x{j}" for j in range(8)) for i in range(20)
    )
    spammy = "\n".join(["buy cheap pills online now"] * 20)
    df = spark.createDataFrame(
        [(0, clean), (1, spammy), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_repetition_filter(df).collect()}
    assert out[0]["keep"] and out[0]["n_failed"] == 0
    assert out[0]["failed_signals"] == ""
    assert not out[1]["keep"]
    assert "dup_line_frac" in out[1]["failed_signals"]
    assert out[1]["n_failed"] >= 2
    # empty / null docs have no repetition -> pass this stage (length
    # rules elsewhere drop them)
    assert out[2]["keep"] and out[3]["keep"]
    # failure names come from the threshold table, in its order
    names = [c[: -len("_micros")] for c in GOPHER_THRESHOLDS_MICROS]
    got = out[1]["failed_signals"].split(",")
    assert got == [n for n in names if n in got]
