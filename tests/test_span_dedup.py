"""Exact-substring (duplicated-span) dedup semantics — Lee et al. 2021
keep-one-copy behavior re-expressed over rolling word windows
(operators/dedup.py: dup_span_stats / drop_duplicated_spans).

Small W (3) keeps the crafted cases readable; the gate checks W=10
against DuckDB at sf0.01."""

from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _clean(spark, rows, w=3):
    out = dedup.drop_duplicated_spans(_docs(spark, rows), w=w).collect()
    return {r.doc_id: (r.clean_text, r.n_removed_tokens) for r in out}


def test_canonical_copy_survives_later_copy_removed(spark):
    # the 5-token passage repeats across docs; doc 0 holds the
    # (doc_id, pos)-first occurrence and keeps it, doc 1 loses it
    got = _clean(
        spark,
        [
            (0, "a b c d e tail one"),
            (1, "head a b c d e"),
            (2, "totally different words here"),
        ],
    )
    assert got[0] == ("a b c d e tail one", 0)
    assert got[1] == ("head", 5)
    assert got[2] == ("totally different words here", 0)


def test_within_doc_repeat_removed(spark):
    # the same doc repeats its own 3-token span; only the first copy stays
    got = _clean(spark, [(0, "x y z mid x y z")])
    assert got[0] == ("x y z mid", 3)


def test_overlapping_windows_fuse_into_one_span(spark):
    # a 5-token repeated passage = three overlapping duplicated 3-windows
    # in the copy; covered-index union removes exactly 5 tokens, not 9
    got = _clean(
        spark,
        [
            (0, "p q r s t after"),
            (1, "before p q r s t"),
        ],
    )
    assert got[1] == ("before", 5)


def test_short_docs_never_removed(spark):
    got = _clean(spark, [(0, "a b"), (1, "a b")], w=3)
    assert got[0] == ("a b", 0)
    assert got[1] == ("a b", 0)


def test_fully_duplicated_doc_empties(spark):
    got = _clean(spark, [(0, "a b c"), (1, "a b c")], w=3)
    assert got[0] == ("a b c", 0)
    assert got[1] == ("", 3)


def test_stats_agree_with_removal(spark):
    rows = [
        (0, "a b c d e tail one"),
        (1, "head a b c d e"),
        (2, "x y z mid x y z"),
    ]
    stats = {
        r.doc_id: r
        for r in dedup.dup_span_stats(_docs(spark, rows), w=3).collect()
    }
    # doc 0: 5 windows, all canonical; doc 1: 4 windows, 3 duplicated
    assert stats[0].n_windows == 5 and stats[0].n_dup_windows == 0
    assert stats[1].n_windows == 4 and stats[1].n_dup_windows == 3
    # doc 2's second "x y z" duplicates its own first window
    assert stats[2].n_dup_windows == 1
    assert abs(stats[1].dup_window_fraction - 0.75) < 1e-9


def test_hostile_rows(spark):
    # empty / whitespace-only / 1-word / NULL text all canonicalize the
    # same way the DuckDB mirror does ('' for no surviving tokens)
    got = _clean(
        spark,
        [(0, ""), (1, "   \t\n  "), (2, "word"), (3, None)],
    )
    assert got == {0: ("", 0), 1: ("", 0), 2: ("word", 0), 3: ("", 0)}
