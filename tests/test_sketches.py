"""KMV cardinality sketch: accuracy envelope, exact-below-K behavior,
shard-merge property, TakeOrdered plan shape; plus the domain-level
quality filter's broadcast anti-join and null-source safety."""

import pytest
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import analytics, sketches


@pytest.fixture(scope="module")
def corpus(spark):
    # 2000 distinct texts + duplicates that must NOT move the estimate
    rows = [(i, f"document number {i} body") for i in range(2000)]
    rows += [(10_000 + i, f"document number {i} body") for i in range(500)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_kmv_estimate_within_error_envelope(corpus):
    row = sketches.kmv_distinct_estimate(corpus).collect()[0]
    assert row["k_seen"] == sketches.KMV_K
    # stderr ~ 1/sqrt(K-2) ~ 9%; allow 3 sigma
    assert abs(row["est_distinct"] - 2000) / 2000 < 0.27, row


def test_kmv_exact_when_under_k(spark):
    small = spark.createDataFrame(
        [(i, f"t{i}") for i in range(50)], "doc_id long, text string"
    )
    row = sketches.kmv_distinct_estimate(small).collect()[0]
    assert row["k_seen"] == 50
    assert row["est_distinct"] == 50.0


def test_kmv_duplicates_do_not_inflate(spark, corpus):
    uniq = corpus.dropDuplicates(["text"])
    a = sketches.kmv_distinct_estimate(corpus).collect()[0]
    b = sketches.kmv_distinct_estimate(uniq).collect()[0]
    assert a == b


def test_kmv_merge_equals_whole_corpus_sketch(corpus):
    whole = [r["h"] for r in sketches.kmv_sketch(corpus).collect()]
    shards = [
        corpus.filter(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    merged = sketches.kmv_merge([sketches.kmv_sketch(s) for s in shards])
    assert [r["h"] for r in merged.collect()] == whole


def test_kmv_matches_pure_python(spark):
    texts = [f"x{i}" for i in range(400)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    hs = sorted({sketches.py_h60(t) for t in texts})[: sketches.KMV_K]
    got = [r["h"] for r in sketches.kmv_sketch(df).collect()]
    assert got == hs


def test_kmv_plan_is_take_ordered(corpus, capsys):
    sketches.kmv_sketch(corpus).explain("formatted")
    plan = capsys.readouterr().out
    assert "TakeOrderedAndProject" in plan, "limit-after-sort must not global-sort"


def test_source_quality_filter(spark):
    # src_bad's docs are empty -> keep rate 0; src_good's docs score well
    good_text = (
        "The quick brown fox jumps over the lazy dog near the river. "
        "The children played in the garden with a red ball all morning. "
        "An old man read his newspaper at the table by the window. "
    ) * 3
    rows = [(i, good_text, "en", "src_good", len(good_text)) for i in range(10)]
    rows += [(100 + i, "", "en", "src_bad", 0) for i in range(10)]
    rows += [(200, good_text, "en", None, len(good_text))]  # null source
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = analytics.source_quality_filter(docs, min_keep_rate=0.5)
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == set(range(10)) | {200}, kept
    # plan: the corpus-side pass must be a broadcast anti-join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_normalize_text_hostile(spark):
    from metadata_quality_stack_spark.operators import textops

    rows = [
        (0, "a  b\tc"),                       # space/tab runs
        (1, "line1 \r\n line2\rline3"),       # CRLF + CR + edge spaces
        (2, "x\x00y\x07z\x0c!"),              # control chars stripped
        (3, "a\n\n\n\n\nb"),                  # blank-line squeeze
        (4, "  \n padded \n  "),              # outer trim
        (5, ""),                              # empty
        (6, None),                            # null
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.normalize_text(df).collect()}
    assert out[0]["clean_text"] == "a b c"
    assert out[1]["clean_text"] == "line1\nline2\nline3"
    assert out[2]["clean_text"] == "xyz!"
    assert out[3]["clean_text"] == "a\n\nb"
    assert out[4]["clean_text"] == "padded"
    assert out[5]["clean_text"] == "" and out[5]["n_chars_raw"] == 0
    assert out[6]["clean_text"] == "" and out[6]["n_chars_raw"] == 0
    # whitespace-variant recrawls now collapse under exact dedup
    a = textops.normalize_text(
        spark.createDataFrame(
            [(0, "hello  world\r\n"), (1, "hello world")],
            "doc_id long, text string",
        )
    ).collect()
    assert a[0]["clean_text"] == a[1]["clean_text"]


def test_skew_report_recommends_salts(spark):
    # one hot key (80 rows) + 20 cold keys (1 row each): mean ~4.76,
    # skew ~16.8 -> recommended_salts 17
    rows = [(i, "hot") for i in range(80)]
    rows += [(100 + i, f"cold{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    r = analytics.skew_report(df, "domain").collect()[0]
    assert r["n_keys"] == 21 and r["n_rows"] == 100
    assert r["max_key_rows"] == 80
    assert r["p50_key_rows"] == 1.0
    assert r["recommended_salts"] == 17
    assert abs(r["skew_factor"] - 16.8) < 0.01

def test_c4_line_filter_semantics_and_parity(spark):
    """C4 §2.2 line rules on hostile rows, plus direct Spark<->DuckDB
    parity of the full output (the gate corpus never contains CRs,
    tabs-in-words, or all-dropped pages)."""
    import duckdb
    import pandas as pd

    from metadata_quality_stack_spark.operators import textops

    rows = [
        # 3 sentence-like lines + 1 short line -> page kept, short dropped
        (1, "This is a good long sentence here.\nshort.\n"
            "Another quite long proper sentence ends well!\n"
            "And a third full sentence survives the filter too."),
        # javascript line + unterminated line -> nothing survives
        (2, "Enable JavaScript to view this page properly please.\n"
            "no terminal punct here at all"),
        (3, None),
        # curly brace kills the page even with 3 surviving lines
        (4, "A page with curly { brace gets dropped even with lines.\n"
            "Second proper sentence is here for the count now.\n"
            "Third proper sentence is also here for the count."),
        # edge whitespace/CR trimmed per line; only 2 survivors -> drop
        (5, "   Trailing spaces line ends with a period and words.   \n"
            "\rCR-terminated proper sentence should be kept fine.\r"),
        (6, ""),
        # quote and ellipsis count as terminal punctuation
        (7, "Tab\tseparated words count as five words total.\n"
            '"Quoted line with enough words ends in a quote."\n'
            "Ellipsis line with plenty of words trails off...\n"
            "Fourth sentence with many words makes the cut easily."),
        # lorem ipsum page blocker
        (8, "Lorem ipsum dolor sit amet consectetur adipiscing elit now.\n"
            "Second proper sentence is here for the count now.\n"
            "Third proper sentence is also here for the count."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.c4_line_filter(df).collect()}
    assert out[1]["keep_page"] and out[1]["n_lines_kept"] == 3
    assert "short." not in out[1]["clean_text"]
    assert out[2]["n_lines_kept"] == 0 and not out[2]["keep_page"]
    assert out[3]["clean_text"] == "" and not out[3]["keep_page"]
    assert out[4]["n_lines_kept"] == 3 and not out[4]["keep_page"]
    assert out[5]["n_lines_kept"] == 2 and not out[5]["keep_page"]
    assert out[5]["clean_text"].startswith("Trailing")  # edges trimmed
    assert out[7]["keep_page"] and out[7]["n_lines_kept"] == 4
    assert not out[8]["keep_page"]  # lorem ipsum blocker

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    duck = {
        r[0]: tuple(r[1:])
        for r in con.execute(textops.c4_line_filter_sql()).fetchall()
    }
    for k, r in out.items():
        assert duck[k] == (
            r["n_lines_raw"], r["n_lines_kept"], r["keep_page"], r["clean_text"]
        ), k


def test_c4_line_filter_is_map_only(spark):
    from metadata_quality_stack_spark.operators import textops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = textops.c4_line_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mojibake_stats_hostile_and_parity(spark, tmp_path):
    """Seeded artifacts are counted per family; clean multilingual text
    (including real accents and CJK) stays flagged FALSE; null/empty
    survive; and the DuckDB mirror hash-matches on the same rows."""
    import duckdb

    from metadata_quality_stack_spark.operators import textops

    cafe_bad = "Caf" + chr(0xC3) + chr(0xA9)          # double-encoded e-acute
    quote_l1 = "don" + chr(0xE2) + chr(0x80) + chr(0x99) + "t"  # latin-1 view
    quote_cp = "don" + chr(0xE2) + chr(0x20AC) + chr(0x2122) + "t"  # cp1252
    rows = [
        (0, cafe_bad + " ok"),
        (1, quote_l1 + " and " + quote_cp),
        (2, "bad byte " + chr(0xFFFD) + " here"),
        (3, chr(0x92) + chr(0x85)),                    # stray C1 controls
        (4, "café naïve résumé — fine"),               # REAL accents: clean
        (5, "你好世界 مرحبا עולם"),                      # CJK/RTL: clean
        (6, ""),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.mojibake_stats(df).collect()}
    assert out[0]["n_latin1_pair"] == 1 and out[0]["mojibake"]
    assert out[1]["n_e2_pair"] == 2 and out[1]["mojibake"]
    assert out[2]["n_replacement"] == 1 and out[2]["mojibake"]
    # doc 2 is flagged by ANY replacement char even below the ppm bar
    assert out[2]["mojibake_ppm"] < textops.MOJI_PPM_THRESHOLD * 40
    assert out[3]["n_c1"] == 2 and out[3]["mojibake"]
    for clean_id in (4, 5, 6, 7):
        assert out[clean_id]["n_artifacts"] == 0, clean_id
        assert not out[clean_id]["mojibake"], clean_id
    # union consumes each pair as ONE site; the latin-1 variant's third
    # byte (U+0099) is a bare-C1 site of its own -> 2 pairs + 1 C1
    assert out[1]["n_artifacts"] == 3
    # cross-engine parity on exactly these hostile rows
    pq = str(tmp_path / "moji.parquet")
    df.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    got = sorted(tuple(r) for r in textops.mojibake_stats(df).collect())
    want = sorted(tuple(r) for r in con.sql(textops.mojibake_stats_sql()).fetchall())
    assert got == want


def test_mojibake_stats_is_map_only(spark):
    from metadata_quality_stack_spark.operators import textops

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        textops.mojibake_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_lexical_diversity_counts(spark):
    from metadata_quality_stack_spark.operators import textops

    rows = [
        (0, "the cat sat on the mat"),   # 6 toks, 5 types (the x2), 4 hapax
        (1, "spam spam spam spam"),      # 4 toks, 1 type, 0 hapax
        (2, "Word word WORD"),           # case-folds to one type
        (3, "one"),                      # single token: type and hapax
        (4, ""),
        (5, None),
        (6, "  \t\n  "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textops.lexical_diversity(docs).collect()}
    assert (out[0].n_tokens, out[0].n_types, out[0].hapax_ppm) == (
        6, 5, 4 * 1_000_000 // 6,
    )
    assert (out[1].n_tokens, out[1].n_types, out[1].hapax_ppm) == (4, 1, 0)
    assert (out[2].n_tokens, out[2].n_types) == (3, 1)
    assert (out[3].ttr_ppm, out[3].hapax_ppm) == (1_000_000, 1_000_000)
    for i in (4, 5, 6):
        assert (out[i].n_tokens, out[i].n_types, out[i].ttr_ppm) == (0, 0, 0), i


def test_lexical_diversity_is_map_only(spark):
    from metadata_quality_stack_spark.operators import textops

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        textops.lexical_diversity(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_script_census_homoglyph_and_dominance(spark, tmp_path):
    """Cyrillic-confusable words are caught, per-script dominance is
    right for clean pages of each script, no-letter pages say 'none',
    and the DuckDB mirror matches exactly on these rows."""
    import duckdb

    from metadata_quality_stack_spark.operators import textops

    paypal_spoof = "p" + chr(0x430) + "yp" + chr(0x430) + "l"  # Cyr 'a' x2
    rows = [
        (0, f"verify your {paypal_spoof} account now"),
        (1, "an ordinary english sentence with words"),
        (2, "Привет мир это русский текст"),
        (3, "你好世界 こんにちは 안녕하세요"),
        (4, "مرحبا بالعالم هذا نص عربي"),
        (5, "12345 !!! ... ???"),
        (6, ""),
        (7, None),
        (8, "mixed Привет and english текст words"),  # mixed page, pure words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textops.script_census(df).collect()}
    assert out[0].n_mixed_words == 1 and out[0].mixed_script  # one spoof token
    assert out[0].dominant_script == "latin"
    assert out[1].dominant_script == "latin" and not out[1].mixed_script
    assert out[2].dominant_script == "cyrillic"
    assert out[3].dominant_script == "cjk"
    assert out[4].dominant_script == "arabic"
    for i in (5, 6, 7):
        assert out[i].dominant_script == "none", i
    # page-level mixing without word-level mixing is NOT flagged
    assert out[8].n_mixed_words == 0 and not out[8].mixed_script
    pq = str(tmp_path / "scripts.parquet")
    df.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    got = sorted(tuple(r) for r in textops.script_census(df).collect())
    want = sorted(tuple(r) for r in con.sql(textops.script_census_sql()).fetchall())
    assert got == want


def test_bm25_ranking_semantics(spark):
    """BM25 sanity: a doc with more query-term hits outranks fewer; rare
    terms outweigh common ones; length normalization penalizes padding;
    empty/absent-term cases behave."""
    import pytest as _pytest

    from metadata_quality_stack_spark.operators import retrieval

    filler = "filler " * 30
    rows = [
        (0, "needle haystack needle other words here"),   # 2x rare term
        (1, "needle appears once among these words"),
        (2, "haystack common words only around here"),
        (3, "needle haystack " + filler),                 # padded: penalized
        (4, ""),
        (5, None),
        (6, "unrelated content entirely different topic"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = retrieval.bm25_topk(docs, ["needle", "haystack"], k=10).collect()
    ranks = {r.doc_id: i for i, r in enumerate(out)}
    scores = {r.doc_id: r.score_micros for r in out}
    hits = {r.doc_id: r.n_terms_hit for r in out}
    assert set(ranks) == {0, 1, 2, 3}  # non-matching docs never appear
    assert hits[0] == 2 and hits[1] == 1
    assert ranks[0] < ranks[1]           # both terms beat one
    assert scores[3] < scores[0]         # padding is length-penalized
    # doc 1 (needle once) must beat doc 2 (haystack once): equal-ish df
    # here, so compare via a rare-vs-common corpus instead
    big = [(100 + i, "common words everywhere common") for i in range(20)]
    big += [(0, "rare common"), (1, "common common")]
    docs2 = spark.createDataFrame(big, "doc_id long, text string")
    out2 = {r.doc_id: r.score_micros
            for r in retrieval.bm25_topk(docs2, ["rare", "common"], k=30).collect()}
    assert out2[0] > out2[1]             # the rare term dominates
    with _pytest.raises(ValueError):
        retrieval.bm25_topk(docs, [])


def test_bm25_plan_is_take_ordered(spark, capsys):
    from metadata_quality_stack_spark.operators import retrieval

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    retrieval.bm25_topk(docs, ["vector", "hash"], k=5).explain("formatted")
    plan = capsys.readouterr().out
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


# ---------------------------------------------------------------- HLL
def test_hll_estimate_within_stderr(spark):
    """m=64 -> stderr ~ 1.04/sqrt(64) = 13%; assert within 3 sigma."""
    import duckdb
    from metadata_quality_stack_spark.operators import hll

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    true_n = docs.select("text").distinct().count()
    est = hll.hll_distinct_estimate(docs).first().estimate_micros / 1e6
    assert abs(est - true_n) / true_n < 0.4
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    dk = con.execute(hll.hll_distinct_estimate_sql()).fetchdf()
    assert int(dk.estimate_micros[0]) == int(est * 1e6)


def test_hll_merge_equals_whole_and_is_idempotent(spark):
    from pyspark.sql import functions as F

    from metadata_quality_stack_spark.operators import hll

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    whole = hll.hll_distinct_estimate(docs).first()
    shards = [
        hll.hll_registers(docs.filter(F.col("doc_id") % 4 == i))
        for i in range(4)
    ]
    merged = hll.hll_shard_merge(shards).first()
    assert tuple(merged) == tuple(whole)
    # idempotent: merging a shard twice changes nothing (max)
    again = hll.hll_shard_merge(shards + [shards[0]]).first()
    assert tuple(again) == tuple(whole)


def test_hll_registers_bounded_and_null_safe(spark):
    from metadata_quality_stack_spark.operators import hll

    docs = spark.createDataFrame(
        [(0, "a"), (1, None), (2, "b"), (3, "a")], "doc_id long, text string"
    )
    regs = hll.hll_registers(docs).collect()
    assert 1 <= len(regs) <= hll.HLL_M
    for r in regs:
        assert 0 <= r.bucket < hll.HLL_M
        assert 1 <= r.register <= 55


def test_hll_exchange_is_register_sized(spark):
    """The groupBy(bucket) partials bound every exchange at <= 64 rows:
    assert the plan aggregates before the shuffle (partial_max)."""
    from metadata_quality_stack_spark.operators import hll

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        hll.hll_registers(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max" in plan
