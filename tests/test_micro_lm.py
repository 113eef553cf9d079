"""Integer-micro model twins (operators/micro_lm.py): weight-table
parity between the Python freeze and the DuckDB CTE replay, language
recovery on held-out prose, perplexity ordering (clean < gibberish),
hostile rows, and the broadcast-join plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from metadata_quality_stack_spark.functions.langid import LANGS
from metadata_quality_stack_spark.functions.perplexity import PPL_EMPTY
from metadata_quality_stack_spark.operators import micro_lm

HELD_OUT = {
    "en": "the children walked slowly through the quiet garden near the old stone house",
    "es": "los ninos caminaban lentamente por el jardin tranquilo cerca de la vieja casa",
    "de": "die kinder gingen langsam durch den ruhigen garten neben dem alten haus",
    "fr": "les enfants marchaient lentement dans le jardin calme pres de la vieille maison",
    "zh": "孩子们慢慢走过安静的花园 老房子旁边 鸟儿在树上唱歌",
}


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t) for i, t in enumerate(HELD_OUT.values())]
    rows += [
        (10, ""),  # empty
        (11, "   \t  "),  # whitespace-only
        (12, "word"),  # single token
        (13, None),  # null text
        (14, "zzqx vvwp qqrr kkjj xxyy zzqx vvwp mmnn ppqq rrss"),  # gibberish
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_langid_weights_match_duckdb_replay():
    """The Python-frozen weight table IS the oracle's retrained one:
    run only the weight CTEs in DuckDB and compare all B x 5 micros."""
    w = micro_lm.langid_weights_micros()
    sql = (
        "WITH "
        + micro_lm._langid_weights_cte("(SELECT 0 AS doc_id, '' AS text)")
        + " SELECT b, w_en, w_es, w_de, w_fr, w_zh FROM wp ORDER BY b"
    )
    got = duckdb.sql(sql).fetchall()
    assert len(got) == micro_lm.LANGID_B
    for row in got:
        b = row[0]
        for li, lang in enumerate(LANGS):
            assert row[1 + li] == w[lang][b], (b, lang)


def test_ppl_probs_match_duckdb_replay():
    pu, pb = micro_lm.perplexity_probs()
    sql = (
        "WITH "
        + micro_lm._ppl_probs_cte().lstrip()
        + " SELECT u.b, u.p, b.p FROM pu u JOIN pb b USING (b) ORDER BY u.b"
    )
    got = duckdb.sql(sql).fetchall()
    assert len(got) == micro_lm.PPL_B
    for b, gpu, gpb in got:
        assert gpu == pu[b] and gpb == pb[b], b  # bitwise equal doubles


def test_langid_recovers_held_out_languages(docs):
    out = {r["doc_id"]: r for r in micro_lm.langid_model_scores(docs).collect()}
    for i, lang in enumerate(HELD_OUT):
        assert out[i]["lang_pred"] == lang, (lang, out[i])
    # empty / whitespace / null: zero grams, default first language
    for i in (10, 11, 13):
        assert out[i]["n_grams"] == 0
        assert out[i]["lang_pred"] == LANGS[0]
        assert all(out[i][f"s_{lang}"] == 0 for lang in LANGS)
    assert out[12]["n_grams"] > 0  # '_word_' has trigrams


def test_perplexity_orders_clean_below_gibberish(docs):
    out = {
        r["doc_id"]: r for r in micro_lm.perplexity_model_scores(docs).collect()
    }
    en_ppl = out[0]["ppl"]
    assert en_ppl < out[14]["ppl"], "seed-like prose must beat token salad"
    for i in (10, 11, 13):
        assert out[i]["n_tokens"] == 0
        assert out[i]["cost_micros"] == 0
        assert out[i]["ppl"] == PPL_EMPTY
    assert out[12]["n_tokens"] == 1


def test_scores_are_map_only_plans(docs, capsys):
    """Both scorers are literal-array folds (r4): the weight tables ride
    the plan as array literals, so there is NO join and NO shuffle at
    all — strictly stronger than the r3 broadcast-join assertion (a
    shuffled join of the exploded gram stream would be the 100 TB
    mistake; now even the broadcast and the doc_id re-agg are gone)."""
    for df in (
        micro_lm.langid_model_scores(docs),
        micro_lm.perplexity_model_scores(docs),
    ):
        df.explain("formatted")
        plan = capsys.readouterr().out
        assert "Join" not in plan
        assert "Exchange" not in plan


def test_scores_deterministic(docs):
    a = micro_lm.langid_model_scores(docs).sort("doc_id").collect()
    b = micro_lm.langid_model_scores(docs).sort("doc_id").collect()
    assert a == b


SF001 = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(SF001)


def test_micro_pipeline_internal_consistency(corpus):
    """keep must equal (total >= sufficient AND every hard rule >= 0.5),
    dropped docs must name at least one reason, kept docs with empty
    drop_reasons must have every rule passing."""
    from metadata_quality_stack_spark import config

    out = micro_lm.full_pipeline_micro(corpus).collect()
    assert len(out) == corpus.count()
    t = config.thresholds_for("webtext")["sufficient"]
    for r in out:
        if r["keep"]:
            assert r["total_score"] >= t
            assert r["rating"] != "Bad"
        if r["total_score"] < t:
            assert not r["keep"]
            assert r["drop_reasons"] != ""
        dims = sum(
            r[d]
            for d in (
                "findability",
                "accessibility",
                "interoperability",
                "reusability",
                "contextuality",
            )
        )
        assert dims == r["total_score"]


def test_micro_langid_agrees_with_udf_model(corpus):
    """The micro langid twin must track the production UDF's prediction
    on the real corpus (different hash family, same seed corpus —
    measured 97.6% on sf0.001; bound set with slack)."""
    from metadata_quality_stack_spark.plans.pipeline import model_scores_udf

    micro = micro_lm.langid_model_scores(corpus).select(
        "doc_id", F.col("lang_pred").alias("lp_micro")
    )
    udf = corpus.select(
        "doc_id", model_scores_udf()(F.col("text")).lang_pred.alias("lp_udf")
    )
    j = micro.join(udf, "doc_id")
    n = j.count()
    agree = j.filter(F.col("lp_micro") == F.col("lp_udf")).count()
    assert agree / n >= 0.90, f"micro/UDF langid agreement {agree}/{n}"


def test_cross_engine_parity_hostile_unicode(spark, tmp_path):
    """The driver gate only exercises the synthetic corpus; this pins
    Spark<->DuckDB parity on inputs it never contains: emoji, RTL
    Arabic, combining marks, CJK without spaces, a lone quote, and a
    tab/newline soup — byte-level md5 bucketing and char-level substr
    must agree across engines on all of them."""
    import duckdb

    rows = [
        (0, "🎉🎉 مرحبا بالعالم 🎉 test"),
        (1, "étude résumé naïve"),  # combining marks
        (2, "你好世界没有空格的长句子测试一下"),
        (3, "it's a \"quoted\" line, isn't it?"),
        (4, "tab\there\nnewline\r\nmix  \t "),
        (5, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pq = str(tmp_path / "hostile.parquet")
    df.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    for spark_df, sql in [
        (
            micro_lm.langid_model_scores(df),
            micro_lm.langid_model_scores_sql(),
        ),
        (
            micro_lm.perplexity_model_scores(df),
            micro_lm.perplexity_model_scores_sql(),
        ),
    ]:
        got = sorted(tuple(r) for r in spark_df.collect())
        want = sorted(tuple(r) for r in con.sql(sql).fetchall())
        assert got == want


def test_langid_scores_match_pure_python(spark):
    """Third engine: recompute per-document score sums in pure Python
    (same md5 buckets, same weight freeze) and require exact equality
    with the Spark frame — triangulates Spark, DuckDB, and Python."""
    import random

    rng = random.Random(42)
    alphabet = "abcdefghij mnopqrstuv "
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80))))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w = micro_lm.langid_weights_micros()

    def py_score(text):
        norm = micro_lm._py_langid_norm(text)
        grams = [norm[i : i + 3] for i in range(len(norm) - 2)]
        sums = {
            lang: sum(
                w[lang][micro_lm._py_bucket(g, micro_lm.LANGID_B)]
                for g in grams
            )
            for lang in LANGS
        }
        return len(grams), sums

    got = {r["doc_id"]: r for r in micro_lm.langid_model_scores(df).collect()}
    for i, text in rows:
        n, sums = py_score(text)
        assert got[i]["n_grams"] == n, i
        for lang in LANGS:
            assert got[i][f"s_{lang}"] == sums[lang], (i, lang)


def test_ccnet_buckets_equal_thirds_head_is_fluent(spark):
    """Per predicted language the split is into (near-)equal thirds and
    head holds the LOWEST-perplexity (most fluent) docs."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = micro_lm.ccnet_ppl_buckets(docs).toPandas()
    for lang, grp in out.groupby("lang_pred"):
        sizes = grp["ppl_bucket"].value_counts()
        # ntile: bucket sizes differ by at most 1
        assert sizes.max() - sizes.min() <= 1, (lang, dict(sizes))
        if {"head", "tail"} <= set(sizes.index):
            assert grp[grp.ppl_bucket == "head"].ppl.max() <= (
                grp[grp.ppl_bucket == "tail"].ppl.min()
            )
