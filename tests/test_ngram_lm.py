"""Trained bigram LM: fixed-point log2 exactness, scoring semantics,
hostile rows, and the bounded-exchange / broadcast-join plan shape."""

import math

from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import ngram_lm


def _py_log2fp(x: int) -> int:
    """Python replica of the mantissa-squaring fixed-point log2."""
    i = x.bit_length() - 1
    m = x << (ngram_lm._S - i) if i <= ngram_lm._S else x >> (i - ngram_lm._S)
    acc = 0
    for _ in range(ngram_lm.LOG2_F_BITS):
        t = (m * m) >> ngram_lm._S
        if t >= 1 << (ngram_lm._S + 1):
            acc = acc * 2 + 1
            m = t >> 1
        else:
            acc = acc * 2
            m = t
    return (i << ngram_lm.LOG2_F_BITS) + acc


def test_log2fp_matches_python_and_math(spark):
    xs = [1, 2, 3, 5, 8, 100, 257, 65536, 10**6, 2**31 - 1, 2**40 + 12345]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    out = ngram_lm._log2fp_spark(df, "x", "l_fp")
    got = {r.x: r.l_fp for r in out.collect()}
    scale = 1 << ngram_lm.LOG2_F_BITS
    for x in xs:
        assert got[x] == _py_log2fp(x), x
        # within one fixed-point ulp of the real log2 (truncating algo)
        assert abs(got[x] / scale - math.log2(x)) <= 2 / scale, x
    assert got[1] == 0 and got[2] == scale and got[8] == 3 * scale


def test_surprisal_orders_frequent_below_rare(spark):
    """Self-scored: a document whose bigrams the corpus repeats heavily
    must average fewer bits than one made of corpus-unique pairs."""
    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common) for i in range(20)]
    rows.append((100, "zxqv wkjh pqrs mnbv asdf ghjk"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in ngram_lm.ngram_lm_surprisal(docs).collect()}
    assert out[0].avg_bits < out[100].avg_bits
    assert out[0].n_bigrams == 8 and out[100].n_bigrams == 5


def test_surprisal_hostile_rows(spark):
    docs = spark.createDataFrame(
        [(0, "normal text here"), (1, ""), (2, None), (3, "solo"), (4, "  ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_lm.ngram_lm_surprisal(docs).collect()}
    assert len(out) == 5
    for d in (1, 2, 3, 4):
        assert out[d].n_bigrams == 0 and out[d].surprisal_fp == 0
        assert out[d].avg_bits is None
    assert out[0].n_bigrams == 2 and out[0].surprisal_fp > 0


def test_surprisal_plan_shape(spark):
    """Counts aggregate on bucket keys (bounded exchanges), the model
    and backoff ride broadcasts into the scoring join, and text never
    enters an Exchange."""
    import re

    from tests.test_plan_shapes import SF_DIR, plan_str

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_str(ngram_lm.ngram_lm_surprisal(docs))
    assert plan.count("BroadcastHashJoin") >= 2
    ex_ids = set(re.findall(r"\((\d+)\)\s+Exchange", plan))
    for i in ex_ids:
        m = re.search(rf"\({i}\) Exchange\n(.*?)\n\n", plan, re.S)
        blk = m.group(1) if m else ""
        assert "text#" not in blk and "_tk#" not in blk, blk


def test_token_entropy_semantics(spark):
    """Hand-checkable entropies: uniform tokens -> log2(k) bits within
    fixed-point truncation; constant doc -> 0; hostile rows -> 0/None."""
    docs = spark.createDataFrame(
        [
            (0, "a b c d"),          # 4 distinct, uniform -> H = 2.0 exactly
            (1, "x x x x x"),        # constant -> H = 0
            (2, "a a b b"),          # H = 1.0 exactly
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_lm.token_entropy(docs).collect()}
    assert out[0].n_tokens == 4 and abs(out[0].avg_entropy_bits - 2.0) < 0.01
    assert out[1].avg_entropy_bits == 0.0
    assert abs(out[2].avg_entropy_bits - 1.0) < 0.01
    for d in (3, 4):
        assert out[d].n_tokens == 0 and out[d].avg_entropy_bits is None
    # spam (low entropy) orders below prose (high entropy)
    spam = spark.createDataFrame(
        [(0, "buy cheap pills " * 30), (1, "varied words compose an actual sentence here")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.avg_entropy_bits for r in ngram_lm.token_entropy(spam).collect()}
    assert got[0] < got[1]


def test_source_kl_semantics(spark):
    """KL is ~0 for a source matching the corpus mix, positive and
    larger for a divergent source; null-source rows are excluded."""
    common = "alpha beta gamma delta epsilon zeta"
    rows = (
        [(i, common, "s_match") for i in range(10)]
        + [(100 + i, common, "s_other") for i in range(10)]
        + [(200, "unique spammy pills pills pills tokens", "s_weird")]
        + [(300, common, None)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in ngram_lm.source_kl(docs).collect()}
    assert None not in out and len(out) == 3
    # the two matching sources see (almost) the corpus distribution
    assert out["s_match"].kl_bits < 0.2
    # the divergent source diverges by more
    assert out["s_weird"].kl_bits > out["s_match"].kl_bits + 0.5
    # KL >= 0 up to fixed-point truncation (one ulp per term)
    for r in out.values():
        assert r.kl_bits > -0.01


def test_stored_cycle_exercises_backoff(spark, tmp_path):
    """Scoring a DIFFERENT batch against a stored model must route
    unseen pairs through the context backoff and unseen contexts to
    the uniform default — and storage must be value-transparent
    (stored-model scores == in-plan-model scores on the same split)."""
    rows = [(i, "shared common phrasing appears here" if i % 2 == 0
             else "totally novel unseen wording instead") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           ngram_lm.ngram_lm_stored_cycle(spark, docs).collect()}
    assert set(out) == {1, 3, 5, 7}  # odd half only
    # the odd docs' bigrams never occur in the even training half:
    # every pair scores the unseen-context default (model trained on
    # even half shares no token buckets) or a backoff — all positive
    for r in out.values():
        assert r.n_bigrams == 4 and r.surprisal_fp > 0
    # value transparency: same split scored against the in-plan model
    train = docs.filter("doc_id % 2 = 0")
    score = docs.filter("doc_id % 2 = 1")
    direct = {
        r.doc_id: r.surprisal_fp
        for r in ngram_lm.score_against_model(
            ngram_lm.ngram_lm_model(train), score
        ).collect()
    }
    assert direct == {d: r.surprisal_fp for d, r in out.items()}


def test_by_lang_models_are_independent(spark):
    """A phrase common in lang A but absent from lang B must score
    cheaper under A's model than the same phrase does for a B doc —
    the pooled-model failure the per-language split exists to fix."""
    en = "the cat sat on the mat and the dog sat too"
    rows = [(i, en, "en") for i in range(10)]
    rows += [(100 + i, "der hund lief durch den garten heute morgen", "de")
             for i in range(10)]
    rows.append((200, en, "de"))   # EN phrasing labeled de: de model never saw it
    rows.append((300, en, None))   # null lang excluded
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in ngram_lm.ngram_lm_by_lang(docs).collect()}
    assert 300 not in out
    assert out[0].avg_bits < out[200].avg_bits  # own-language phrasing is cheap
    assert out[200].n_bigrams == out[0].n_bigrams


def test_fp_round6_midpoint_is_engine_identical():
    """r5 regression: fp/n/1024 landing on an exact 7-digit decimal
    midpoint (sf0.001 doc 95: 20552/5/1024 = 4.0140625) rounded UP in
    Spark (BigDecimal half-up on the decimal string) but DOWN in
    DuckDB (raw-double rounding). The readout now resolves the
    midpoint in int64 before the single exact double division; both
    engines must emit 4.014063 — and agree on sign-safe floor for a
    (truncation-artifact) negative fp."""
    import duckdb

    from metadata_quality_stack_spark.operators.ngram_lm import (
        _fp_round6_expr,
    )

    con = duckdb.connect()
    for fp, n, want in [
        (20552, 5, 4.014063),   # the observed midpoint
        (20551, 5, 4.013867),   # off-midpoint sanity
        (0, 0, None),           # empty doc -> NULL
        (-3, 7, -0.000419),     # negative fp: floor-consistent half-up
    ]:
        got = con.execute(
            f"SELECT {_fp_round6_expr(str(fp), str(n), '//')}"
        ).fetchone()[0]
        assert got == want, (fp, n, got)
    # the Spark spelling is the same string with 'div' — parity of the
    # two spellings on the midpoint is covered by the gate replica
    # (token_entropy at SF_DIR=sf0.001), which failed before this fix
