"""URL canonicalization: Spark/DuckDB parity on hostile inputs, dedup
semantics, and the scale-shape of the dedup plan (partial agg before the
one exchange; page text never shuffles)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import urlops

CASES = [
    "HTTPS://WWW.Ex.COM/Page/3/",
    "http://ex.com/page/3?utm_source=feed&utm_campaign=c2",
    "https://ex.com/page/3?id=5&utm_medium=x",
    "https://ex.com/page/3?utm_source=feed&ref=r7",     # separator repair
    "http://www.ex.com/page/3#section-2",
    "https://ex.com/page/3/?utm_source=a",              # slash + all-tracking
    "ex.com/page/3?",                                   # no scheme, empty query
    "https://ex.com:8080/a?fbclid=xyz&q=1&gclid=2",     # port + mixed tracking
    "",                                                 # hostile: empty
    "   ",                                              # hostile: whitespace
    "https://",                                         # hostile: scheme only
    "?utm_source=x",                                    # hostile: query only
    None,                                               # hostile: NULL
]


def test_normalize_parity_spark_vs_duckdb(spark):
    sdf = spark.createDataFrame([(c,) for c in CASES], "url string")
    got = [
        r.n
        for r in sdf.select(
            urlops.normalize_url(F.col("url")).alias("n")
        ).collect()
    ]
    con = duckdb.connect()
    expr = urlops.normalize_url_sql("url")
    want = [
        con.execute(f"SELECT {expr} FROM (SELECT ?::VARCHAR AS url)", [c]).fetchone()[0]
        for c in CASES
    ]
    assert got == want


def test_normalize_expected_values(spark):
    sdf = spark.createDataFrame([(c,) for c in CASES[:8]], "url string")
    got = [
        r.n
        for r in sdf.select(
            urlops.normalize_url(F.col("url")).alias("n")
        ).collect()
    ]
    assert got == [
        "ex.com/page/3",
        "ex.com/page/3",
        "ex.com/page/3?id=5",
        "ex.com/page/3?ref=r7",
        "ex.com/page/3",
        "ex.com/page/3",
        "ex.com/page/3",
        "ex.com:8080/a?q=1",
    ]


def test_url_dedup_collapses_equivalent_forms(spark):
    rows = [
        (1, "HTTPS://WWW.Ex.COM/a/"),
        (2, "http://ex.com/a"),
        (3, "ex.com/a?utm_source=feed"),
        (4, "https://ex.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.url_norm: (r.doc_id, r.n_dups) for r in urlops.url_dedup(df).collect()}
    assert out == {"ex.com/a": (1, 3), "ex.com/b": (4, 1)}


def test_domain_stats(spark):
    rows = [
        (1, "https://a.com/x", 10),
        (2, "http://www.a.com/x", 30),   # same canonical url as 1
        (3, "https://a.com:443/y", 20),  # port stripped -> same domain
        (4, "https://b.com/z", 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    out = {r.domain: (r.n_docs, r.n_urls, r.avg_chars) for r in urlops.domain_stats(df).collect()}
    assert out == {"a.com": (3, 2, 20.0), "b.com": (1, 1, 40.0)}


def test_latest_snapshot_per_url(spark):
    rows = [
        (1, "https://a.com/x", 100),
        (2, "http://www.a.com/x/", 300),   # same canonical url, newest
        (3, "a.com/x?utm_source=f", 200),
        (4, "https://b.com/y", 50),
        (5, "https://b.com/y", 50),        # exact ts tie -> max doc_id wins
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, warc_ts long")
    out = {
        r.url_norm: (r.doc_id, r.warc_ts, r.n_snapshots)
        for r in urlops.latest_snapshot_per_url(df).collect()
    }
    assert out == {"a.com/x": (2, 300, 3), "b.com/y": (5, 50, 2)}

    plan = (
        urlops.latest_snapshot_per_url(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # agg formulation: no window, no SortAggregate (the decimal-packed
    # ordering keeps max_by hash-aggregable — struct orderings silently
    # fall back to SortAggregate), map-side combine, one exchange
    assert "Window" not in plan and "SortAggregate" not in plan
    assert plan.count("Exchange") == 1 and plan.count("HashAggregate") == 2


def test_blocklist_filter_variants_agree_and_broadcast(spark):
    rows = [
        (1, "https://bad.com/x"),
        (2, "http://www.bad.com/y"),      # www-normalized into the block
        (3, "https://good.com/z"),
        (4, "https://bad.com.evil.org/"), # suffix lookalike must SURVIVE
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    blocked = ["bad.com"]

    lit_ids = sorted(r.doc_id for r in urlops.blocklist_filter(df, blocked).collect())
    bl_df = spark.createDataFrame([(b,) for b in blocked], "domain string")
    join_out = urlops.blocklist_filter(df, bl_df)
    join_ids = sorted(r.doc_id for r in join_out.collect())
    assert lit_ids == join_ids == [3, 4]

    plan = join_out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning" not in plan  # pages side never shuffles


def test_dedup_plan_partial_agg_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, "https://a.com/x", 5)], "doc_id long, url string, n_chars long"
    )
    plan = urlops.url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    # map-side combine before the shuffle: two HashAggregates
    assert plan.count("HashAggregate") == 2
    # the shuffled rows carry only (url_norm, partial min, partial count)
    # — in particular not the unused n_chars column
    exchange_line = next(l for l in plan.splitlines() if "Exchange" in l)
    assert "n_chars" not in exchange_line and "url_norm" in exchange_line


def test_domain_cap_two_phase_equals_single_window(spark):
    # 600 synthetic pages over 3 domains with a hot one (d0 gets ~80%);
    # the two-phase salted plan must reproduce the naive single window
    # exactly (same kept doc_ids, same ranks)
    from pyspark.sql import Window

    rows = []
    for i in range(600):
        dom = "d0" if i % 5 != 0 else f"d{1 + i % 2}"
        rows.append((i, f"https://{dom}.ex.com/p/{i}"))
    pages = spark.createDataFrame(rows, "doc_id long, url string")
    got = urlops.domain_cap(pages, k=7, salt_buckets=4).collect()

    u = urlops.normalize_url(F.col("url"))
    naive = (
        pages.select(
            "doc_id",
            urlops.domain_of(u).alias("domain"),
            urlops._h60_url(u).alias("pri"),
        )
        .withColumn(
            "rk",
            F.row_number()
            .over(Window.partitionBy("domain").orderBy("pri", "doc_id"))
            .cast("long"),
        )
        .where(F.col("rk") <= 7)
        .select("doc_id", "domain", "rk")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, naive))
    per_domain = {}
    for r in got:
        per_domain[r.domain] = per_domain.get(r.domain, 0) + 1
    assert all(v <= 7 for v in per_domain.values())
    assert per_domain["d0.ex.com"] == 7  # the hot domain is actually capped


def test_domain_cap_phase1_bounds_survivors(spark):
    # phase 1 must bound any domain's final-exchange rows to S*k —
    # asserted by running phase 1 alone via a tiny salt count
    rows = [(i, "https://hot.ex.com/p/%d" % i) for i in range(200)]
    pages = spark.createDataFrame(rows, "doc_id long, url string")
    out = urlops.domain_cap(pages, k=3, salt_buckets=2)
    assert out.count() == 3
    # survivor bound: with S=2,k=3 at most 6 rows reach the exact window;
    # equality of results vs naive is covered above, here we check the
    # plan has two window nodes (partial + exact), i.e. the two-phase
    # shape is really in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "gone"), ("u2", "before2")],
        "url_norm string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u4", "fresh")],
        "url_norm string, text string",
    )
    got = {r.status: r.n_urls for r in urlops.snapshot_diff(old, new).collect()}
    assert got == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_rescore_delta_scores_only_churn(spark):
    """Unchanged urls carry their OLD stored score without re-scoring
    (proved by poisoning the old score), changed/added urls get fresh
    scores, removed urls drop, and multi-capture urls resolve
    deterministically (min-hash capture old side, min-id new side)."""
    body = (
        "This is a sufficiently long and reasonably clean webpage "
        "paragraph that the native rules will score consistently. " * 3
    )
    old_rows = [
        (1, "u/a", body + "alpha"),
        (2, "u/b", body + "beta"),
        (3, "u/gone", body + "gone"),
    ]
    new_rows = [
        (11, "u/a", body + "alpha"),      # unchanged -> carried
        (12, "u/b", body + "beta CHANGED"),  # changed -> scored
        (13, "u/new", body + "new"),      # added -> scored
        (14, "u/a", body + "alpha"),      # second capture, same text
    ]
    schema = "doc_id long, url_norm string, text string"
    mk = lambda rows: spark.createDataFrame(rows, schema).select(  # noqa: E731
        "*",
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.length("text").alias("n_chars"),
    )
    from metadata_quality_stack_spark.operators.analytics import DOC_META
    from metadata_quality_stack_spark.operators.rules import apply_quality

    score = lambda df: apply_quality(df, meta_cols=DOC_META)  # noqa: E731
    # poison the stored score for u/a: if 'carried' truly reuses the old
    # row, the poison must surface; if it re-scored, it could not
    old = score(mk(old_rows)).withColumn(
        "total_score",
        F.when(F.col("url_norm") == "u/a", F.lit(999)).otherwise(
            F.col("total_score")
        ),
    )
    out = {
        r.url_norm: r
        for r in urlops.rescore_delta(old, mk(new_rows), score).collect()
    }
    assert set(out) == {"u/a", "u/b", "u/new"}  # u/gone removed
    assert out["u/a"].action == "carried" and out["u/a"].total_score == 999
    assert out["u/b"].action == "scored"
    assert out["u/new"].action == "scored"
    # fresh scores are real rule outputs, not carried poison
    assert out["u/b"].total_score != 999 and out["u/new"].total_score != 999


def test_url_feature_census_hostile_and_spam_scoring(spark):
    from metadata_quality_stack_spark.operators.urlops import url_feature_census

    rows = [
        # clean page: short, no digits, no query
        (0, "https://www.example.com/about"),
        # spam-word hit + digit-heavy + hyphen-stuffed host + deep subdomains
        (1, "http://best-casino-777.win-now-today.a.b.c.d.example.com/"
            "offer123456?ref=9999"),
        # long url crossing the 96-char line, no other flags
        (2, "https://example.org/" + "a" * 90),
        (3, "example.com"),  # bare host, no scheme/path
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r.asDict() for r in url_feature_census(docs).collect()}
    assert out[0]["url_spam_score"] == 0
    assert out[0]["has_query"] == 0
    # doc 1 (78 chars, under the 96 line): spam word (2) + digits>5 (1)
    # + hyphens>2 (1) + subdomain_depth>3 (1) = 5
    assert out[1]["spam_word_hit"] == 1
    assert out[1]["n_digits"] > 5
    assert out[1]["n_hyphens_host"] > 2
    assert out[1]["subdomain_depth"] > 3
    assert out[1]["url_spam_score"] == 5
    assert out[2]["url_spam_score"] == 1  # length only
    assert out[3]["path_depth"] == 0 and out[3]["url_spam_score"] == 0
