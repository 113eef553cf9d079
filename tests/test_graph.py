"""Domain graph: deterministic edge synthesis, degree stats, and
integer-micro PageRank — hand-checked tiny graphs, mass conservation,
teleport-only nodes, hostile rows, and the DuckDB replay."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import graph

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_two_node_graph_hand_computed(spark):
    # nodes a(idx0), b(idx1); n=2. doc 0 (a): dst idx (0+1+0%1)%2=1 -> b
    # doc 1 (b): (1+1+1%1)%2=0 -> a; doc 2 (a): -> b
    docs = _docs(spark, [(0, "a"), (1, "b"), (2, "a")])
    edges = {
        (r.src, r.dst): r.w for r in graph.domain_edges(docs).collect()
    }
    assert edges == {("a", "b"): 2, ("b", "a"): 1}
    # r0 = 500000 each. contrib a = 500000//2=250000, b = 500000//1=500000
    # sum_in(a) = 1*500000, sum_in(b) = 2*250000
    # base = 15*1e6 // (100*2) = 75000
    # r1(a) = 75000 + 85*500000//100 = 75000+425000 = 500000
    # r1(b) = 75000 + 85*500000//100 = 500000
    r1 = {
        r.node: r.rank_micro
        for r in graph.domain_pagerank(docs, 1).collect()
    }
    assert r1 == {"a": 500000, "b": 500000}


def test_sink_node_gets_teleport_base_only(spark):
    # 'c' never receives an in-edge in this layout: n=3, docs all from a
    # doc 0 (a, idx0): dst (0+1+0%2)%3=1 -> b; doc 3 (a): (1+3%2)%3=2 -> c
    docs = _docs(spark, [(0, "a"), (1, "b"), (2, "c")])
    stats = {r.node: r for r in graph.domain_link_stats(docs).collect()}
    assert all(stats[n].out_weight == 1 for n in "abc")
    assert sum(stats[n].in_weight for n in "abc") == 3


def test_rank_mass_conserved_within_truncation(spark):
    docs = spark.read.parquet(DOCS)
    ranks = graph.domain_pagerank(docs).agg(
        F.sum("rank_micro"), F.count("*")
    ).first()
    total, n = int(ranks[0]), int(ranks[1])
    # floor divisions leak a few micros per node per round (contrib,
    # damping, and base each truncate) — bound the leak, not the bits
    assert graph.PR_M - 10 * graph.PR_ITER * n <= total <= graph.PR_M


def test_null_source_rows_excluded(spark):
    docs = _docs(spark, [(0, "a"), (1, None), (2, "b")])
    nodes = {r.node for r in graph.domain_nodes(docs).collect()}
    assert nodes == {"a", "b"}
    assert graph.domain_edges(docs).agg(F.sum("w")).first()[0] == 2


def test_oracle_matches(spark):
    docs = spark.read.parquet(DOCS)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    for sp_df, sql in [
        (graph.domain_link_stats(docs), graph.domain_link_stats_sql()),
        (graph.domain_pagerank(docs), graph.domain_pagerank_sql()),
    ]:
        sp = sp_df.toPandas().sort_values("node").reset_index(drop=True)
        dk = con.execute(sql).fetchdf().sort_values("node").reset_index(drop=True)
        num = [c for c in sp.columns if c != "node"]
        sp[num] = sp[num].astype("int64")
        dk[num] = dk[num].astype("int64")
        pd.testing.assert_frame_equal(sp, dk)


def test_edge_build_broadcasts_node_dim(spark):
    docs = spark.read.parquet(DOCS)
    plan = (
        graph.domain_edges(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------ real-link pagerank
def test_page_link_edges_extracts_real_hrefs(spark):
    from metadata_quality_stack_spark.sources.pages import (
        extract_links_column,
        generate_pages,
        render_html,
    )

    pdf = generate_pages(120, seed=3).drop(columns=["row_class"])
    pages = spark.createDataFrame(pdf)
    # extraction parity: Spark href parse == generator's link lists
    total_links = pages.select(
        F.explode(extract_links_column(F.col("html")))
    ).count()
    assert 120 <= total_links <= 3 * 120
    edges = graph.page_link_edges(pages)
    assert edges.agg(F.sum("w")).first()[0] == total_links
    # a no-nav page yields no links (backward-compat template)
    bare = spark.createDataFrame(
        [(render_html("just text"),)], "html binary"
    )
    assert bare.select(
        F.explode_outer(extract_links_column(F.col("html")))
    ).first()[0] is None


def test_extract_text_unaffected_by_nav(spark):
    from metadata_quality_stack_spark.sources.pages import (
        extract_text,
        extract_text_column,
        render_html,
    )

    text = "line one\nline <two> & three"
    with_links = render_html(text, ("https://a.example/x", "https://b.example/y"))
    assert extract_text(with_links) == text
    df = spark.createDataFrame([(with_links,)], "html binary")
    assert df.select(extract_text_column(F.col("html"))).first()[0] == text


def test_pagerank_from_pages_runs_and_conserves_order(spark):
    from metadata_quality_stack_spark.sources.pages import generate_pages

    pdf = generate_pages(300, seed=5).drop(columns=["row_class"])
    pages = spark.createDataFrame(pdf)
    ranks = {r.node: r.rank_micro for r in graph.pagerank_from_pages(pages).collect()}
    assert len(ranks) >= 2
    # the Zipf head domain receives the most links -> highest rank
    assert max(ranks, key=ranks.get) == "big.example.com"


def test_dangling_mass_redistribution_conserves_rank(spark):
    """Raw power iteration LEAKS sink rank; the dangling-mass variant
    redistributes it. On the sink-pruned fixture graph (every 4th domain
    emits nothing) the dangling totals must stay within the integer-
    division truncation bound, and strictly above what the raw update
    would retain."""
    docs = spark.read.parquet(DOCS)
    nodes = graph.domain_nodes(docs)
    n = nodes.count()
    sinks = {
        r.node for r in nodes.filter(F.col("idx") % 4 == 0).collect()
    }
    assert sinks, "fixture must actually have sinks"
    ranks = {
        r.node: r.rank_micro
        for r in graph.pagerank_dangling_mass(docs).collect()
    }
    total = sum(ranks.values())
    # per round, each node's update truncates at most a few micros
    # (contrib div, dang div n, damping div) — bound the leak
    assert graph.PR_M - 20 * graph.PR_ITER * n <= total <= graph.PR_M
    # raw iteration over the SAME pruned graph leaks the sinks' mass
    raw = graph._power_iterate(
        nodes.select("node"), graph.sink_pruned_edges(docs)
    )
    raw_total = sum(r.rank_micro for r in raw.collect())
    leaked = sum(ranks[s] for s in sinks) * graph.PR_DAMP_NUM // 100
    assert total - raw_total > leaked // 2  # conservation is material


def test_real_link_edges_text_never_shuffles(spark):
    """The href parse happens scan-side: the Exchange under the
    (src, dst) count carries canonical domains only — html bytes never
    move (the 100 TB contract for link extraction)."""
    docs = spark.read.parquet(DOCS)
    plan = (
        graph.real_link_edges(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    ex = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert ex, "expected the (src, dst) aggregation exchange"
    assert all("html" not in ln for ln in ex)


def test_anchor_text_triples_scope_and_shape(spark):
    """Anchors outside <nav> must never be extracted (the fixture plants
    one in <main> on every page); no-nav pages contribute nothing; the
    href and text capture groups zip positionally."""
    docs = spark.read.parquet(DOCS)
    triples = graph.anchor_text_triples(graph.pages_with_links(docs))
    texts = {r.anchor_text for r in triples.select("anchor_text").distinct().collect()}
    assert texts == {"x", "y"}  # the <main> anchor text 'o' never leaks
    assert "outside.example.com" not in {
        r.dst for r in triples.select("dst").distinct().collect()
    }
    stats = graph.anchor_text_stats(docs)
    row = stats.filter(F.col("anchor_text") == "x").agg(
        F.sum("n_anchors").alias("n")
    ).collect()[0]
    # every page with a nav (9/10 of non-null-source docs) has one 'x' anchor
    n_nav_pages = (
        docs.filter(F.col("source").isNotNull())
        .filter(F.col("doc_id") % 10 != 0)
        .count()
    )
    assert row.n == n_nav_pages


def test_dense_rank_matches_global_sort_without_single_task(spark):
    """r5 scale fix: domain_nodes indexes by global sort order via an
    order-preserving prefix-bucket census — the result must be
    bit-identical to row_number() OVER (ORDER BY node), and the plan
    must contain NO SinglePartition exchange (the old global window
    funneled every domain through one task). Fixture crosses bucket
    boundaries, includes sub-prefix-length and non-ASCII names (UTF-8
    byte order == code-point order, so Python's census sort agrees
    with Spark's string ordering)."""
    names = ["a", "ab", "abc", "aa", "b", "ba", "z", "zz.example",
             "b", "émile.fr", "a9", "a-dash.net"]
    docs = _docs(spark, [(i, s) for i, s in enumerate(names)])
    nodes = graph.domain_nodes(docs)
    got = {r.node: r.idx for r in nodes.collect()}
    want = {n: i for i, n in enumerate(sorted(set(names)))}
    assert got == want
    plan = nodes._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
