"""Domain-graph analytics: link synthesis, degree stats, and PageRank
power iteration (Page, Brin, Motwani, Winograd 1999; public method).

A crawl-curation pipeline ranks DOMAINS, not pages: seed lists,
crawl-frontier prioritization, and per-domain quality priors all key on
a host-level link graph that is 6-8 orders of magnitude smaller than
the page corpus. The shape here:

* **edge extraction** — one pass over the corpus produces (src_domain,
  dst_domain, weight) with weight = link multiplicity; the exchange
  carries domain-keyed fixed-width rows, never pages. The synthetic
  testdata has no hyperlinks, so edges are synthesized deterministically
  (doc_id-strided target over the observed domain set — same expression
  both engines); on real crawl data the extraction swaps in an href
  parse, everything downstream is unchanged.
* **per iteration** — contribution = rank/outdeg per SOURCE (map-only
  on the rank vector), one edge join, one groupBy(dst). The rank vector
  is |domains|-sized: broadcastable up to ~10^7 domains, a domain-keyed
  shuffle join beyond; hub-domain skew on the groupBy is AQE/salting
  territory, and the edge table is pre-partitioned by src so iterations
  reuse the same layout (no re-shuffle of the big side per round).
* **numeric discipline** — ranks live in integer micro-units: the
  damping update is r' = (15*M) div (100*n) + (85 * sum_in) div 100
  with sum_in a sum of INTEGER per-edge contributions (w * (r div
  outdeg)). Integer sums are order-independent, so Spark's partial
  aggregation and DuckDB's serial sum produce identical bits — the same
  discipline as the classifier/DSIR trainers, with no collect() at all:
  PageRank is pure dataflow, K chained join+agg stages.

Dangling nodes cannot occur here (every observed domain emits an edge);
nodes with no IN-edges receive the teleport base via a left join.

Reference parity note: the reference (mjanez/metadata-quality-stack)
has no graph analytics; beyond-reference training-data family (URL/
domain curation: urlops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_M = 1_000_000  # rank micro-unit
PR_ITER = 3
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85 as a ratio


def domain_nodes(docs: DataFrame) -> DataFrame:
    """(node, idx): observed domains, densely indexed by sort order.

    The unpartitioned row_number runs over the DISTINCT domain set
    (~10^7 hosts for a full crawl — slim strings, fits one task), not
    the documents; a corpus-sized input would need zipWithIndex-style
    per-partition offsets instead."""
    from pyspark.sql import Window

    return (
        docs.filter(F.col("source").isNotNull())
        .select(F.col("source").alias("node"))
        .distinct()
        .withColumn(
            "idx",
            F.row_number().over(Window.orderBy("node")) - 1,
        )
    )


def domain_edges(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic link graph over observed domains:
    doc with source-index s links to index (s + 1 + doc_id %
    max(n-1, 1)) % n. Weight = multiplicity. The idx dimension is
    broadcast; the only exchange is the final (src, dst) count."""
    nodes = domain_nodes(docs)
    n = nodes.agg(F.count("*").alias("n"))
    src = (
        docs.filter(F.col("source").isNotNull())
        .select("doc_id", F.col("source").alias("src"))
        .join(F.broadcast(nodes.withColumnRenamed("node", "src")), "src")
        .crossJoin(F.broadcast(n))
    )
    dst_idx = (
        F.col("idx")
        + 1
        + F.col("doc_id") % F.greatest(F.col("n") - 1, F.lit(1))
    ) % F.col("n")
    return (
        src.select("src", dst_idx.alias("dst_idx"))
        .join(
            F.broadcast(
                nodes.select(
                    F.col("node").alias("dst"), F.col("idx").alias("dst_idx")
                )
            ),
            "dst_idx",
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )


def domain_link_stats(docs: DataFrame) -> DataFrame:
    """Per-domain degree readout: (node, out_edges, out_weight,
    in_edges, in_weight) — the frontier-planning summary."""
    edges = domain_edges(docs)
    out = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_edges"), F.sum("w").alias("out_weight")
    )
    inn = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_edges"), F.sum("w").alias("in_weight")
    )
    return (
        domain_nodes(docs)
        .select("node")
        .join(out, "node", "left")
        .join(inn, "node", "left")
        .select(
            "node",
            F.coalesce("out_edges", F.lit(0)).alias("out_edges"),
            F.coalesce("out_weight", F.lit(0)).alias("out_weight"),
            F.coalesce("in_edges", F.lit(0)).alias("in_edges"),
            F.coalesce("in_weight", F.lit(0)).alias("in_weight"),
        )
    )


def domain_pagerank(docs: DataFrame, n_iter: int = PR_ITER) -> DataFrame:
    """K power-iteration rounds in integer micros over the synthetic
    deterministic edges: (node, rank_micro). Pure dataflow — no driver
    state; ranks stay distributed."""
    return _power_iterate(domain_nodes(docs).select("node"), domain_edges(docs), n_iter)


def page_link_edges(pages: DataFrame) -> DataFrame:
    """(src, dst, w) domain edges from REAL page bytes: decode html,
    parse nav hrefs (sources/pages.py:extract_links_column), canonical
    host on both sides. One scan + one (src, dst) count — link payloads
    never leave the scan stage."""
    from metadata_quality_stack_spark.operators.urlops import (
        domain_of,
        normalize_url,
    )
    from metadata_quality_stack_spark.sources.pages import (
        extract_links_column,
    )

    return (
        pages.select(
            domain_of(normalize_url(F.col("url"))).alias("src"),
            F.explode(extract_links_column(F.col("html"))).alias("href"),
        )
        .select("src", domain_of(normalize_url(F.col("href"))).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )


def pagerank_from_pages(pages: DataFrame, n_iter: int = PR_ITER) -> DataFrame:
    """PageRank over the REAL extracted link graph. Nodes = every
    domain seen as a source or target; targets that never link out are
    DANGLING — their rank mass leaks each round (raw power iteration;
    the classic fix redistributes dangling mass, one extra 1-row agg,
    omitted here for cross-engine simplicity and documented)."""
    edges = page_link_edges(pages)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    return _power_iterate(nodes, edges, n_iter)


def _power_iterate(
    nodes: DataFrame, edges: DataFrame, n_iter: int = PR_ITER
) -> DataFrame:
    """Shared integer-micro power iteration: (node, rank_micro)."""
    n = nodes.agg(F.count("*").alias("n"))
    outdeg = edges.groupBy("src").agg(F.sum("w").alias("outdeg"))
    base = F.expr(f"({100 - PR_DAMP_NUM} * {PR_M}) div ({PR_DAMP_DEN} * n)")
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", F.expr(f"{PR_M} div n").alias("r")
    )
    for _ in range(n_iter):
        contrib = ranks.join(
            outdeg, ranks.node == outdeg.src
        ).select("src", F.expr("r div outdeg").alias("c"))
        sum_in = (
            edges.join(contrib, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("c")).alias("s"))
        )
        ranks = (
            nodes.join(sum_in, nodes.node == sum_in.dst, "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    base
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(s, 0)) div {PR_DAMP_DEN}"
                    )
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").cast("long").alias("rank_micro"))


# ----------------------------------------------------------------------
# DuckDB oracle mirrors
# ----------------------------------------------------------------------
def _graph_ctes(table: str = "documents") -> str:
    return f"""nodes AS MATERIALIZED (
  SELECT source AS node, row_number() OVER (ORDER BY source) - 1 AS idx
  FROM (SELECT DISTINCT source FROM {table} WHERE source IS NOT NULL)),
nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
edges AS MATERIALIZED (
  SELECT s.node AS src, t.node AS dst, count(*) AS w
  FROM {table} d
  JOIN nodes s ON d.source = s.node
  CROSS JOIN nn
  JOIN nodes t ON t.idx = (s.idx + 1 + d.doc_id % greatest(nn.n - 1, 1)) % nn.n
  WHERE d.source IS NOT NULL
  GROUP BY 1, 2),
outdeg AS MATERIALIZED (SELECT src, sum(w) AS outdeg FROM edges GROUP BY src)"""


def domain_link_stats_sql(table: str = "documents") -> str:
    return f"""WITH {_graph_ctes(table)}
SELECT n.node,
  coalesce(o.out_edges, 0) AS out_edges,
  coalesce(o.out_weight, 0) AS out_weight,
  coalesce(i.in_edges, 0) AS in_edges,
  coalesce(i.in_weight, 0) AS in_weight
FROM nodes n
LEFT JOIN (SELECT src, count(*) AS out_edges, sum(w)::BIGINT AS out_weight
           FROM edges GROUP BY src) o ON o.src = n.node
LEFT JOIN (SELECT dst, count(*) AS in_edges, sum(w)::BIGINT AS in_weight
           FROM edges GROUP BY dst) i ON i.dst = n.node
"""


def domain_pagerank_sql(n_iter: int = PR_ITER, table: str = "documents") -> str:
    base = f"(({100 - PR_DAMP_NUM} * {PR_M}) // ({PR_DAMP_DEN} * nn.n))"
    parts = [
        _graph_ctes(table),
        f"r0 AS MATERIALIZED (SELECT node, ({PR_M} // nn.n) AS r "
        f"FROM nodes CROSS JOIN nn)",
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f"""r{k} AS MATERIALIZED (
  SELECT n.node,
    {base} + ({PR_DAMP_NUM} * coalesce(si.s, 0)) // {PR_DAMP_DEN} AS r
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst, sum(e.w * (p.r // o.outdeg)) AS s
    FROM edges e
    JOIN r{k - 1} p ON p.node = e.src
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) si ON si.dst = n.node)"""
        )
    return (
        f"WITH {','.join(parts)}\n"
        f"SELECT node, r::BIGINT AS rank_micro FROM r{n_iter}"
    )
