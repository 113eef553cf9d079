"""Corpus shaping operators for training-data pipelines: deterministic
sampling, per-key quotas, score quantiles.

These are the operations a 100 TB curation run does between scoring and
export: carve a stable dev split, cap any one domain's contribution, and
read the score distribution before choosing thresholds. All native
expressions; the sample bucket is md5-derived (not engine-internal
xxhash) so the DuckDB oracle computes identical membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SAMPLE_BUCKETS = 100


def sample_bucket(id_col: F.Column) -> F.Column:
    """Stable 0..99 bucket from md5 of the stringified id — content-
    derived, so the same document lands in the same split across runs,
    clusters, and engines (the property rand()-sampling lacks)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 7), 16, 10).cast(
            "long"
        )
        % SAMPLE_BUCKETS
    )


def deterministic_sample(
    df: DataFrame, id_col: str = "doc_id", rate_pct: int = 10
) -> DataFrame:
    """Keep ~rate_pct% of rows, selected by content hash. Map-only: the
    predicate evaluates inside the scan stage, no shuffle, and composes
    with partition pruning upstream."""
    return df.filter(sample_bucket(F.col(id_col)) < rate_pct)


def _content_split(val_pct: int, test_pct: int) -> tuple[F.Column, F.Column]:
    """(bucket, split) expressions keyed on md5(text) — shared by the
    per-doc assignment and the token-budget rollup."""
    b = (
        F.conv(
            F.substring(F.md5(F.encode(F.col("text"), "UTF-8")), 1, 7), 16, 10
        ).cast("long")
        % SAMPLE_BUCKETS
    )
    split = (
        F.when(b < test_pct, F.lit("test"))
        .when(b < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return b, split


def corpus_token_budget(
    docs: DataFrame, val_pct: int = 5, test_pct: int = 5
) -> DataFrame:
    """The pre-training budget table: documents and whitespace tokens per
    (split, lang) — the first number anyone asks of a curated corpus
    ("how many train tokens per language do we actually have?"). Built
    on the same content-hash split as train_val_test_split, so the
    numbers describe exactly the splits that ship. Map-only token count
    + one partial-aggregated groupBy on a tiny (split, lang) key space."""
    from metadata_quality_stack_spark.functions.text import token_array

    _, split = _content_split(val_pct, test_pct)
    per_doc = docs.select(
        split.alias("split"),
        "lang",
        F.size(token_array(F.col("text"))).cast("long").alias("nt"),
    )
    return per_doc.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
    )


def corpus_token_budget_sql(
    table: str = "documents", val_pct: int = 5, test_pct: int = 5
) -> str:
    """DuckDB mirror of :func:`corpus_token_budget` (same md5 bucket and
    tokenization as the rest of the gate)."""
    trimmed = "regexp_replace(text, '^[ \\t\\n\\r]+|[ \\t\\n\\r]+$', '', 'g')"
    toks = (
        f"CASE WHEN length({trimmed}) = 0 THEN [] "
        f"ELSE string_split_regex({trimmed}, '[ \\t\\n\\r]+') END"
    )
    b = f"(('0x' || substr(md5(text), 1, 7))::BIGINT % {SAMPLE_BUCKETS})"
    return f"""
WITH t AS (
  SELECT CASE WHEN {b} < {test_pct} THEN 'test'
              WHEN {b} < {test_pct + val_pct} THEN 'val'
              ELSE 'train' END AS split,
         lang, len({toks}) AS nt
  FROM {table}
)
SELECT split, lang, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
FROM t GROUP BY 1, 2
"""


def train_val_test_split(
    docs: DataFrame, val_pct: int = 5, test_pct: int = 5
) -> DataFrame:
    """Deterministic train/val/test assignment keyed on the CONTENT
    fingerprint, not the doc id: bucket = md5(text)-derived 0..99, so
    byte-identical duplicate documents always land in the SAME split —
    the exact-duplicate leakage guard (id-keyed or rand() splits let a
    page crawled twice straddle train and test; fuzzy leakage is the
    companion operator contamination.decontaminate). Map-only: the
    bucket is one md5 over a column already being read, no shuffle, and
    the assignment is reproducible across runs, engines, and cluster
    sizes.

    Columns: doc_id, source, lang, bucket, split."""
    b, split = _content_split(val_pct, test_pct)
    return docs.select(
        "doc_id",
        "source",
        "lang",
        b.alias("bucket"),
        split.alias("split"),
    )


def train_val_test_split_sql(
    table: str = "documents", val_pct: int = 5, test_pct: int = 5
) -> str:
    """DuckDB mirror of :func:`train_val_test_split` (identical md5
    bucket arithmetic)."""
    b = f"(('0x' || substr(md5(text), 1, 7))::BIGINT % {SAMPLE_BUCKETS})"
    return f"""
SELECT doc_id, source, lang, {b} AS bucket,
       CASE WHEN {b} < {test_pct} THEN 'test'
            WHEN {b} < {test_pct + val_pct} THEN 'val'
            ELSE 'train' END AS split
FROM {table}
"""


def cap_per_key(
    df: DataFrame, key_col: str, n: int, order_col: str
) -> DataFrame:
    """At most ``n`` rows per key, deterministic preference order — the
    per-domain quota every crawl-curation pipeline applies so one hot
    domain cannot dominate the corpus. One shuffle on the key; skewed
    keys are exactly the rows being truncated, and AQE's skew-join
    splitting applies to the window exchange."""
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def score_quantiles(
    scored: DataFrame, probs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9)
) -> DataFrame:
    """Exact score quantiles (linear interpolation — Spark ``percentile``
    == DuckDB ``quantile_cont``), the threshold-choosing readout. Exact,
    not approx_percentile: the oracle must match bit-for-bit; at 100 TB
    swap in approx_percentile(…, accuracy) behind the same column names."""
    return scored.agg(
        *[
            F.round(
                F.expr(f"percentile(total_score, {p!r})"), 4
            ).alias(f"p{int(p * 100)}")
            for p in probs
        ]
    )


def chunk_documents(
    docs: DataFrame, chunk_chars: int = 500, overlap: int = 50
) -> DataFrame:
    """Split documents into fixed-size overlapping character windows —
    the sequence-shaping step between curation and tokenization (every
    pre-training pipeline packs docs into model-context-sized pieces;
    a token-budgeted variant swaps length() for a token count, same
    plumbing). Map-only: sequence + explode + substring are all native
    expressions evaluated inside the scan stage — no shuffle, no UDF,
    and chunking composes with partition pruning. Empty/NULL texts
    produce no chunks.

    Output: (doc_id, chunk_idx, chunk_start [1-based], chunk_text,
    n_chunk_chars)."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    step = chunk_chars - overlap
    n = F.length("text")
    starts = F.when(n >= 1, F.sequence(F.lit(1), n, F.lit(step))).otherwise(
        F.array().cast("array<int>")
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.substring(F.col("text"), F.col("chunk_start"), F.lit(chunk_chars)).alias(
                "chunk_text"
            ),
        )
        .withColumn("n_chunk_chars", F.length("chunk_text").cast("long"))
    )


def chunk_documents_sql(
    table: str = "documents", chunk_chars: int = 500, overlap: int = 50
) -> str:
    """DuckDB mirror of :func:`chunk_documents` (same 1-based substr)."""
    step = chunk_chars - overlap
    return f"""
WITH starts AS (
  SELECT doc_id, text,
         unnest(generate_series(1, len(text), {step})) AS chunk_start,
  FROM {table} WHERE len(text) >= 1
)
SELECT doc_id, CAST((chunk_start - 1) // {step} AS BIGINT) AS chunk_idx,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       substr(text, chunk_start, {chunk_chars}) AS chunk_text,
       CAST(len(substr(text, chunk_start, {chunk_chars})) AS BIGINT)
         AS n_chunk_chars
FROM starts
"""


def lang_mix_weights(docs: DataFrame) -> DataFrame:
    """Per-language resampling weights that rebalance the corpus to a
    uniform language mix: weight_l = target_share / actual_share (>1 =
    upsample, <1 = downsample) — the mixing table a data-loader or a
    weighted sampler consumes. Two tiny aggregations (per-lang counts,
    then the 1-row totals broadcast back); the big table is scanned
    once and only lang moves through the exchange."""
    per = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tot = per.agg(
        F.sum("n_docs").alias("total"), F.count("*").alias("n_langs")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.round(F.col("n_docs") / F.col("total"), 6).alias("actual_share"),
        F.round(1.0 / F.col("n_langs"), 6).alias("target_share"),
        F.round(
            (F.col("total") / F.col("n_langs")) / F.col("n_docs"), 6
        ).alias("weight"),
    )


def pack_chunks(
    chunks: DataFrame, context_chars: int = 2000, n_shards: int = 8
) -> DataFrame:
    """Concat-and-slice packing accounting (the GPT-style pretraining
    layout: concatenate a shard's chunks in deterministic order, slice
    into fixed context windows): assigns every chunk its byte offset in
    the shard stream and the context-window index where it starts.

    Scale shape: packing is embarrassingly parallel per shard —
    shard = doc_id % n_shards, ONE shuffle on the shard key, a running
    sum window inside each shard, no global ordering anywhere (a
    single global cumsum would serialize the corpus through one
    partition; per-shard streams are exactly how a multi-worker data
    loader consumes them). Deterministic order: (doc_id, chunk_idx).

    Output: (shard, doc_id, chunk_idx, start_offset [0-based in the
    shard stream], pack_bin = start_offset // context_chars)."""
    sharded = chunks.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("long")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = F.sum("n_chunk_chars").over(w) - F.col("n_chunk_chars")
    return sharded.select(
        "shard",
        "doc_id",
        "chunk_idx",
        start.alias("start_offset"),
        F.floor(start / context_chars).alias("pack_bin"),
    )


def pack_chunks_sql(
    table: str = "documents",
    chunk_chars: int = 500,
    overlap: int = 50,
    context_chars: int = 2000,
    n_shards: int = 8,
) -> str:
    """DuckDB mirror of chunk_documents |> pack_chunks."""
    return f"""
WITH chunks AS ({chunk_documents_sql(table, chunk_chars, overlap)}),
sharded AS (SELECT *, CAST(doc_id % {n_shards} AS BIGINT) AS shard FROM chunks),
off AS (
  SELECT shard, doc_id, chunk_idx,
         sum(n_chunk_chars) OVER (
           PARTITION BY shard ORDER BY doc_id, chunk_idx
           ROWS UNBOUNDED PRECEDING) - n_chunk_chars AS start_offset
  FROM sharded
)
SELECT shard, doc_id, chunk_idx, CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // {context_chars} AS BIGINT) AS pack_bin
FROM off
"""


def rebalance_corpus(docs: DataFrame) -> DataFrame:
    """Materialize the :func:`lang_mix_weights` table into an actual
    resampled corpus: every doc gets floor(weight) deterministic copies
    plus one more iff its md5 bucket falls under the fractional part —
    so upsampled languages repeat (integer + stochastic-but-stable
    fraction) and downsampled ones thin, with NO rand(): membership is
    content-derived and reproducible across runs/engines.

    Scale shape: the 5-row weight table broadcast-joins onto the scan
    (map-only), and the copy fan-out is explode(sequence(1, n)) in the
    same stage — the only shuffles are inside the tiny weight-table
    aggregation itself. Output: (doc_id, lang, copy_idx)."""
    w = lang_mix_weights(docs).select("lang", "weight")
    base = F.floor("weight").cast("long")
    frac_pct = F.floor((F.col("weight") - F.floor("weight")) * 100).cast(
        "long"
    )
    extra = (sample_bucket(F.col("doc_id")) < frac_pct).cast("long")
    n_copies = (base + extra).alias("n_copies")
    return (
        docs.join(F.broadcast(w), "lang")
        .select("doc_id", "lang", n_copies)
        .filter(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias(
                "copy_idx"
            ),
        )
    )


def rebalance_corpus_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`rebalance_corpus` (same rounded weights,
    same md5 bucket)."""
    return f"""
WITH per AS (SELECT lang, count(*) AS n_docs FROM {table} GROUP BY lang),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total, count(*) AS n_langs FROM per),
w AS (SELECT lang, round((total / n_langs) / n_docs, 6) AS weight FROM per, tot),
c AS (
  SELECT d.doc_id, d.lang,
         CAST(floor(w.weight) AS BIGINT)
         + CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT
                     % {SAMPLE_BUCKETS}
                     < CAST(floor((w.weight - floor(w.weight)) * 100) AS BIGINT)
                THEN 1 ELSE 0 END AS n_copies
  FROM {table} d JOIN w USING (lang)
)
SELECT doc_id, lang, unnest(generate_series(1, n_copies)) AS copy_idx
FROM c WHERE n_copies >= 1
"""


N_SHUFFLE_SHARDS = 8


def shuffle_shards(docs: DataFrame, n_shards: int = N_SHUFFLE_SHARDS) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE into training shards — the step that
    defeats crawl ordering (domain runs, recency runs) before sequence
    packing, without rand(): shard and within-shard order both derive
    from md5 of the doc id under a dedicated salt, so the exact same
    shard layout reproduces across runs, engines, and cluster sizes,
    and is independent of the sample/split buckets (different salt).

    Scale shape: ONE hash exchange on shard, then a per-shard sort. The
    window partitions by shard, so n_shards bounds parallelism — at
    100 TB size n_shards to the target training-file count (thousands),
    keeping each shard's sort a few GB. A writer composes this as
    repartition(n_shards, shard) + sortWithinPartitions(shuffle_key)
    + partitionBy(shard), one file per shard; `pos` is emitted here so
    the gate can hash the ORDER itself, not just membership.

    Columns: doc_id, shard, shuffle_key, pos."""
    key = F.md5(
        F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string"))
    )
    shard = (
        F.conv(F.substring(key, 1, 7), 16, 10).cast("long") % n_shards
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        docs.select(
            "doc_id", shard.alias("shard"), key.alias("shuffle_key")
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )


def shuffle_shards_sql(
    table: str = "documents", n_shards: int = N_SHUFFLE_SHARDS
) -> str:
    """DuckDB mirror of :func:`shuffle_shards` (same salted md5)."""
    key = f"md5('shuffle:' || CAST(doc_id AS VARCHAR))"
    return f"""
WITH k AS (
  SELECT doc_id, {key} AS shuffle_key,
         (('0x' || substr({key}, 1, 7))::BIGINT % {n_shards}) AS shard
  FROM {table}
)
SELECT doc_id, shard, shuffle_key,
       CAST(row_number() OVER (
            PARTITION BY shard ORDER BY shuffle_key, doc_id) AS BIGINT)
       AS pos
FROM k
"""


def temperature_mix(
    docs: DataFrame,
    group_col: str = "source",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Temperature-based mixture weights across sources at alpha = 0.5
    — the GPT-3 / Pile recipe (Brown et al. arXiv:2005.14165 Table 2.2;
    Gao et al. arXiv:2101.00027 §1): sampling probability proportional
    to size^alpha, which up-weights small curated sources and damps the
    raw-crawl bulk. Output feeds a weighted sampler (e.g. dsir_sample's
    Gumbel top-k) or a per-source epoch planner.

    Cross-engine exactness with a float power: alpha = 1/2 makes the
    weight sqrt(size), and IEEE-754 sqrt is CORRECTLY ROUNDED — the one
    power both engines compute bit-identically. Each source's weight is
    floored to integer micros immediately (one multiply + floor, both
    exactly mirrored), so the normalizing sum is an INTEGER sum —
    order-independent, hence safe to aggregate distributed — and the
    final share is integer division to parts-per-million.

    Scale: one partial-agged groupBy over the source key, then a 1-row
    total broadcast-joined back. Source/domain counts are bounded
    (thousands), so the readout is tiny no matter the corpus size.

    Columns: source, n_docs, size_units, w_micros, p_ppm.
    """
    per = docs.groupBy(F.col(group_col).alias("source")).agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum(weight_col), F.lit(0)).alias("size_units"),
    )
    w = F.floor(
        F.sqrt(F.col("size_units").cast("double")) * F.lit(1_000_000.0)
    ).cast("long")
    weighted = per.withColumn("w_micros", w)
    total = weighted.agg(F.sum("w_micros").alias("_tot"))
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "size_units",
            "w_micros",
            F.expr("(w_micros * 1000000) div _tot").alias("p_ppm"),
        )
    )


def temperature_mix_sql(
    table: str = "documents",
    group_col: str = "source",
    weight_col: str = "n_chars",
) -> str:
    return f"""
WITH per AS (
  SELECT {group_col} AS source, count(*)::BIGINT AS n_docs,
         coalesce(sum({weight_col}), 0)::BIGINT AS size_units
  FROM {table} GROUP BY 1
),
w AS (SELECT source, n_docs, size_units,
        CAST(floor(sqrt(size_units::DOUBLE) * 1000000.0) AS BIGINT)
          AS w_micros
      FROM per),
t AS (SELECT sum(w_micros)::BIGINT AS tot FROM w)
SELECT source, n_docs, size_units, w_micros,
       ((w_micros * 1000000) // tot)::BIGINT AS p_ppm
FROM w, t
"""


def length_outlier_trim(
    docs: DataFrame,
    len_col: str = "n_chars",
    group_col: str = "lang",
    pct: int = 1,
) -> DataFrame:
    """Per-language length-outlier trim: drop documents STRICTLY below
    the group's p{pct} length value or strictly above its p{100-pct}
    value (ties at the cutoff survive, so the rule is a pure value
    threshold). The C4/Gopher min/max-length rules with data-derived
    cutoffs instead of global constants — a 50-char page is an outlier
    in English but not necessarily in Chinese.

    Scale shape — deliberately NOT a per-document rank window (a global
    sort per language is the straggler at 10^12 docs, and `lang` is the
    canonical skewed key): pass 1 collapses the corpus to a (lang,
    length) HISTOGRAM — bounded by #langs x #distinct-lengths, not by
    rows — whose cumulative counts yield each group's two cutoff VALUES
    (a tiny window over the histogram); pass 2 broadcast-joins the
    #langs-row cutoff table back and filters map-side. Integer
    arithmetic only (rank_lo = n*pct//100), so both engines cut
    identically.

    Columns: doc_id, lang, n_chars, keep.
    """
    hist = docs.groupBy(group_col, len_col).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(group_col).orderBy(len_col)
    cum = hist.select(
        group_col,
        len_col,
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(group_col)).alias("n"),
    )
    # lo cutoff: smallest value whose cumulative count exceeds n*pct//100
    # (i.e. the p{pct} value); hi cutoff: smallest value with
    # cum >= n - n*pct//100 (the p{100-pct} value)
    cuts = (
        cum.select(
            group_col,
            len_col,
            (F.col("cum") > F.expr(f"(n * {pct}) div 100")).alias("_lo_ok"),
            (F.col("cum") >= F.col("n") - F.expr(f"(n * {pct}) div 100")).alias(
                "_hi_ok"
            ),
        )
        .groupBy(group_col)
        .agg(
            F.min(F.when(F.col("_lo_ok"), F.col(len_col))).alias("lo_val"),
            F.min(F.when(F.col("_hi_ok"), F.col(len_col))).alias("hi_val"),
        )
    )
    return (
        docs.join(F.broadcast(cuts), group_col, "left")
        .select(
            "doc_id",
            group_col,
            len_col,
            (
                (F.col(len_col) >= F.col("lo_val"))
                & (F.col(len_col) <= F.col("hi_val"))
            ).alias("keep"),
        )
    )


def length_outlier_trim_sql(
    table: str = "documents",
    len_col: str = "n_chars",
    group_col: str = "lang",
    pct: int = 1,
) -> str:
    return f"""
WITH hist AS (
  SELECT {group_col}, {len_col}, count(*)::BIGINT AS cnt
  FROM {table} GROUP BY 1, 2
),
cum AS (
  SELECT {group_col}, {len_col},
         sum(cnt) OVER (PARTITION BY {group_col}
                        ORDER BY {len_col}) AS cum,
         sum(cnt) OVER (PARTITION BY {group_col}) AS n
  FROM hist
),
cuts AS (
  SELECT {group_col},
         min(CASE WHEN cum > (n * {pct}) // 100 THEN {len_col} END)
           AS lo_val,
         min(CASE WHEN cum >= n - (n * {pct}) // 100 THEN {len_col} END)
           AS hi_val
  FROM cum GROUP BY 1
)
SELECT doc_id, d.{group_col}, {len_col},
       ({len_col} >= lo_val AND {len_col} <= hi_val) AS keep
FROM {table} d LEFT JOIN cuts USING ({group_col})
"""


def score_quantiles_sampled(
    scored: DataFrame,
    probs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
    rate_pct: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """The SCALE PATH for quantiles, still gate-exact: exact quantiles
    over a deterministic md5-bucket sample. Spark's approx_percentile is
    the usual 100 TB answer but its sketch is engine-private — the gate
    can never verify it. A content-keyed sample is the verifiable
    alternative: membership is a map-only predicate (same row set in any
    engine, any cluster size, any run), the exact percentile then runs
    over rate_pct% of the data, and the estimate's error is the standard
    sampling error (~1/sqrt(n·rate)) rather than an opaque sketch bound.
    Emits n_sampled alongside so the reader can judge that error.

    Columns: n_sampled, p10, p25, p50, p75, p90 (for default probs)."""
    s = scored.filter(sample_bucket(F.col(id_col)) < rate_pct)
    return s.agg(
        F.count("*").alias("n_sampled"),
        *[
            F.round(
                F.expr(f"percentile(total_score, {p!r})"), 4
            ).alias(f"p{int(p * 100)}")
            for p in probs
        ],
    )


def quality_weighted_sample(
    scored: DataFrame, id_col: str = "doc_id", max_score: int | None = None
) -> DataFrame:
    """Score-proportional soft sampling (the DCLM-B / "soft quality
    filter" alternative to a hard keep threshold): each document is kept
    with probability total_score / max_score, so borderline pages enter
    the corpus at reduced rate instead of being cliff-dropped — the
    mixing knob used when a hard cut measurably hurts downstream
    diversity (Li et al. 2024, DataComp-LM §4.2; GPT-3's
    quality-weighted Common Crawl sampling, Brown et al. 2020 App. A).

    Determinism: the coin is the content-stable md5 bucket of the doc
    id (sample_bucket), and the comparison is the integer
    cross-multiplication ``bucket * max_score < total_score *
    SAMPLE_BUCKETS`` — no division, no floats, so membership is
    bit-identical across engines/runs/cluster sizes and the DuckDB
    oracle replays it exactly. Map-only: the predicate fuses into the
    scoring projection's scan stage, no shuffle, composes with
    partition pruning; at 10^12 docs this is a free rider on the
    scoring pass.

    Columns: doc_id, total_score, rating."""
    from metadata_quality_stack_spark import config
    from metadata_quality_stack_spark.operators.rules import filter_scored

    m = int(max_score if max_score is not None else config.MAX_SCORE)
    b = sample_bucket(F.col(id_col))
    # filter_scored (observe barrier), NOT .filter(): pushdown would
    # re-inline the whole scoring expression tree into the predicate and
    # overflow Janino's 64 KB method limit (rules.filter_scored doc)
    return filter_scored(
        scored, b * F.lit(m) < F.col("total_score") * F.lit(SAMPLE_BUCKETS)
    ).select(id_col, "total_score", "rating")


def quality_weighted_sample_sql(
    scored_cte: str, id_col: str = "doc_id", max_score: int | None = None
) -> str:
    """DuckDB mirror of :func:`quality_weighted_sample` over a scored
    CTE body (same md5 bucket + integer cross-multiplication)."""
    from metadata_quality_stack_spark import config

    m = int(max_score if max_score is not None else config.MAX_SCORE)
    b = (
        f"(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 7))::BIGINT"
        f" % {SAMPLE_BUCKETS})"
    )
    return (
        f"WITH scored AS ({scored_cte}) "
        f"SELECT {id_col}, total_score, rating FROM scored "
        f"WHERE {b} * {m} < total_score * {SAMPLE_BUCKETS}"
    )


def eval_set_stratified(
    docs: DataFrame,
    strata_col: str = "lang",
    n_per_stratum: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size per-stratum held-out sample (the eval-set builder: N
    docs from EVERY language/source regardless of how skewed the corpus
    mix is — a plain rate sample hands minority strata to chance).
    Membership is deterministic: rank within each stratum by
    (md5(id), id) — a content-stable pseudo-random order both engines
    compute identically — and keep the first N. cap_per_key is the
    quota sibling (deterministic PREFERENCE order); this one wants the
    opposite: an order uncorrelated with anything.

    One shuffle on the stratum key (bounded strata); the skewed-stratum
    window cost is capped by N — row_number short-circuits nothing, but
    only (id, stratum, md5) triples move, never text.

    Columns: strata (aliased from strata_col), doc_id,
    rank_in_stratum (1-based)."""
    return (
        docs.select(F.col(strata_col).alias("strata"), id_col)
        .withColumn(
            "rank_in_stratum",
            F.row_number().over(
                Window.partitionBy("strata").orderBy(
                    F.md5(F.col(id_col).cast("string")).asc(),
                    F.col(id_col).asc(),
                )
            ),
        )
        .filter(F.col("rank_in_stratum") <= n_per_stratum)
    )


def eval_set_stratified_sql(
    table: str = "documents",
    strata_col: str = "lang",
    n_per_stratum: int = 20,
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`eval_set_stratified` (identical md5-hex
    ordering — ASCII compare of lowercase hex is engine-independent)."""
    return f"""
SELECT strata, {id_col}, rank_in_stratum FROM (
  SELECT {strata_col} AS strata, {id_col},
         row_number() OVER (
           PARTITION BY {strata_col}
           ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}
         )::INT AS rank_in_stratum
  FROM {table})
WHERE rank_in_stratum <= {n_per_stratum}
"""
