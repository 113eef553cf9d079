"""LSH banding scale-safety: no-shingle (< 3 token) docs must not share a
degenerate band bucket, or the candidate self-join goes quadratic on
exactly the rows a web crawl has billions of (empty/boilerplate-short
pages). See VERDICT r1 'What's wrong #2'."""

from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import dedup


def _corpus(spark, n_short=1000):
    """n_short docs with < 3 tokens (no shingles) + 3 pairs of true dups."""
    short = [(i, ["", "x", "a b"][i % 3]) for i in range(n_short)]
    dup_text = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs before noon today ok",
        "how vexingly quick daft zebras jump over fences at night now",
    ]
    dups = [(n_short + i, dup_text[i % 3]) for i in range(6)]
    return spark.createDataFrame(short + dups, "doc_id long, text string")


def test_short_docs_excluded_from_bands(spark):
    docs = _corpus(spark)
    bands = dedup.minhash_bands(docs)
    # only the 6 dup docs have shingles -> 6 * N_BANDS band rows
    assert bands.count() == 6 * dedup.N_BANDS
    assert bands.filter(F.col("doc_id") < 1000).count() == 0


def test_candidate_pairs_stay_linear(spark):
    """1000 no-shingle docs + 3 dup pairs: pairs must be O(dups), not the
    ~500k an all-in-one-bucket join would produce."""
    docs = _corpus(spark)
    pairs = dedup.minhash_candidate_pairs(docs).collect()
    assert len(pairs) == 3
    assert all(r.d1 >= 1000 and r.d2 >= 1000 for r in pairs)


def test_short_docs_are_singleton_clusters(spark):
    docs = _corpus(spark)
    clusters = dedup.dedup_clusters(docs)
    # every doc still gets a label; short docs are their own cluster
    assert clusters.count() == 1006
    own = clusters.filter(
        (F.col("doc_id") < 1000) & (F.col("cluster") == F.col("doc_id"))
    )
    assert own.count() == 1000
    # the 3 dup pairs collapse to 3 clusters of 2
    dup_clusters = (
        clusters.filter(F.col("doc_id") >= 1000)
        .groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(r.n for r in dup_clusters) == [2, 2, 2]


def test_fuzzy_dedup_keep_one_per_cluster(spark):
    """The fuzzy selection mask keeps exactly the min-id representative
    per near-dup cluster and every singleton."""
    docs = _corpus(spark)
    mask = dedup.fuzzy_dedup_keep(docs)
    assert mask.count() == 1006
    # 1000 singletons + 3 representatives of the 3 dup pairs
    assert mask.filter(F.col("keep")).count() == 1003
    # joined against clusters: kept iff doc is its cluster's min id
    joined = mask.join(dedup.dedup_clusters(docs), "doc_id")
    bad = joined.filter(
        F.col("keep") != (F.col("cluster") == F.col("doc_id"))
    )
    assert bad.count() == 0


def test_frequent_shingle_pruning_bounds_join(spark):
    """300 unrelated docs all sharing one boilerplate sentence: the
    unpruned inverted-index join pairs every doc with every other through
    the hot shingles; with max_df the hot postings are dropped and only
    the true dup pair survives."""
    boiler = "all rights reserved contact us for more information today"
    rows = [(i, f"{boiler} unique{i} filler{i} token{i} alpha{i} beta{i}")
            for i in range(300)]
    rows += [(1000, "the quick brown fox jumps over the lazy dog now"),
             (1001, "the quick brown fox jumps over the lazy dog now")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pruned = dedup.ngram_jaccard_pairs(docs, threshold=0.2, max_df=10).collect()
    assert [(r.d1, r.d2) for r in pruned] == [(1000, 1001)]
    assert pruned[0].jaccard == 1.0
    # sanity: without the cap, the boilerplate shingles pair everything
    sh = docs.select(F.explode(dedup._shingles(F.col("text"))).alias("s"))
    hot = sh.groupBy("s").count().filter(F.col("count") > 10).count()
    assert hot > 0


def test_line_dedup_census_and_scrub(spark):
    """Global line dedup: the shared boilerplate line is flagged in the
    census and removed by the scrub, unique lines survive in order."""
    boiler = "all rights reserved"
    rows = [
        (0, f"first unique zero\n{boiler}\nlast unique zero"),
        (1, f"{boiler}\nonly unique one"),
        (2, "totally unique doc two"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r.doc_id: r for r in dedup.line_dup_stats(docs).collect()}
    assert stats[0].n_lines == 3 and stats[0].n_dup_lines == 1
    assert abs(stats[0].dup_line_fraction - round(1 / 3, 6)) < 1e-9
    assert stats[2].n_dup_lines == 0
    assert 3 not in stats  # no non-blank lines -> no census row
    clean = {r.doc_id: r.clean_text
             for r in dedup.drop_duplicated_lines(docs).collect()}
    assert clean[0] == "first unique zero\nlast unique zero"  # order kept
    assert clean[1] == "only unique one"
    assert clean[2] == "totally unique doc two"
    assert clean[3] == ""


def test_exact_dedup_still_covers_short_docs(spark):
    """The short docs LSH skips are exactly what exact dedup catches."""
    docs = _corpus(spark)
    groups = dedup.exact_dedup_groups(docs.filter(F.col("doc_id") < 1000))
    rows = {r.fingerprint: r.n_dups for r in groups.collect()}
    # 3 distinct short texts, each duplicated ~333x
    assert len(rows) == 3
    assert sum(rows.values()) == 1000


def test_dedup_new_batch_semantics(spark):
    from metadata_quality_stack_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(100, "known text"), (101, "other text")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "known text"),   # dup of corpus -> drop
            (2, "fresh text"),   # new -> keep
            (3, "fresh text"),   # within-batch dup of 2 -> drop
            (4, "also new"),     # new -> keep
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in dedup.dedup_new_batch(batch, corpus).collect()}
    assert out[1]["seen_in_corpus"] and not out[1]["keep"]
    assert out[2]["keep"] and out[2]["first_in_batch"]
    assert not out[3]["keep"] and not out[3]["first_in_batch"]
    assert out[4]["keep"]
    # corpus text never moves: only fingerprints are joined
    plan = (
        dedup.dedup_new_batch(batch, corpus)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_fuzzy_dedup_new_batch_flags_corpus_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "pack my box with five dozen liquor jugs before noon")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, base),                      # exact -> every band collides
            (11, "completely different words about unrelated topics entirely here now"),
            (12, "hi"),                      # no shingles -> never flagged here
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.fuzzy_dedup_new_batch(batch, corpus).collect()
    }
    assert set(out) == {10, 11, 12}
    assert out[10]["near_dup_of_corpus"] and not out[10]["keep"]
    assert out[10]["n_hit_bands"] == dedup.N_BANDS
    assert not out[11]["near_dup_of_corpus"] and out[11]["keep"]
    # short doc: no bands, handled by the exact path, keep=True here
    assert out[12]["n_hit_bands"] == 0 and out[12]["keep"]


def test_fuzzy_dedup_new_batch_short_corpus_docs_build_no_index(spark):
    """A corpus of no-shingle docs must yield an EMPTY band index — if the
    NULL signature leaked into banding, every short batch doc would
    collide with it (the r1 degenerate-bucket bug, incremental form)."""
    corpus = spark.createDataFrame(
        [(i, ["", "x", "a b"][i % 3]) for i in range(300)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1000, ""), (1001, "y z")], "doc_id long, text string"
    )
    out = dedup.fuzzy_dedup_new_batch(batch, corpus).collect()
    assert all(r.keep and r.n_hit_bands == 0 for r in out)


def test_minhash_jaccard_estimate_bounds_and_exact_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "pack my box with five dozen liquor jugs before noon")],
        "doc_id long, text string",
    )
    rows = dedup.minhash_jaccard_estimate(docs).collect()
    # identical docs agree on every minhash -> estimate 1.0
    exact = [r for r in rows if (r.d1, r.d2) == (1, 2)]
    assert len(exact) == 1
    assert exact[0].n_agree == dedup.N_MINHASH
    assert exact[0].est_jaccard == 1.0
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert r.d1 < r.d2


def test_dup_ngram_fraction_inter_doc_only(spark):
    shared = "alpha beta gamma delta epsilon"  # one shared 5-gram
    docs = spark.createDataFrame(
        [
            (1, shared + " unique tail one here"),
            (2, shared + " different ending words now"),
            # within-doc repetition only: 5-gram repeated twice in ONE doc
            # must NOT count (df counts distinct docs)
            (3, "zeta eta theta iota kappa zeta eta theta iota kappa"),
            (4, "too short"),   # < n tokens -> zero n-grams
            (5, ""),            # empty -> zero n-grams
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.dup_ngram_fraction(docs).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    # docs 1/2: 5 positions each (9 tokens), exactly 1 shared position
    assert out[1]["n_ngrams"] == 5 and out[1]["n_dup_ngrams"] == 1
    assert out[1]["dup_ngram_fraction"] == 0.2
    assert out[2]["n_dup_ngrams"] == 1
    # doc 3 repeats its 5-gram internally but shares nothing across docs
    assert out[3]["n_dup_ngrams"] == 0
    assert out[4]["n_ngrams"] == 0 and out[4]["dup_ngram_fraction"] == 0.0
    assert out[5]["n_ngrams"] == 0


def test_new_dedup_ops_plan_shapes(spark):
    """Scale posture: no cartesian products anywhere; the n-gram census
    hashes in the scan stage so only 16-byte md5 keys shuffle."""
    docs = spark.createDataFrame(
        [(i, f"some text body number {i} with several words") for i in range(10)],
        "doc_id long, text string",
    )
    for df in (
        dedup.dup_ngram_fraction(docs),
        dedup.minhash_jaccard_estimate(docs),
        dedup.fuzzy_dedup_new_batch(docs.limit(3), docs),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_dedup_keep_best_prefers_longest(spark):
    """Quality-aware representative: the LONGEST member of a near-dup
    cluster wins (ties -> lowest doc_id); singletons always keep."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),                      # near-dup cluster {0,1,2}
        (1, base + " lambda mu nu"),    # longest -> the keeper
        (2, base + " lambda"),
        (3, "completely different words that share no shingles at all ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.keep, r.n_words)
        for r in dedup.fuzzy_dedup_keep_best(docs).collect()
    }
    assert got[1][0] and not got[0][0] and not got[2][0]
    assert got[3][0]  # singleton
    assert got[1][1] == 13
    # tie on length -> min doc_id wins
    tie = spark.createDataFrame(
        [(7, base), (8, base)], "doc_id long, text string"
    )
    got_tie = {r.doc_id: r.keep for r in dedup.fuzzy_dedup_keep_best(tie).collect()}
    assert got_tie == {7: True, 8: False}


def test_boilerplate_by_source_keys_on_domain(spark):
    """A footer line repeated across one domain's pages is boilerplate
    THERE, but the same line appearing once on another domain is not;
    null sources group together; zero-line docs drop."""
    footer = "copyright example corp all rights reserved"
    rows = [
        (0, "a", f"unique zero\n{footer}"),
        (1, "a", f"unique one\n{footer}"),
        (2, "a", f"unique two\n{footer}"),
        (3, "b", f"only here\n{footer}"),   # 1/1 docs on b: sdf<2 -> clean
        (4, None, "shared null line"),
        (5, None, "shared null line"),
        (6, "a", "   \n  "),                # zero non-blank lines -> dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in dedup.boilerplate_by_source(docs).collect()}
    assert 6 not in out
    for i in (0, 1, 2):
        assert out[i].n_boiler_lines == 1 and out[i].n_lines == 2, i
        assert out[i].boiler_ppm == 500_000
    assert out[3].n_boiler_lines == 0
    # null sources form one group: 2/2 docs share the line -> boiler
    assert out[4].n_boiler_lines == 1 and out[5].n_boiler_lines == 1
