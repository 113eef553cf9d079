"""DSIR importance resampling: discrimination, edge cases, determinism,
and the map-only plan shape of the scoring stage."""

import pytest
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import dsir


@pytest.fixture(scope="module")
def corpus(spark):
    """Target docs (src0) speak vocabulary A, raw docs (src9) speak
    vocabulary B — the importance weights must separate them."""
    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma delta " * 5, "en", "src0", 100))
    for i in range(30, 90):
        rows.append((i, "omega sigma tau upsilon " * 5, "en", "src9", 100))
    rows.append((90, "", "en", "src9", 0))  # empty doc
    rows.append((91, "alpha beta gamma delta " * 5, "en", "src9", 100))  # target-like raw doc
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_weights_separate_domains(corpus):
    w = {r["doc_id"]: r["logw_micros"] for r in dsir.dsir_logweights(corpus).collect()}
    target = [w[i] for i in range(30)]
    raw = [w[i] for i in range(30, 90)]
    assert min(target) > max(raw), "target-vocab docs must outweigh raw-vocab docs"
    # a raw-source doc written in the target vocabulary scores like the target
    assert w[91] == w[0]
    assert w[90] == 0  # empty doc: no features, zero weight


def test_sample_prefers_target_vocab(corpus):
    picked = {r["doc_id"] for r in dsir.dsir_sample(corpus, k=31).collect()}
    # all 31 target-vocab docs (30 src0 + the src9 lookalike) beat every
    # raw-vocab doc: the weight gap dwarfs the Gumbel noise
    assert picked == set(range(30)) | {91}


def test_deterministic_across_runs(corpus):
    a = sorted(map(tuple, dsir.dsir_sample(corpus, k=20).collect()))
    b = sorted(map(tuple, dsir.dsir_sample(corpus, k=20).collect()))
    assert a == b


def test_census_totals(corpus):
    census = dsir.bucket_census(corpus).collect()
    n_feats = (
        corpus.select(
            F.sum(F.size(dsir.feature_buckets(F.col("text")))).alias("n")
        ).collect()[0]["n"]
    )
    assert sum(r["n_raw"] for r in census) == n_feats
    assert all(0 <= r["b"] < dsir.N_BUCKETS for r in census)
    assert all(r["n_target"] <= r["n_raw"] for r in census)


def test_scoring_stage_is_map_only(corpus, capsys):
    """After the census collect, the per-doc weight pass must be a pure
    map: literal-array lookup fold, no joins, no exchanges."""
    df = dsir.dsir_logweights(corpus)
    df.explain("formatted")
    plan = capsys.readouterr().out
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_single_pass_matches_two_pass(spark):
    """dsir_logweights(single_pass=True) tokenizes once (persisted
    feature frame) and must produce EXACTLY the two-pass result."""
    from metadata_quality_stack_spark.operators import dsir

    rows = [(i, "alpha beta gamma " * 3, "en", "src0", 10) for i in range(15)]
    rows += [(100 + i, "omega sigma tau " * 3, "en", "src9", 10) for i in range(25)]
    rows += [(200, "", "en", "src9", 0), (201, None, "en", None, 0)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    two = sorted(tuple(r) for r in dsir.dsir_logweights(docs).collect())
    one = sorted(
        tuple(r) for r in dsir.dsir_logweights(docs, single_pass=True).collect()
    )
    assert one == two
