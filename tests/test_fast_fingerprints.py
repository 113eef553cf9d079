"""Production (job-path) fingerprints: xxhash64-based simhash and rolling
fingerprint. The polynomial variants exist only for DuckDB-oracle parity;
the job path must stay free of interpreted per-character lambda folds
(VERDICT r1 #5) — asserted against the actual plans here."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import dedup, textops


def plan_str(df, mode="formatted"):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [
        (0, base),
        (1, base + "extra tail token"),       # near-dup of 0
        (2, "completely different content about spark catalyst optimizer " * 15),
        (3, ""),                               # hostile: empty
        (4, "  \n\t "),                        # hostile: whitespace only
        (5, base.upper()),                     # case-insensitive twin of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_simhash_fast_properties(spark):
    sig = {r.doc_id: r.simhash for r in dedup.simhash_fast(_docs(spark)).collect()}
    assert len(sig) == 6  # empty docs survive (explode_outer)
    assert sig[3] == 0 and sig[4] == 0
    assert sig[0] == sig[5]  # lowercased tokens
    # near-dup is closer to the original than the unrelated doc
    assert _hamming(sig[0], sig[1]) < _hamming(sig[0], sig[2])


def test_fast_paths_have_no_interpreted_lambdas(spark):
    docs = _docs(spark)
    for df in (dedup.simhash_fast(docs), textops.rolling_fingerprint_fast(docs)):
        plan = plan_str(df)
        assert "lambdafunction" not in plan.lower(), "HOF crept into job path"
        assert "xxhash64" in plan.lower()
    # the rolling fast path is map-only; simhash partial-aggregates map-side
    assert "Exchange" not in plan_str(textops.rolling_fingerprint_fast(docs))
    sim_plan = plan_str(dedup.simhash_fast(docs), "simple")
    assert sim_plan.count("HashAggregate") == 2  # partial + final


def test_rolling_fast_normalization(spark):
    rows = [(0, "Hello   World"), (1, "hello\nworld"), (2, " hello world ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hashes = [r.rolling_hash for r in
              textops.rolling_fingerprint_fast(df).orderBy("doc_id").collect()]
    assert hashes[0] == hashes[1] == hashes[2]


def test_ivf_assign_is_shuffle_free(spark):
    from metadata_quality_stack_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = plan_str(similarity.ivf_assign(emb), "simple")
    assert "Exchange" not in plan  # argmax is a per-row projection now
    assert "Window" not in plan
