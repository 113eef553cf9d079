"""Bloom pre-filter: no false negatives ever, map-only probe plan,
false positives reproduced identically by the SQL mirror at tiny m."""

import duckdb
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import bloom


def _frame(spark, keys):
    return spark.createDataFrame([(i, k) for i, k in enumerate(keys)],
                                 "doc_id long, text string")


def test_no_false_negatives(spark):
    corpus_keys = [f"key-{i}" for i in range(300)]
    batch_keys = [f"key-{i}" for i in range(250, 400)]  # 50 true dups
    bitmap = bloom.bloom_build(_frame(spark, corpus_keys))
    out = bloom.bloom_probe(_frame(spark, batch_keys), bitmap)
    got = {r.text: r.maybe_dup for r in out.collect()}
    for k in batch_keys:
        if k in set(corpus_keys):
            assert got[k], f"false negative on {k}"


def test_probe_plan_is_map_only(spark):
    bitmap = bloom.bloom_build(_frame(spark, ["a", "b"]))
    out = bloom.bloom_probe(_frame(spark, ["a", "c"]), bitmap)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_false_positives_match_sql_mirror_at_tiny_m(spark):
    # m=256 bits with 300 corpus keys saturates the filter enough to
    # produce real false positives; the SQL mirror must call the exact
    # same set maybe_dup — FP for FP
    corpus_keys = [f"ck-{i}" for i in range(300)]
    batch_keys = [f"probe-{i}" for i in range(200)]  # zero true dups
    bitmap = bloom.bloom_build(_frame(spark, corpus_keys), m_bits=256)
    out = bloom.bloom_probe(_frame(spark, batch_keys), bitmap)
    got = {r.doc_id: r.maybe_dup for r in out.collect()}
    assert any(got.values()), "tiny filter should produce false positives"
    assert not all(got.values())

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE corpus_t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, 'ck-{i}')" for i in range(300))
        + ") t(doc_id, text)"
    )
    con.execute(
        "CREATE TABLE batch_t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, 'probe-{i}')" for i in range(200))
        + ") t(doc_id, text)"
    )
    sql = bloom.bloom_probe_sql(
        "SELECT * FROM corpus_t", "SELECT * FROM batch_t", m_bits=256
    )
    want = {
        int(r[0]): bool(r[1]) for r in con.execute(sql).fetchall()
    }
    assert got == want


def test_bitmap_bounded_by_filter_size(spark):
    big = _frame(spark, [f"k{i}" for i in range(5000)])
    bitmap = bloom.bloom_build(big, m_bits=1 << 12)
    assert len(bitmap) == (1 << 12) // 64  # 64 words regardless of rows
    assert all(isinstance(w, int) for w in bitmap)


def test_null_key_propagates_null(spark):
    bitmap = bloom.bloom_build(_frame(spark, ["a"]))
    out = bloom.bloom_probe(
        spark.createDataFrame([(0, None)], "doc_id long, text string"),
        bitmap,
    )
    assert out.collect()[0].maybe_dup is None
