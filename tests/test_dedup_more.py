"""dedup_audit: LSH banding recall/precision vs exact Jaccard truth."""

from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import dedup


def test_dedup_audit_counts(spark):
    base = (
        "the committee reviewed the annual budget report on tuesday and "
        "agreed that spending should remain broadly stable next year"
    )
    rows = [
        (0, base),
        (1, base),                                   # exact dup: truth + candidate
        (2, base.replace("tuesday", "wednesday")),   # near dup
        (3, "an entirely different document about gardening and soil quality"),
        (4, "yet another unrelated text concerning maritime navigation rules"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = dedup.dedup_audit(docs, threshold=0.2).collect()[0]
    # the three base variants form truth pairs; unrelated docs form none
    assert r.n_truth_pairs == 3
    assert r.n_hit <= r.n_truth_pairs
    assert r.n_hit <= r.n_candidate_pairs
    assert r.recall_ppm == r.n_hit * 1_000_000 // r.n_truth_pairs
    assert r.precision_ppm == r.n_hit * 1_000_000 // r.n_candidate_pairs
    # identical docs always share every band: the exact-dup pair is caught
    cand = {
        (x.d1, x.d2) for x in dedup.minhash_candidate_pairs(docs).collect()
    }
    assert (0, 1) in cand


def test_dedup_audit_empty_truth(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta words"), (1, "totally different content here")],
        "doc_id long, text string",
    )
    r = dedup.dedup_audit(docs, threshold=0.9).collect()[0]
    assert r.n_truth_pairs == 0
    assert r.recall_ppm is None  # NULL, not a fake 0/0 number
