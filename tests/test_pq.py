"""Product quantization: training improves reconstruction, encoding is
map-only (plan-asserted), ADC top-k tracks exact squared-L2 top-k with
measured recall, and the DuckDB oracle replays the full training."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import pq

EMB = "/root/testdata/sf0.01/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def books(emb):
    return pq.pq_train(emb)


def _exact_sqdist_topk(emb, qid, k):
    q = emb.filter(F.col("vec_id") == qid).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != qid)
        .select(
            "vec_id",
            pq._sqdist(F.col("embedding"), F.col("q_emb")).alias("d"),
        )
        .orderBy(F.asc("d"), F.asc("vec_id"))
        .limit(k)
    )


def test_codebook_shapes_and_determinism(emb, books):
    assert len(books) == pq.PQ_M
    for book in books:
        assert 1 <= len(book) <= pq.PQ_KSUB
        for _, cent in book:
            assert len(cent) == pq.PQ_DSUB
    assert pq.pq_train(emb) == books


def test_training_reduces_quantization_error(emb):
    """Lloyd rounds must not worsen mean reconstruction (sum of
    per-subspace distances to the assigned centroid)."""

    def mean_err(bs):
        enc = pq._coded_tall(emb, bs)
        cb = emb.sparkSession.createDataFrame(
            [
                (i, int(c), [float(v) for v in cent])
                for i, b in enumerate(bs)
                for c, cent in b
            ],
            "m int, code long, cent array<double>",
        )
        return (
            enc.join(F.broadcast(cb), ["m", "code"])
            .select(pq._sqdist(F.col("sub"), F.col("cent")).alias("d"))
            .agg(F.avg("d"))
            .first()[0]
        )

    seed_rows = emb.filter(F.col("vec_id") < pq.PQ_KSUB).collect()
    seed = [
        sorted(
            (
                int(r.vec_id),
                [
                    float(v)
                    for v in r.embedding[
                        i * pq.PQ_DSUB : (i + 1) * pq.PQ_DSUB
                    ]
                ],
            )
            for r in seed_rows
        )
        for i in range(pq.PQ_M)
    ]
    trained = pq.pq_train(emb)
    assert mean_err(trained) < mean_err(seed)


def test_encode_is_map_only(emb, books):
    plan = pq.pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_adc_recall_floor(emb):
    """ADC recall@10 vs exact squared-L2 over random 64-dim data with
    4x16 codebooks — measured 0.28; assert a safety floor well above
    the 0.02 expectation of random top-10."""
    hits = tot = 0
    for qid in range(0, 30, 6):
        exact = {r.vec_id for r in _exact_sqdist_topk(emb, qid, 10).collect()}
        approx = {
            r.vec_id for r in pq.pq_topk_trained(emb, qid, 10).collect()
        }
        hits += len(exact & approx)
        tot += 10
    assert hits / tot >= 0.15


def test_oracle_replays_training(emb):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{EMB}'")
    sp = pq.pq_topk_trained(emb, 3, 5).toPandas()
    dk = con.execute(pq.pq_trained_sql(3, 5)).fetchdf()
    assert list(sp.vec_id) == list(dk.vec_id)
    assert np.allclose(sp.adc_dist, dk.adc_dist, atol=0)


def test_histogram_covers_all_vectors(emb):
    h = pq.pq_code_histogram(emb).toPandas()
    n = emb.count()
    assert set(h.m) == set(range(pq.PQ_M))
    for m in range(pq.PQ_M):
        assert h[h.m == m].n_vecs.sum() == n


def test_ivfpq_subset_of_pq_restricted_to_probed_cells(emb, books):
    """IVF-PQ must equal full-PQ ADC ranking restricted to the probed
    cells: same training, same distance tables, only the candidate set
    shrinks. Recompute the probe + assignment with the module helpers
    and check the result row-for-row."""
    qid, k = 0, 10
    cells = pq._coarse_cells(emb)
    assign = emb.select(
        "vec_id", pq._argmin_cell(F.col("embedding"), cells).alias("cell_id")
    ).toPandas()
    q_emb = emb.filter(F.col("vec_id") == qid).first().embedding

    def sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (float(x) - float(y)) ** 2
        return round(acc, 6)

    probed = {
        cid
        for _, cid in sorted(
            (sq(cent, q_emb), cid) for cid, cent in cells
        )[: pq.IVFPQ_NPROBE]
    }
    member = set(
        assign[assign.cell_id.isin(probed)].vec_id.astype(int)
    ) - {qid}
    got = pq.ivfpq_topk(emb, qid, k).toPandas()
    assert set(got.vec_id.astype(int)) <= member
    full = pq.pq_topk_trained(emb, qid, emb.count()).toPandas()
    want = full[full.vec_id.isin(member)].head(k)
    assert list(got.vec_id) == list(want.vec_id)
    assert np.allclose(got.adc_dist, want.adc_dist, atol=0)


def test_ivfpq_oracle_matches(emb):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{EMB}'")
    sp = pq.ivfpq_topk(emb, 7, 8).toPandas()
    dk = con.execute(pq.ivfpq_sql(7, 8)).fetchdf()
    assert list(sp.vec_id) == list(dk.vec_id)
    assert np.allclose(sp.adc_dist, dk.adc_dist, atol=0)


def test_residual_pq_beats_raw_pq_on_clustered_data(spark):
    """The point of residual encoding: on CLUSTERED data the residual
    variance is what remains after coarse quantization, so the same
    code budget reconstructs much better than raw-vector PQ. (On the
    gate corpus\'s isotropic random unit vectors the effect INVERTS —
    the nearest of 16 random centroids is still near-orthogonal, the
    residual is longer than the vector, measured 1.51 vs 1.00 mean
    square norm — so this test builds clustered vectors.)"""
    import math

    # 64 clusters >> the 16 PQ codes per subspace: raw PQ cannot code
    # the inter-cluster variance, the coarse quantizer can — exactly
    # the budget split residual encoding exists for
    dim = pq.PQ_M * pq.PQ_DSUB
    n_clusters = 64
    rows = []
    for vid in range(n_clusters * 10):
        c = vid % n_clusters
        base = [math.sin(0.7 * c * (j + 1)) for j in range(dim)]
        noise = [0.01 * math.cos(1.3 * vid * (j + 1)) for j in range(dim)]
        rows.append((vid, "x", [b + n for b, n in zip(base, noise)]))
    emb_c = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    # coarse cells = one exemplar per cluster (vec_id 0..63 hit all 64)
    cells = pq._coarse_cells(emb_c, n_clusters)
    assigned = emb_c.select(
        "vec_id",
        "embedding",
        pq._argmin_cell(F.col("embedding"), cells).alias("cell_id"),
    )
    res = assigned.select(
        "vec_id",
        pq._residual(F.col("embedding"), F.col("cell_id"), cells).alias(
            "embedding"
        ),
    )
    emb = emb_c

    def mean_err(frame):
        books = pq.pq_train(frame)
        enc = pq._coded_tall(frame, books)
        cb = frame.sparkSession.createDataFrame(
            [
                (i, int(c), [float(v) for v in cent])
                for i, b in enumerate(books)
                for c, cent in b
            ],
            "m int, code long, cent array<double>",
        )
        return (
            enc.join(F.broadcast(cb), ["m", "code"])
            .select(pq._sqdist(F.col("sub"), F.col("cent")).alias("d"))
            .agg(F.avg("d"))
            .first()[0]
        )

    raw = mean_err(emb.select("vec_id", "embedding"))
    residual = mean_err(res)
    assert residual < raw / 5


def test_ivfpq_residual_oracle_matches(emb):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{EMB}'")
    sp = pq.ivfpq_residual_topk(emb, 5, 8).toPandas()
    dk = con.execute(pq.ivfpq_residual_sql(5, 8)).fetchdf()
    assert list(sp.vec_id) == list(dk.vec_id)
    assert np.allclose(sp.adc_dist, dk.adc_dist, atol=0)


def test_ivfpq_residual_results_come_from_probed_cells(emb):
    cells = pq._coarse_cells(emb)
    q_emb = emb.filter(F.col("vec_id") == 0).first().embedding

    def sq(a, b):
        return round(sum((float(x) - float(y)) ** 2 for x, y in zip(a, b)), 6)

    probed = {
        cid
        for _, cid in sorted((sq(c, q_emb), cid) for cid, c in cells)[
            : pq.IVFPQ_NPROBE
        ]
    }
    assign = emb.select(
        "vec_id", pq._argmin_cell(F.col("embedding"), cells).alias("cell_id")
    ).toPandas()
    member = set(assign[assign.cell_id.isin(probed)].vec_id.astype(int)) - {0}
    got = pq.ivfpq_residual_topk(emb, 0, 10).toPandas()
    assert set(got.vec_id.astype(int)) <= member
