"""Lloyd-iterated IVF centroid training: converges to cluster structure
on synthetic well-separated data and stays shuffle-light (one groupBy per
round, map-only assignment)."""

import io
from contextlib import redirect_stdout

import numpy as np
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import similarity

DIM = 64


def _clustered(spark, per_cluster=30, seed=5):
    """3 tight clusters around orthogonal-ish centers; rows shuffled so
    the seed centroids (first k vec_ids) start badly."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(3, DIM) * 3.0
    rows = []
    for c in range(3):
        for i in range(per_cluster):
            v = centers[c] + rng.randn(DIM) * 0.05
            rows.append((c * per_cluster + i, [float(x) for x in v], c))
    rng.shuffle(rows)
    rows = [(i, v, lab) for i, (_, v, lab) in enumerate(rows)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_lloyd_training_recovers_clusters(spark):
    emb = _clustered(spark)
    cents = similarity.ivf_train(emb, k=3, n_iter=4)
    assert 1 <= len(cents) <= 3
    assigned = similarity.ivf_assign_trained(emb, cents).collect()
    # every true cluster maps to exactly one trained cell (purity 1.0)
    by_label = {}
    for r in assigned:
        by_label.setdefault(r.label, set()).add(r.cell_id)
    assert all(len(cells) == 1 for cells in by_label.values())
    # and the mapping is injective when 3 cells survive
    if len(cents) == 3:
        all_cells = [next(iter(c)) for c in by_label.values()]
        assert len(set(all_cells)) == 3


def test_training_improves_mean_similarity(spark):
    emb = _clustered(spark)
    seed_cents = [
        (int(r.vec_id), [float(v) for v in r.embedding])
        for r in emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    ]
    before = (
        similarity.ivf_assign_trained(emb, seed_cents)
        .agg(F.avg("cell_sim"))
        .first()[0]
    )
    cents = similarity.ivf_train(emb, k=3, n_iter=4)
    after = (
        similarity.ivf_assign_trained(emb, cents)
        .agg(F.avg("cell_sim"))
        .first()[0]
    )
    assert after >= before  # Lloyd never degrades the objective here


def test_assignment_stays_map_only(spark):
    emb = _clustered(spark)
    cents = similarity.ivf_train(emb, k=3, n_iter=1)
    buf = io.StringIO()
    with redirect_stdout(buf):
        similarity.ivf_assign_trained(emb, cents).explain("simple")
    assert "Exchange" not in buf.getvalue()
