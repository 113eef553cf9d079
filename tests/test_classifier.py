"""Trained quality classifier: learning on separable data, determinism,
empty-doc safety, and the map-only shape of the scoring stage."""

import pytest
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import classifier


@pytest.fixture(scope="module")
def corpus(spark):
    """Same two-vocabulary construction as tests/test_dsir.py: target
    sources speak vocabulary A, raw sources speak vocabulary B."""
    rows = []
    for i in range(40):
        rows.append((i, "alpha beta gamma delta " * 5, "en", "src0", 100))
    for i in range(40, 120):
        rows.append((i, "omega sigma tau upsilon " * 5, "en", "src9", 100))
    rows.append((120, "", "en", "src9", 0))  # empty doc: bias-only
    rows.append((121, "alpha beta gamma delta " * 5, "en", "src9", 100))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_learns_separable_vocab(corpus):
    out = {r["doc_id"]: r for r in classifier.classifier_scores(corpus).collect()}
    # every target doc scores above every pure raw-vocab doc
    t_min = min(out[i]["score_micros"] for i in range(40))
    r_max = max(out[i]["score_micros"] for i in range(40, 120))
    assert t_min > r_max
    # the raw-source doc written in target vocabulary scores WITH the
    # target class — the classifier generalizes from text, not source
    assert out[121]["score_micros"] == out[0]["score_micros"]
    # 3 GD rounds fully separate this corpus
    for i in range(40):
        assert out[i]["pred"] == 1
    for i in range(40, 120):
        assert out[i]["pred"] == 0
    # empty doc carries only the bias weight; majority class is raw
    assert out[120]["pred"] == 0


def test_weights_shape_and_determinism(corpus):
    a = classifier.train_weights(corpus)
    b = classifier.train_weights(corpus)
    assert a == b
    assert len(a) == classifier.N_WEIGHTS
    assert all(isinstance(v, int) for v in a)
    # the bias slot learned the negative class prior
    assert a[classifier.BIAS] < 0


def test_scoring_stage_is_map_only(corpus, capsys):
    df = classifier.classifier_scores(corpus, rounds=1)
    df.explain("formatted")
    plan = capsys.readouterr().out
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_gradient_round_is_bounded_key_agg(corpus):
    """The per-round exchange carries at most N_WEIGHTS keys."""
    w = [0] * classifier.N_WEIGHTS
    grad = classifier._grad_frame(classifier._base_frame(corpus), w)
    rows = grad.collect()
    assert len(rows) <= classifier.N_WEIGHTS
    assert all(0 <= x["b"] <= classifier.BIAS for x in rows)


def test_fit_tokenizes_once(corpus):
    """The K gradient rounds read the persisted (bs, y) base frame, not
    the source: once the cache is materialized, a round's plan scans
    InMemoryTableScan and contains no re-tokenization (no md5 over the
    text). Guards VERDICT r3 #3: a 3-round fit must not pay 3 full
    tokenize+hash passes over the corpus."""
    base = classifier._base_frame(corpus).persist()
    try:
        base.count()  # materialize, as train_weights does
        grad = classifier._grad_frame(base, [0] * classifier.N_WEIGHTS)
        plan = grad._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        # everything ABOVE the cache scan (what actually executes per
        # round) must not re-tokenize: the md5-hash projection exists
        # only inside the InMemoryRelation definition
        executing = plan.split("InMemoryTableScan")[0]
        assert "md5" not in executing
        # and the refactor didn't change the fit: weights are identical
        # to the unpersisted formulation by construction (same exprs)
        assert classifier.train_weights(corpus) == classifier.train_weights(
            corpus
        )
    finally:
        base.unpersist()


def test_pr_sweep_counts(corpus):
    rows = {
        r["threshold"]: r for r in classifier.classifier_pr_sweep(corpus).collect()
    }
    assert set(rows) == set(classifier.SWEEP_THRESHOLDS)
    n = corpus.count()
    # labels come from source: exactly the 40 src0 docs are positive
    for t, r in rows.items():
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        assert r["tp"] + r["fn"] == 40
    # threshold 0 reproduces the confusion readout's operating point
    conf = {
        (r["label"], r["pred"]): r["n_docs"]
        for r in classifier.classifier_confusion(corpus).collect()
    }
    r0 = rows[0]
    assert r0["tp"] == conf.get((1, 1), 0)
    assert r0["fp"] == conf.get((0, 1), 0)
    # monotone: raising the threshold never increases tp
    ts = sorted(rows)
    tps = [rows[t]["tp"] for t in ts]
    assert tps == sorted(tps, reverse=True)


def test_calibration_bins_partition_the_corpus(corpus):
    rows = classifier.classifier_calibration(corpus).collect()
    assert sum(r["n_docs"] for r in rows) == corpus.count()
    assert sum(r["n_pos"] for r in rows) == 40  # all positives binned
    for r in rows:
        assert 0 <= r["bin"] < classifier.CALIB_BINS
        assert r["lo_micros"] == (
            r["bin"] * classifier.CALIB_WIDTH + classifier.CALIB_LO
        )
        assert 0 <= r["n_pos"] <= r["n_docs"]
