"""BPE merge training: hand-checkable merges on a tiny corpus, exact
two-pass merge application on overlapping chains, single-tokenization
training (census cached), and the DuckDB oracle replaying training."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from metadata_quality_stack_spark.operators import bpe

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_merges_match_hand_bpe(spark):
    # corpus: 'low' x5, 'lower' x2, 'newest' x6. Weighted pair counts:
    # (w,e) = 2 (lower) + 6 (newest) = 8 — the unique max, merged first.
    # Round 2: 'lower' is now 'l o we r', so (l,o) = (o,w) = 7 tie ->
    # 'l o' wins on pair ASC. Round 3: 'e we','n e','s t','we s' all 6
    # -> 'e we' wins on pair ASC.
    docs = _docs(spark, ["low " * 5 + "lower " * 2 + "newest " * 6])
    m = bpe.train_merges(docs, 3)
    assert m == [("w e", "we", 8), ("l o", "lo", 7), ("e we", "ewe", 6)]


def test_overlapping_chain_merges_exactly(spark):
    # 'ababab...' as alternating tokens: 'a b a b a b' must become
    # 'ab ab ab' (the two-pass replace), not 'ab a b ab'
    docs = _docs(spark, ["ababab"])
    seg = bpe.segment_vocab(docs, [("a b", "ab", 1)])
    row = seg.filter(F.col("word") == "ababab").first()
    assert row.seq == "ab ab ab"
    assert row.n_pieces == 3


def test_self_feeding_merge_chain(spark):
    # merging twice: 'a b'->'ab', then 'ab ab'->'abab'
    docs = _docs(spark, ["abab abab"])
    seg = bpe.segment_vocab(
        docs, [("a b", "ab", 1), ("ab ab", "abab", 1)]
    )
    assert seg.first().seq == "abab"


def test_tokenized_docs_zero_row_for_wordless_doc(spark):
    docs = _docs(spark, ["hello hello", "12345 !!!", None])
    out = (
        bpe.bpe_tokenized_docs(docs, 2)
        .orderBy("doc_id")
        .collect()
    )
    assert out[0].n_words == 2 and out[0].n_chars_in_words == 10
    assert out[1].n_words == 0 and out[1].n_subwords == 0
    assert out[2].n_words == 0


def test_fewer_pairs_than_merges_early_stops(spark):
    docs = _docs(spark, ["aa aa"])  # one pair ('a','a') then exhausted
    m = bpe.train_merges(docs, 5)
    assert m == [("a a", "aa", 2)]


def test_oracle_replays_training(spark):
    docs = spark.read.parquet(DOCS)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    sp = bpe.bpe_learned_merges(docs, 5).toPandas()
    dk = con.execute(bpe.bpe_learned_merges_sql(5)).fetchdf()
    assert list(sp.pair) == list(dk.pair)
    assert list(sp.total.astype(int)) == list(dk.total.astype(int))


def test_oracle_tokenized_docs_match(spark):
    docs = spark.read.parquet(DOCS)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    sp = (
        bpe.bpe_tokenized_docs(docs, 3)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    dk = (
        con.execute(bpe.bpe_tokenized_docs_sql(3))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(sp, dk)


def test_training_reads_cached_census_not_corpus(spark):
    """The per-round pair census must scan the persisted census, not
    re-tokenize the corpus: after train_merges returns, no InMemory
    leak; during the loop the pair-census plan reads InMemoryTableScan."""
    docs = spark.read.parquet(DOCS)
    census = bpe.word_census(docs).persist()
    census.count()
    try:
        vocab = census.select(
            "word", "cnt", bpe._char_seq(F.col("word")).alias("seq")
        )
        plan = (
            vocab._jdf.queryExecution().executedPlan().toString()
        )
        assert "InMemoryTableScan" in plan
        # the only FileScan is the one nested inside the cached
        # relation's recorded build plan — nothing above it reads files
        live = plan.split("InMemoryRelation")[0]
        assert "FileScan" not in live
    finally:
        census.unpersist()


def test_vocab_ids_rank_by_frequency(spark):
    docs = _docs(spark, ["aa aa aa bb bb c"])
    # merges exhaust quickly; pieces ranked by total occurrences
    ids = {r.piece: r.token_id for r in bpe.bpe_vocab_ids(docs, 2).collect()}
    counts = {
        r.piece: r.total_occurrences
        for r in bpe.bpe_vocab_ids(docs, 2).collect()
    }
    ranked = sorted(counts, key=lambda p: (-counts[p], p))
    assert [ids[p] for p in ranked] == list(range(len(ranked)))


def test_encode_roundtrips_through_vocab(spark):
    docs = _docs(spark, ["hello world hello", "world"])
    ids = {r.token_id: r.piece for r in bpe.bpe_vocab_ids(docs, 3).collect()}
    enc = {r.doc_id: r for r in bpe.bpe_encode_docs(docs, 3).collect()}
    # decoding doc 0's ids re-concatenates to its words in order
    decoded = "".join(
        ids[int(t)] for t in enc[0].token_ids.split(" ")
    )
    assert decoded == "helloworldhello"
    assert enc[0].n_tokens == len(enc[0].token_ids.split(" "))
    assert enc[1].token_ids != ""


def test_encode_oracle_matches(spark):
    docs = spark.read.parquet(DOCS)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    sp = (
        bpe.bpe_encode_docs(docs, 3)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    dk = (
        con.execute(bpe.bpe_encode_docs_sql(3))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sp, dk.astype(sp.dtypes.to_dict()))


def test_resumable_training_matches_direct(spark, tmp_path):
    docs = spark.read.parquet(DOCS)
    direct = bpe.train_merges(docs, 6)
    log_dir = str(tmp_path / "merges")
    first = bpe.train_merges_resumable(docs, log_dir, n_merges=3)
    assert first == direct[:3]
    resumed = bpe.train_merges_resumable(docs, log_dir, n_merges=6)
    assert resumed == direct
    # a fresh call over a complete log replays without training
    again = bpe.train_merges_resumable(docs, log_dir, n_merges=6)
    assert again == direct


def test_resumable_survives_duplicate_rank_rows(spark, tmp_path):
    docs = spark.read.parquet(DOCS)
    log_dir = str(tmp_path / "merges")
    bpe.train_merges_resumable(docs, log_dir, n_merges=2)
    # simulate a crash-retry double append of rank 2
    rows = spark.read.parquet(log_dir).filter("rank = 2")
    rows.write.mode("append").parquet(log_dir)
    resumed = bpe.train_merges_resumable(docs, log_dir, n_merges=4)
    assert resumed == bpe.train_merges(docs, 4)


def test_vocab_ids_dense_rank_distributed(spark):
    """r5 scale fix: bpe_vocab_ids ranks by (count DESC, piece ASC)
    via a bit-length-bucket census instead of one global window — the
    ids must be bit-identical to the single-sort rank, and the Window
    node in the plan must be partitioned (no SinglePartition exchange
    feeding a WindowExec). Fixture counts straddle several power-of-two
    buckets and include within-bucket ties broken by piece order."""
    docs = _docs(spark, ["low " * 5 + "lower " * 2 + "newest " * 6])
    vocab = bpe.bpe_vocab_ids(docs, 3)
    rows = vocab.collect()
    want = {
        piece: i
        for i, (piece, _) in enumerate(
            sorted(
                ((r.piece, r.total_occurrences) for r in rows),
                key=lambda t: (-t[1], t[0]),
            )
        )
    }
    assert {r.piece: r.token_id for r in rows} == want
    plan = vocab._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Window .*", plan):
        assert "SinglePartition" not in m.group(0)
    # the exchange feeding the window must hash on the bucket key
    assert "hashpartitioning(bkt" in plan


def test_pack_sequences_contiguous_streams_and_hostile_rows(spark):
    # 4 docs in shard 0 (n_shards=1 for a single stream), including a
    # zero-token doc (digits only — BPE_WORD_RE is [a-z]+): streams must
    # be contiguous (next start = prev start + prev n_tokens), the
    # zero-token doc occupies no window (NULL span) but also must not
    # shift anyone's offset, and seq indices follow integer division
    docs = _docs(
        spark, ["aaa bbb", "12345 678", "ccc ddd eee", "fff"]
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in bpe.bpe_pack_sequences(
            docs, n_merges=0, context_tokens=4, n_shards=1
        ).collect()
    }
    assert rows[1]["n_tokens"] == 0
    assert rows[1]["seq_first"] is None and rows[1]["seq_last"] is None
    # contiguity across the stream in doc_id order
    offset = 0
    for d in (0, 1, 2, 3):
        assert rows[d]["start_offset"] == offset
        offset += rows[d]["n_tokens"]
    # with 0 merges every char is a token: doc0 = 6 tokens -> windows
    # 0..1 (ends at offset 5), doc2 starts at 6 -> window 1, spans to
    # offset 14 -> window 3; doc3 = offsets 15..17 -> windows 3..4
    assert (rows[0]["seq_first"], rows[0]["seq_last"]) == (0, 1)
    assert (rows[2]["seq_first"], rows[2]["seq_last"]) == (1, 3)
    assert (rows[3]["seq_first"], rows[3]["seq_last"]) == (3, 4)


def test_pack_sequences_sharding_is_independent(spark):
    # two shards: per-shard offsets both start at 0 and never interleave
    docs = _docs(spark, ["ab cd", "ef gh", "ij", "kl mn op"])
    out = bpe.bpe_pack_sequences(
        docs, n_merges=0, context_tokens=8, n_shards=2
    ).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1}
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        offset = 0
        for r in rows:
            assert r["start_offset"] == offset
            offset += r["n_tokens"]
