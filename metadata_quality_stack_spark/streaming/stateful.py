"""Custom stateful streaming operator: running per-domain quality
counters via ``applyInPandasWithState``.

The reference keeps per-source history as an append-only store re-read on
every dashboard query (`src/api/tinydb_repo.py:63`, `src/frontend/
dashboard.py:267-276`). The streaming-native re-expression holds the
running aggregate AS STATE: one state row per domain (bounded by domain
cardinality, not document count), updated per micro-batch, emitting the
new totals downstream — the canonical "custom stateful operator" slot
(Arrow-batched, no per-row Python beyond the grouped pandas frames).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_docs LONG, n_kept LONG, sum_score DOUBLE"
OUTPUT_SCHEMA = (
    "domain STRING, n_docs LONG, n_kept LONG, keep_rate DOUBLE, mean_score DOUBLE"
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n_docs, n_kept, sum_score = (
        state.get if state.exists else (0, 0, 0.0)
    )
    for pdf in pdfs:
        n_docs += len(pdf)
        n_kept += int(pdf["keep"].sum())
        sum_score += float(pdf["total_score"].sum())
    state.update((n_docs, n_kept, sum_score))
    yield pd.DataFrame(
        {
            "domain": [key[0]],
            "n_docs": [n_docs],
            "n_kept": [n_kept],
            "keep_rate": [n_kept / n_docs if n_docs else 0.0],
            "mean_score": [sum_score / n_docs if n_docs else 0.0],
        }
    )


def running_domain_stats(scored_stream: DataFrame) -> DataFrame:
    """Scored-pages stream -> one running-stats row per domain per
    micro-batch (update mode). State size = O(#domains)."""
    with_domain = scored_stream.select(
        F.regexp_extract("url", r"^(?:https?://)?([^/]+)", 1).alias("domain"),
        "total_score",
        F.col("keep").cast("int").alias("keep"),
    )
    return with_domain.groupBy("domain").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
