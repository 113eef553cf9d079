"""Measure the MinHash/LSH operating point at PRODUCTION signature
width (VERDICT r4 #5): recall/precision of the banded candidates vs
exact n-gram-Jaccard truth on the sf0.1 documents corpus, at the gate's
oracle-pinned k=8 and at k=128 with several band splits.

The S-curve formula says P(candidate) = 1 - (1 - J^r)^b; this prints
the MEASURED curve on real data, which is what BENCH/BASELINE.md
publishes as the operating point the banded dedup ships with.

Usage: python tools/lsh_operating_point.py [threshold]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metadata_quality_stack_spark import get_spark
from metadata_quality_stack_spark.operators import dedup

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (n_hashes, n_bands): rows-per-band = k/b steers the S-curve knee;
# k=128 x 16 bands x 8 rows is the classic MinHashLSH operating point
# (Leskovec MMDS ch.3) for J~0.5 dedup; 32x4 is the high-recall end,
# 8x16 the high-precision end.
POINTS = [(8, 4), (128, 32), (128, 16), (128, 8)]


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 0.2
    spark = get_spark(app_name="lsh-operating-point", master="local[32]")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(32)
    docs = docs.select("doc_id", "text").cache()
    docs.count()
    out = []
    for k, b in POINTS:
        t0 = time.time()
        row = dedup.dedup_audit(
            docs, threshold=threshold, n_hashes=k, n_bands=b
        ).collect()[0]
        out.append(
            {
                "n_hashes": k,
                "n_bands": b,
                "rows_per_band": k // b,
                "jaccard_threshold": threshold,
                "n_truth_pairs": row["n_truth_pairs"],
                "n_candidate_pairs": row["n_candidate_pairs"],
                "n_hit": row["n_hit"],
                "recall_ppm": row["recall_ppm"],
                "precision_ppm": row["precision_ppm"],
                "sec": round(time.time() - t0, 2),
            }
        )
        print(json.dumps(out[-1]), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
