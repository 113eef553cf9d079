"""Diagnose which pipeline stage limits 8->32 scaling."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from metadata_quality_stack_spark import get_spark
from metadata_quality_stack_spark.functions.langid import langid_udf
from metadata_quality_stack_spark.functions.perplexity import perplexity_udf
from metadata_quality_stack_spark.operators.analytics import scored_documents  # noqa
from metadata_quality_stack_spark.operators.rules import scoring_stages, final_scores
from metadata_quality_stack_spark.functions.scrub import scrub_columns

CORPUS = "/tmp/scaling_bench_pages"
cpus = int(sys.argv[1])

spark = get_spark(app_name=f"diag{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 8))
corpus = spark.read.parquet(CORPUS)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(name, fn, warm=True):
    if warm:
        fn()
    t0 = time.time()
    fn()
    print(json.dumps({"cpus": cpus, "stage": name, "wall_s": round(time.time() - t0, 3)}))


t("scan_only", lambda: noop(corpus.select("url", "text")))
t("scrub_native", lambda: noop(
    corpus.select("url", *[v.alias(k) for k, v in scrub_columns(F.col("text")).items()])))
t("langid_udf", lambda: noop(corpus.select("url", langid_udf()(F.col("text")).alias("l"))))
t("ppl_udf", lambda: noop(corpus.select("url", perplexity_udf()(F.col("text")).alias("p"))))

def native_rules():
    meta = {"lang": "lang", "source": None, "n_chars": None}
    staged = scoring_stages(corpus, "text", meta, "webtext")
    noop(final_scores(staged, ["url", "lang"], "webtext"))

t("native_rules", native_rules)
spark.stop()
