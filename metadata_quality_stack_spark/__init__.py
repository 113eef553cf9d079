"""metadata_quality_stack_spark — a from-scratch PySpark-native quality-filter engine.

Re-expresses the MQA per-record, dimension-weighted scoring model of the
reference (mjanez/metadata-quality-stack, /root/reference) as a distributed
keep/drop quality filter over Common-Crawl-style web-page tables:

    per-doc rule checks (count, population)
      -> points = count/population * weight        (validators.py:957-958)
      -> dimension score = bround(sum points)      (validators.py:994-1002)
      -> total = sum(dimension scores)             (validators.py:770)
      -> rating = threshold bucketing              (validators.py:1006-1027)
      -> keep = rating != "Bad"

Everything is DataFrame-first: native Column expressions for heuristics,
Arrow-batched pandas UDFs only for the two model scorers (langid,
perplexity), broadcast sets for vocabularies, one wide select for all rules.
"""

__version__ = "0.1.0"

from metadata_quality_stack_spark.session import get_spark  # noqa: F401
