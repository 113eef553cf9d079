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


def _tune_malloc() -> None:
    """Serve large allocations from the reusable brk heap instead of
    fresh per-allocation mmaps.

    glibc mmaps any malloc above ~4 MB and munmaps it on free, so every
    Arrow batch / flat-batch numpy buffer in a pandas-UDF worker pays
    first-touch page faults again and again. On bare metal that fault is
    ~0.2 µs/page; on ballooned/overcommitted VMs it has been measured
    here at ~350 µs/page (~12 MB/s!) — a 14x slowdown of the whole
    scorer. Raising M_MMAP_THRESHOLD and M_TRIM_THRESHOLD keeps the
    pages owned by the process, so the fault cost is paid once per
    worker lifetime (workers are reused: spark.python.worker.reuse).
    Runs in every process that imports this package — driver AND Spark
    python workers (UDF deserialization imports the module). No-op on
    non-glibc platforms.
    """
    import os

    if os.environ.get("MQS_NO_MALLOC_TUNE"):  # A/B escape hatch
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_malloc()

from metadata_quality_stack_spark.session import get_spark  # noqa: E402,F401
