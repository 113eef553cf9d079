"""Three-way regex-dialect parity for the PII scrub (SURVEY.md §4.3 #6):
Python `re` (oracle) vs Spark/Java vs DuckDB/RE2 on the FIXTURES.md §8
cases — byte-identical scrubbed output in all three engines."""

import duckdb
import pandas as pd

from metadata_quality_stack_spark.functions.scrub import scrub_sql_exprs
from metadata_quality_stack_spark.functions.scrub import apply_scrub
from metadata_quality_stack_spark.oracle.scoring import scrub_text

CASES = [
    "write to a.b+tag@sub.example.co.uk today",
    "call +34 612 345 678 now",
    "call (555) 123-4567 now",
    "id 612345678 end",
    "ip 192.168.1.1 here",
    "edge 255.255.255.255 works",
    "not-ip 999.1.1.1 stays",
    "short 12345678 stays",
    "long 123456789012 stays",
    "mixed a@b.co 10.0.0.1 +1 800 555 1212",
    "no pii at all.",
    "email-ish a@@b.com a@b",
    "phone in text+34 612 345 678done",
    "multi a@b.io c@d.io 1.2.3.4 5.6.7.8",
    "",
]


def test_python_vs_spark(spark):
    pdf = pd.DataFrame({"doc_id": range(len(CASES)), "text": CASES})
    got = (
        apply_scrub(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, c in enumerate(CASES):
        exp_text, exp_counts = scrub_text(c)
        assert got["scrubbed_text"][i] == exp_text, c
        assert got["scrub_email_count"][i] == exp_counts["email"], c
        assert got["scrub_ip_count"][i] == exp_counts["ip"], c
        assert got["scrub_phone_count"][i] == exp_counts["phone"], c


def test_python_vs_duckdb():
    con = duckdb.connect()
    exprs = scrub_sql_exprs("t.text")
    for c in CASES:
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS text", [c])
        row = con.execute(
            f"SELECT {exprs['scrubbed_text']} AS s, "
            f"{exprs['scrub_email_count']} AS e, "
            f"{exprs['scrub_ip_count']} AS i, "
            f"{exprs['scrub_phone_count']} AS p FROM t"
        ).fetchone()
        exp_text, exp_counts = scrub_text(c)
        assert row[0] == exp_text, c
        assert (row[1], row[2], row[3]) == (
            exp_counts["email"],
            exp_counts["ip"],
            exp_counts["phone"],
        ), c
