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


# ---------------------------------------------------------------------------
# toxicity word-list masking (north rule: PII/toxicity scrub)
# ---------------------------------------------------------------------------
import re

from metadata_quality_stack_spark.functions.scrub import (
    apply_toxicity,
    toxicity_pattern,
    toxicity_sql_exprs,
)

TOX_TERMS = ["damn", "hell", "big"]

TOX_CASES = [
    "what the hell is this damn thing",          # two hits
    "Hell YES and DAMN straight",                # case-insensitive
    "hellish shellfish bighorn",                 # substrings must NOT match
    "big, big. (big) big!",                      # punctuation boundaries
    "a BIG <EMAIL> token",                       # masking after PII tokens
    "no matches here",
    "",
]


def _py_tox(text: str) -> tuple[int, str]:
    pat = re.compile(toxicity_pattern(TOX_TERMS))
    return len(pat.findall(text)), pat.sub("<TOX>", text)


def test_toxicity_python_vs_spark(spark):
    pdf = pd.DataFrame({"doc_id": range(len(TOX_CASES)), "text": TOX_CASES})
    got = (
        apply_toxicity(spark.createDataFrame(pdf), terms=TOX_TERMS)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, c in enumerate(TOX_CASES):
        exp_n, exp_text = _py_tox(c)
        assert got["tox_count"][i] == exp_n, c
        assert got["detoxed_text"][i] == exp_text, c


def test_toxicity_python_vs_duckdb():
    con = duckdb.connect()
    exprs = toxicity_sql_exprs(TOX_TERMS, "t.text")
    for c in TOX_CASES:
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS text", [c])
        row = con.execute(
            f"SELECT {exprs['tox_count']} AS n, "
            f"{exprs['detoxed_text']} AS s FROM t"
        ).fetchone()
        exp_n, exp_text = _py_tox(c)
        assert (row[0], row[1]) == (exp_n, exp_text), c


def test_toxicity_null_text_propagates(spark):
    pdf = pd.DataFrame({"doc_id": [0], "text": [None]})
    pdf["text"] = pdf["text"].astype(object)
    got = apply_toxicity(
        spark.createDataFrame(pdf, schema="doc_id long, text string"),
        terms=TOX_TERMS,
    ).toPandas()
    assert got["tox_count"][0] is None or pd.isna(got["tox_count"][0])
    assert got["detoxed_text"][0] is None


def test_pipeline_toxicity_flag(spark, pages_df=None):
    from metadata_quality_stack_spark.plans.pipeline import quality_pipeline
    from metadata_quality_stack_spark.sources.pages import generate_pages

    pdf = generate_pages(60, seed=11).drop(columns=["row_class"])
    df = spark.createDataFrame(pdf)
    base = quality_pipeline(df, id_cols=("url",), lang_col="lang").toPandas()
    terms = ["the", "damn"]
    tox = quality_pipeline(
        df, id_cols=("url",), lang_col="lang", toxic_terms=terms
    ).toPandas()
    assert "tox_count" in tox.columns
    # scoring columns are untouched by the toxicity stage
    b = base.sort_values("url").reset_index(drop=True)
    t = tox.sort_values("url").reset_index(drop=True)
    for col in ("total_score", "rating", "keep", "scrub_count"):
        assert (b[col] == t[col]).all()
    pat = re.compile(toxicity_pattern(terms))
    for i in range(len(t)):
        exp_n, exp_text = len(pat.findall(b["scrubbed_text"][i])), pat.sub(
            "<TOX>", b["scrubbed_text"][i]
        )
        assert t["tox_count"][i] == exp_n
        assert t["scrubbed_text"][i] == exp_text


# ------------------------------------------------- rare-token scrub
def test_rare_token_scrub_suppresses_hapaxes(spark):
    from metadata_quality_stack_spark.functions.scrub import rare_token_scrub

    docs = spark.createDataFrame(
        [
            (0, "call me John-Q-Public at once"),
            (1, "call me maybe at once"),
            (2, None),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in rare_token_scrub(docs, min_df=2).collect()}
    # 'John-Q-Public' and 'maybe' appear in ONE doc each -> suppressed;
    # shared tokens survive
    assert out[0].scrubbed_text == "call me <unk> at once"
    assert out[1].scrubbed_text == "call me <unk> at once"
    assert out[0].n_scrubbed == 1 and out[0].n_tokens == 5
    assert out[2].scrubbed_text == "" and out[2].n_tokens == 0
    assert out[3].scrubbed_text == ""


def test_rare_token_scrub_case_sensitive(spark):
    from metadata_quality_stack_spark.functions.scrub import rare_token_scrub

    docs = spark.createDataFrame(
        [(0, "Smith says hi"), (1, "smith says hi")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.scrubbed_text for r in rare_token_scrub(docs, 2).collect()}
    assert out[0] == "<unk> says hi" and out[1] == "<unk> says hi"


def test_rare_token_scrub_oracle(spark):
    import duckdb
    import pandas as pd

    from metadata_quality_stack_spark.functions.scrub import (
        rare_token_scrub,
        rare_token_scrub_sql,
    )

    p = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
    sp = (
        rare_token_scrub(docs, 380)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sp.n_scrubbed.sum() > 0  # the gate threshold genuinely fires
    dk = (
        con.execute(rare_token_scrub_sql(380))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sp, dk.astype(sp.dtypes.to_dict()))
