"""Native Column expressions for per-document text features.

Every feature is a pure JVM-side expression — and deliberately free of
higher-order functions (transform/filter/aggregate lambdas) on the hot
path: Spark's whole-stage-codegen subexpression elimination does NOT
cover lambda expressions, so a 21-rule projection that reuses an HOF
tokenization re-executes it per reference (measured: 990 split() calls
per row before this rewrite). Instead:

* token counts   -> split() on edge-trimmed text (plain function, CSE-able)
* sum word len   -> arithmetic: length(text) - whitespace count
* line metrics   -> single-pass multiline regex counts ('(?m)...' — the
                    Java/RE2/Python common subset; \\n line endings assumed)
* stopword sets  -> array_intersect on array_distinct (no lambdas)

This is the Spark re-expression of the reference's per-record checkers
(validators.py:221-646), one shared pass instead of
one-graph-scan-per-metric (validators.py:906-972).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from metadata_quality_stack_spark import config

WS_CLASS = "[ \\t\\n\\r]"  # explicit whitespace class (dialect-stable)
EDGE_WS = "^" + WS_CLASS + "+|" + WS_CLASS + "+$"


def edge_trimmed(text: Column) -> Column:
    return F.regexp_replace(text, EDGE_WS, "")


def token_array(text: Column) -> Column:
    """Non-empty whitespace-separated tokens (empty array for blank text)."""
    t = edge_trimmed(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, WS_CLASS + "+")
    )


def chars_matching(text: Column, cls: str) -> Column:
    """Number of characters of ``text`` matching regex char-class ``cls``."""
    return F.length(text) - F.length(F.regexp_replace(text, cls, ""))


def substr_occurrences(text: Column, sub: str) -> Column:
    """Occurrences of literal ``sub`` (leftmost, non-overlapping)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(sub), F.lit("")))) / F.lit(len(sub))


def safe_div(num: Column, den: Column) -> Column:
    """count/population with the reference's population-0 guard
    (validators.py:957: percentage = 0 when population == 0)."""
    return F.coalesce(
        num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0)), F.lit(0.0)
    )


# multiline regex line probes (Java/RE2/Python-parity; '\n' line endings)
RE_NONEMPTY_LINE = "(?m)^ *[^ \\n]"
RE_TERMINAL_PUNCT = "(?m)[.!?\"'] *$"
RE_ELLIPSIS_EOL = "(?m)\\.\\.\\. *$"
RE_BULLET_BOL = "(?m)^ *[-*•]"


def feature_columns(text: Column) -> dict[str, Column]:
    """All raw per-doc features; every expression is HOF-free so codegen
    CSE shares the repeated subtrees across the 21 rule expressions."""
    toks = token_array(text)
    lows = F.array_distinct(token_array(F.lower(text)))
    raw_lines = F.split(text, "\\n", -1)
    sw = F.array(*[F.lit(s) for s in config.STOPWORDS_EN])
    low_text = F.lower(text)

    boiler = F.lit(False)
    for p in config.BOILERPLATE_PHRASES:
        boiler = boiler | F.contains(low_text, F.lit(p))

    return {
        "n_words": F.size(toks),
        "n_chars_txt": F.length(text),
        "n_lines": F.regexp_count(text, F.lit(RE_NONEMPTY_LINE)),
        # sum of token lengths == count of non-whitespace chars
        "sum_word_len": F.length(text) - chars_matching(text, WS_CLASS),
        "n_alpha": chars_matching(text, "[A-Za-z]"),
        "n_digit": chars_matching(text, "[0-9]"),
        "n_ws": chars_matching(text, WS_CLASS),
        "n_symbols": (
            chars_matching(text, "[#]") + substr_occurrences(text, "...")
        ).cast("long"),
        "n_raw_lines": F.size(raw_lines),
        "n_distinct_raw_lines": F.size(F.array_distinct(raw_lines)),
        "n_distinct_words": F.size(lows),
        "n_stop_distinct": F.size(F.array_intersect(lows, sw)),
        "n_terminal_punct_lines": F.regexp_count(text, F.lit(RE_TERMINAL_PUNCT)),
        "n_ellipsis_lines": F.regexp_count(text, F.lit(RE_ELLIPSIS_EOL)),
        "n_bullet_lines": F.regexp_count(text, F.lit(RE_BULLET_BOL)),
        "has_boilerplate": boiler,
        "has_email": text.rlike(config.PII_EMAIL),
        "has_phone": text.rlike(config.PII_PHONE),
        "has_ip": text.rlike(config.PII_IP),
    }
