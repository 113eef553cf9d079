"""Native Column expressions for per-document text features.

Every feature here is a pure JVM-side expression (whole-stage codegen,
no Python in the hot path) — the Spark re-expression of the reference's
per-record checker functions (validators.py:221-646). Tokenization is
materialized ONCE and shared by every rule (vs the reference's
one-graph-scan-per-metric loop, validators.py:906-972).

Regex subset: Java / RE2 / Python common dialect only — explicit char
classes instead of \\s (RE2's \\s lacks \\x0B), no lookaround — so the
DuckDB oracle (oracle/sqlgen.py) can evaluate identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from metadata_quality_stack_spark import config

WS_CLASS = "[ \\t\\n\\r]"  # explicit whitespace class (dialect-stable)


def tokens(text: Column) -> Column:
    """Non-empty whitespace-separated tokens."""
    return F.filter(F.split(text, WS_CLASS + "+"), lambda x: x != F.lit(""))


def nonempty_lines(text: Column) -> Column:
    """Lines (split on \\n) with non-whitespace content, trimmed at both ends."""
    trimmed = F.transform(F.split(text, "\\n"), lambda x: F.trim(x))
    return F.filter(trimmed, lambda x: x != F.lit(""))


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


def feature_columns(text: Column) -> dict[str, Column]:
    """All raw per-doc features; compose into one select so Catalyst
    CSE/CollapseProject shares the tokenization across rules."""
    toks = tokens(text)
    lows = F.transform(toks, lambda x: F.lower(x))
    lines = nonempty_lines(text)
    sw_hits = F.filter(lows, lambda x: x.isin(*config.STOPWORDS_EN))
    low_text = F.lower(text)

    return {
        "n_words": F.size(toks),
        "n_chars_txt": F.length(text),
        "n_lines": F.size(lines),
        "sum_word_len": F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ),
        "n_alpha": chars_matching(text, "[A-Za-z]"),
        "n_digit": chars_matching(text, "[0-9]"),
        "n_ws": chars_matching(text, WS_CLASS),
        "n_symbols": (
            chars_matching(text, "[#]") + substr_occurrences(text, "...")
        ).cast("long"),
        "n_distinct_lines": F.size(F.array_distinct(lines)),
        "n_distinct_words": F.size(F.array_distinct(lows)),
        "n_stopword_hits": F.size(sw_hits),
        "n_distinct_stopwords": F.size(F.array_distinct(sw_hits)),
        "n_terminal_punct_lines": F.size(
            F.filter(lines, lambda x: F.substring(x, -1, 1).isin(".", "!", "?", '"', "'"))
        ),
        "n_ellipsis_lines": F.size(F.filter(lines, lambda x: x.endswith("..."))),
        "n_bullet_lines": F.size(
            F.filter(lines, lambda x: F.substring(x, 1, 1).isin("-", "*", "•"))
        ),
        "has_boilerplate": F.exists(
            F.array(*[F.lit(p) for p in config.BOILERPLATE_PHRASES]),
            lambda p: F.contains(low_text, p),
        ),
        "has_email": text.rlike(config.PII_EMAIL),
        "has_phone": text.rlike(config.PII_PHONE),
        "has_ip": text.rlike(config.PII_IP),
    }
