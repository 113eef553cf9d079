"""Rules-as-data configuration — the analog of the reference's metric tables.

Mirrors the structure of ``/root/reference/src/api/config.py``:

* ``METRICS_BY_PROFILE`` / ``COMMON_METRICS`` (config.py:243-316) ->
  ``RULES_BY_PROFILE`` / ``WEBTEXT_RULES`` here: one dict per rule with
  ``{id, dimension, weight, kind}``.
* ``RATING_THRESHOLDS_BY_PROFILE`` (config.py:30-46) -> ``RATING_THRESHOLDS``.
* ``DIMENSION_MAX_SCORES`` (config.py:327-349) -> ``DIMENSION_MAX``.
* vocabularies (config.py:182-195) -> broadcast stopword / blocklist sets.

The web-document profile keeps the reference's exact dimension weight
budget — findability 100, accessibility 100, interoperability 110,
reusability 75, contextuality 20, max 405, rating cuts 351/221/121 — and
re-targets each metric slot at a Gopher/C4-style web-text heuristic.
Rule ``kind``:
  * ``binary``   — per-doc pass/fail -> (count, population) in {(1,1),(0,1)}
  * ``fraction`` — per-doc (count, population) with a real denominator
                   (e.g. lines passing / total lines), like the reference's
                   entity-level populations (validators.py:878-974)
  * ``model``    — produced by a pandas-UDF scorer (langid / perplexity);
                   the extension slot of the checker plugin API
                   (validators.py:74-90)
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# Heuristic thresholds (Gopher/C4-style, frozen as plan-time literals)
# --------------------------------------------------------------------------
MIN_WORDS = 20
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 12.0
MAX_SYMBOL_WORD_RATIO = 0.10  # (# + ellipsis) per word
MIN_STOPWORD_DENSITY = 0.02
MIN_DISTINCT_STOPWORDS = 2
MAX_DIGIT_RATIO = 0.20
MAX_WHITESPACE_RATIO = 0.40
MAX_AVG_LINE_LEN = 2_000
PERPLEXITY_MAX = 20_000.0  # calibrated: clean seed-vocab prose ~5-10k, gibberish ~300k
LANGID_MIN_CONF = 0.20

# --------------------------------------------------------------------------
# Rule table (dimension budgets identical to reference config.py:243-316)
# --------------------------------------------------------------------------
WEBTEXT_RULES: list[dict] = [
    # findability 100 = 30 + 30 + 20 + 20   (dcat_keyword/theme/spatial/temporal)
    {"id": "word_count", "dimension": "findability", "weight": 30, "kind": "binary"},
    {"id": "mean_word_length", "dimension": "findability", "weight": 30, "kind": "binary"},
    {"id": "alpha_ratio", "dimension": "findability", "weight": 20, "kind": "fraction"},
    {"id": "line_uniqueness", "dimension": "findability", "weight": 20, "kind": "fraction"},
    # accessibility 100 = 50 + 20 + 30      (accessURL/downloadURL/downloadURL_status)
    {"id": "terminal_punct", "dimension": "accessibility", "weight": 50, "kind": "fraction"},
    {"id": "ellipsis_free", "dimension": "accessibility", "weight": 20, "kind": "fraction"},
    {"id": "boilerplate_free", "dimension": "accessibility", "weight": 30, "kind": "binary"},
    # interoperability 110 = 20+10+5+5+20+20+30  (format..mediaType..*_compliance)
    {"id": "langid_match", "dimension": "interoperability", "weight": 20, "kind": "model"},
    {"id": "langid_confidence", "dimension": "interoperability", "weight": 10, "kind": "model"},
    {"id": "stopword_density", "dimension": "interoperability", "weight": 5, "kind": "binary"},
    {"id": "stopword_distinct", "dimension": "interoperability", "weight": 5, "kind": "binary"},
    {"id": "symbol_ratio", "dimension": "interoperability", "weight": 20, "kind": "binary"},
    {"id": "bullet_free", "dimension": "interoperability", "weight": 20, "kind": "fraction"},
    {"id": "perplexity_ok", "dimension": "interoperability", "weight": 30, "kind": "model"},
    # reusability 75 = 20+10+10+5+20+10     (license..publisher)
    {"id": "word_diversity", "dimension": "reusability", "weight": 20, "kind": "fraction"},
    {"id": "digit_ratio", "dimension": "reusability", "weight": 10, "kind": "binary"},
    {"id": "pii_email_free", "dimension": "reusability", "weight": 10, "kind": "binary"},
    {"id": "pii_phone_free", "dimension": "reusability", "weight": 5, "kind": "binary"},
    {"id": "whitespace_ratio", "dimension": "reusability", "weight": 20, "kind": "binary"},
    {"id": "pii_ip_free", "dimension": "reusability", "weight": 10, "kind": "binary"},
    # contextuality 20 = 5+5+5+5            (byteSize/issued/modified/rights)
    {"id": "chars_consistent", "dimension": "contextuality", "weight": 5, "kind": "binary"},
    {"id": "lang_present", "dimension": "contextuality", "weight": 5, "kind": "binary"},
    {"id": "source_present", "dimension": "contextuality", "weight": 5, "kind": "binary"},
    {"id": "avg_line_len", "dimension": "contextuality", "weight": 5, "kind": "binary"},
]

DIMENSIONS = ["findability", "accessibility", "interoperability", "reusability", "contextuality"]

DIMENSION_MAX = {  # reference config.py:327-335 (dcat_ap_es row)
    "findability": 100,
    "accessibility": 100,
    "interoperability": 110,
    "reusability": 75,
    "contextuality": 20,
}

MAX_SCORE = 405  # reference config.py:321-325

RATING_THRESHOLDS = {  # reference config.py:30-46 (dcat_ap_es)
    "excellent": 351,
    "good": 221,
    "sufficient": 121,
}

RATINGS = ["Excellent", "Good", "Sufficient", "Bad"]

# Gopher/C4-style hard filters: a failing hard rule (percentage < 0.5)
# forces drop regardless of the weighted rollup. The rollup still decides
# rating; keep = rating != 'Bad' AND no hard-fail.
HARD_RULES = [
    "word_count",        # too short / too long
    "line_uniqueness",   # boilerplate repetition
    "symbol_ratio",      # symbol salad
    "stopword_density",  # keyword stuffing
    "langid_match",      # non-target language (model rule, full profile)
    "perplexity_ok",     # gibberish (model rule, full profile)
]

# Profiles: "webtext" = full rule set (models included); "webtext_native" =
# only rules expressible as native SQL (the DuckDB-oracle-checkable subset).
RULES_BY_PROFILE = {
    "webtext": WEBTEXT_RULES,
    "webtext_native": [r for r in WEBTEXT_RULES if r["kind"] != "model"],
}

# --------------------------------------------------------------------------
# Broadcast vocabularies (analog of docs/vocabularies/*.csv, config.py:182-195)
# --------------------------------------------------------------------------
# English stopwords — frozen, deliberately small (Gopher uses a tiny list).
STOPWORDS_EN = [
    "the", "be", "to", "of", "and", "a", "in", "that", "have", "i",
    "it", "for", "not", "on", "with", "he", "as", "you", "do", "at",
    "this", "but", "his", "by", "from", "is", "was", "are", "an", "or",
]

# Per-language stopword sets for the SQL-expressible heuristic langid
# (the model langid is the hashed char-n-gram UDF in functions/langid.py).
STOPWORDS_BY_LANG = {
    "en": ["the", "and", "of", "to", "in", "is", "was", "that", "with", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "von", "mit", "den", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "dans", "pour", "que"],
    "zh": ["de5", "shi4", "zai4", "le5", "wo3", "you3", "ta1", "zhe4", "bu4", "ren2"],
}

BOILERPLATE_PHRASES = [
    "lorem ipsum",
    "terms of service",
    "enable javascript",
    "cookies must be enabled",
    "all rights reserved",
]

# --------------------------------------------------------------------------
# PII scrub patterns — restricted to the Java/RE2/Python common regex subset
# (reference hit the dialect problem itself: SHACLValidationService.ts:51-83,
# validators.py:504-506). No lookaround; \b only.
# --------------------------------------------------------------------------
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IP = (
    r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    r"\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"
)
PII_PHONE = (
    r"\+[0-9]{1,3}([ .\-][0-9]{2,4}){2,4}"  # +34 612 345 678
    r"|\([0-9]{3}\)[ ]?[0-9]{3}[.\-][0-9]{4}"  # (555) 123-4567
    r"|\b[0-9]{9,11}\b"  # 612345678
)
PII_REPLACEMENTS = {
    "email": (PII_EMAIL, "<EMAIL>"),
    "phone": (PII_PHONE, "<PHONE>"),
    "ip": (PII_IP, "<IP>"),
}
# Scrub order is part of the contract (email first so user@host never gets a
# phone match inside it; ip before phone would let \b[0-9]{9,11}\b eat
# dotted quads — keep email, ip, phone).
SCRUB_ORDER = ["email", "ip", "phone"]
