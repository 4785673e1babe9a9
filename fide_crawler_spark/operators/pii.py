"""PII scrubbing — regex redaction as a pure JVM expression pipeline.

Training-data curation redacts personally identifying strings before
anything ships to a model.  At 100 TB the only viable shape is a chain
of ``regexp_replace`` expressions inside whole-stage codegen — zero
shuffle, zero Python, runs at scan speed and pushes through any
partitioning untouched.  This module keeps the pattern table DATA (an
ordered list), so callers can extend it without touching the operator.

Patterns are written in the common subset of Java regex (Spark) and
RE2 (DuckDB/Go): no lookaround, no backreferences — this is what makes
the operator oracle-able bit-for-bit against another engine, and is
also the portable-regex discipline large pipelines follow anyway (RE2's
linear-time guarantee is itself a scale feature: a pathological page
cannot DoS the scrubber the way catastrophic backtracking can).

Reference parity: the reference crawler stores raw scraped text with
no redaction pass (the parse path at
data_processing/data_fetching_processing.py:247-258 writes fields
verbatim); this extends the text-pipeline family per the brief's
training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order; earlier rules must
# not produce text that later rules would re-match (replacements use
# non-word <> delimiters so \b-anchored rules skip them).
DEFAULT_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    # 9+ digit runs: phone-ish / account-ish identifiers.  Runs after
    # ipv4 (octets are ≤3 digits, disjoint) and email (digits inside a
    # local part have no \b before them).
    ("longnum", r"\b\d{9,}\b", "<NUM>"),
]


def scrub_col(
    text: str | Column = "text",
    rules: list[tuple[str, str, str]] = DEFAULT_RULES,
) -> Column:
    """Redacted-text expression: the rule chain folded into nested
    ``regexp_replace`` calls — one codegen'd projection."""
    col = F.col(text) if isinstance(text, str) else text
    for _, pattern, repl in rules:
        col = F.regexp_replace(col, pattern, repl)
    return col


def pii_counts(
    text: str | Column = "text",
    rules: list[tuple[str, str, str]] = DEFAULT_RULES,
) -> list[Column]:
    """Per-rule match counts (audit columns ``n_<rule>``)."""
    col = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(col, F.lit(pattern)).alias(f"n_{name}")
        for name, pattern, _ in rules
    ]


def scrub(
    docs: DataFrame,
    text_col: str = "text",
    rules: list[tuple[str, str, str]] = DEFAULT_RULES,
    out_col: str = "clean_text",
) -> DataFrame:
    """Docs with ``out_col`` = redacted text plus per-rule counts
    (counted on the ORIGINAL text, before redaction)."""
    return docs.select(
        "*", *pii_counts(text_col, rules), scrub_col(text_col, rules).alias(out_col)
    )
