"""PII scrubbing — redact emails / phone numbers / IPv4 addresses
from document text before training, with per-type match counts (the
audit trail: how much was redacted, queryable as data).

Pure Column logic (``regexp_count`` + chained ``regexp_replace`` —
JVM-side, codegen, zero Python), which at 100 TB matters: scrubbing
is a full-corpus map, so anything per-row-Python here dominates the
pipeline. The patterns are deliberately written in the common subset
of Java regex (Spark) and RE2 (DuckDB) — no lookarounds, no
backreferences — so the DuckDB twin runs the SAME pattern strings
verbatim and the differential gate covers the regex semantics, not a
translation of them.

The scrubbed text applies the replacements sequentially email ->
ipv4 -> phone, and each count is computed on the text AS THAT STAGE
SEES IT — i.e. the counts are the replacements actually performed,
not independent matches on the original. The distinction is real
because the patterns CAN overlap: ``10.0.0.1@example.com`` is one
email whose redaction consumes the dotted run, so n_ipv4 must not
claim an IP redaction that never happened (an audit that over-reports
redactions is worse than none). Conservative patterns by design: a
redactor must not eat normal prose (false positives destroy training
text), so the phone rule requires an international ``+`` prefix —
extend per deployment. Stubbing NER-grade PII (names, addresses) is
out of scope: that needs a model, not a regex, and belongs behind the
same Arrow ``mapInPandas`` swap point as the multimodal kernels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the common Java-regex / RE2 subset — keep it that way (twin-tested)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
# first post-code group 1-4 digits: single-digit area codes are the
# norm in +81 3 (Tokyo), +7 495-style splits, etc. — requiring 2+
# silently let exactly those numbers through
PHONE_RE = r"\+\d{1,3}[ -]\d{1,4}([ -]\d{2,4}){1,3}"

REDACTIONS = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def scrub_text(text: Column) -> Column:
    """The redacted text: replacements applied in REDACTIONS order."""
    out = text
    for _, pattern, token in REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def scrub_pii(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per document: ``n_email`` / ``n_ipv4`` / ``n_phone``
    — the count of replacements each stage ACTUALLY performs (each
    pattern counted on the text with the earlier redactions applied,
    see module docstring) — and ``scrubbed``, the redacted text.
    Pure map-side projection."""
    staged = F.col(text_col)
    cols = []
    for name, pattern, token in REDACTIONS:
        cols.append(
            F.regexp_count(staged, F.lit(pattern)).alias(f"n_{name}")
        )
        staged = F.regexp_replace(staged, pattern, token)
    return documents.select(F.col(id_col), *cols, staged.alias("scrubbed"))


def scrub_pii_sql(
    relation: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB twin of ``scrub_pii`` — the same pattern strings
    verbatim (global-flag replaces; DuckDB replaces first-match-only
    without 'g'), counts staged exactly like the Spark side."""
    staged = text_expr
    count_cols = []
    for name, p, token in REDACTIONS:
        count_cols.append(
            f"CAST(len(regexp_extract_all({staged}, '{p}')) AS INT) AS n_{name}"
        )
        staged = f"regexp_replace({staged}, '{p}', '{token}', 'g')"
    counts = ", ".join(count_cols)
    return (
        f"SELECT {id_expr} AS doc_id, {counts}, {staged} AS scrubbed "
        f"FROM {relation}"
    )
