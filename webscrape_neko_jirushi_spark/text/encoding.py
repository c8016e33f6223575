"""Encoding-quality profiling and repair — the ftfy-lite pass a web
corpus needs before training: detect mojibake (UTF-8 text that was
decoded as cp1252 somewhere in the pipeline, the single most common
web-crawl corruption: ``Ã©`` where ``é`` was meant, ``â€™`` for the
right single quote), replacement characters (U+FFFD — evidence a
decoder already ate bytes), and stray C0 control characters; repair
the reversible class (the known mojibake table + control stripping)
and leave the rest to the admission cascade as a quality signal.

Everything is pure Column logic — literal ``replace`` chains and two
small regex counters, JVM-side codegen, zero Python — because this
is a full-corpus map at 100 TB. The mojibake table is LITERAL
two/three-character sequences (no regex semantics to diverge on);
the only regexes are character-class counters written in the Java /
RE2 common subset (hex escapes, no shorthand classes), so the DuckDB
twin runs the same pattern strings verbatim and the differential
fuzz gate covers the semantics.

Scope note (documented limitation, not an accident): a full ftfy
does iterative multi-encoding inference; this table covers the
cp1252 round-trip for the Latin-1 accents and Windows punctuation —
the overwhelmingly dominant case — and is trivially extensible. The
sequences are chosen so no entry is a prefix of another's remainder
(the replace chain is order-independent except the documented
``Â``-before-accents ordering, pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# UTF-8 bytes read as cp1252: (observed corruption, intended char).
# Three-byte punctuation first (their corruptions contain 'â'), then
# two-byte accents ('Ã?'), then the bare NBSP artifact ('Â' + NBSP) —
# applied in list order; no earlier repair creates a later pattern.
MOJIBAKE_TABLE: list[tuple[str, str]] = [
    ("â€™", "’"),  # â€™ -> ’
    ("â€œ", "“"),  # â€œ -> “
    ("â€“", "–"),  # â€“ -> –
    ("â€”", "—"),  # â€” -> —
    ("â€¦", "…"),  # â€¦ -> …
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã¡", "á"),  # Ã¡ -> á
    ("Ã³", "ó"),  # Ã³ -> ó
    ("Ãº", "ú"),  # Ãº -> ú
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("ÃŸ", "ß"),  # ÃŸ -> ß
    ("Â«", "«"),  # Â« -> «
    ("Â»", "»"),  # Â» -> »
    ("Â°", "°"),  # Â° -> °
    ("Â ", " "),  # Â+NBSP -> NBSP
]

# regex counters — Java/RE2 common subset (hex escapes only)
_MOJI_RE = "|".join(bad for bad, _ in MOJIBAKE_TABLE)
CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"  # C0 minus \t \n \r
REPLACEMENT_CHAR = "�"


def mojibake_count(text: Column) -> Column:
    """How many known-corruption sequences the text carries."""
    return F.regexp_count(text, F.lit(_MOJI_RE))


def replacement_char_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(REPLACEMENT_CHAR))


def control_char_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(CTRL_RE))


def fix_encoding(text: Column) -> Column:
    """Repair the reversible class: apply the mojibake table (literal
    replaces, in table order) and strip C0 control characters."""
    out = text
    for bad, good in MOJIBAKE_TABLE:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return F.regexp_replace(out, CTRL_RE, "")


def encoding_profile(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per document: the three corruption counters, the
    suspect verdict, and ``fixed`` — the repaired text. Pure map-side
    projection (one full-text scan)."""
    t = F.col(text_col)
    moji = mojibake_count(t)
    repl = replacement_char_count(t)
    ctrl = control_char_count(t)
    return documents.select(
        F.col(id_col),
        moji.alias("n_mojibake"),
        repl.alias("n_replacement"),
        ctrl.alias("n_control"),
        ((moji > 0) | (repl > 0) | (ctrl > 0)).alias("is_suspect"),
        fix_encoding(t).alias("fixed"),
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def fix_encoding_sql(text_expr: str) -> str:
    """DuckDB twin of ``fix_encoding`` — the same literal table in the
    same order, then the same control-class strip."""
    e = text_expr
    for bad, good in MOJIBAKE_TABLE:
        e = f"replace({e}, {_sql_quote(bad)}, {_sql_quote(good)})"
    return f"regexp_replace({e}, '{CTRL_RE}', '', 'g')"


def encoding_counts_sql(text_expr: str) -> dict[str, str]:
    """DuckDB twins of the three counters (same pattern strings)."""
    return {
        "n_mojibake": (
            f"CAST(len(regexp_extract_all({text_expr},"
            f" {_sql_quote(_MOJI_RE)})) AS INT)"
        ),
        "n_replacement": (
            f"CAST(len(regexp_extract_all({text_expr},"
            f" {_sql_quote(REPLACEMENT_CHAR)})) AS INT)"
        ),
        "n_control": (
            f"CAST(len(regexp_extract_all({text_expr},"
            f" '{CTRL_RE}')) AS INT)"
        ),
    }
