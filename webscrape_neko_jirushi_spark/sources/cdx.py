"""CDX capture-index source: SURT keys, latest-capture selection,
revisit (digest-dedup) accounting (SURVEY.md §2.11 X72).

The reference discovers what it has already fetched by listing its own
output directory (data_manager.py's folder walk); every real web-scale
corpus instead starts from a CAPTURE INDEX — the CDX files that
Common Crawl / Internet Archive publish alongside WARC data: one line
per capture, ``urlkey timestamp original mimetype statuscode digest
redirect metatags length offset filename`` (the public CDX-11 /
"CDX N b a m s k r M S V g" server format). At 100 TB the index is
itself billions of lines, so every step here is a DataFrame op:

- :func:`parse_cdx` — ONE map-side split per line with a validity
  guard (field count + 14-digit timestamp + numeric length/offset);
  ``-`` placeholder fields become NULL. Malformed lines survive as
  ``valid = false`` rows so ingest can count them (X63 expectations
  discipline) instead of silently dropping.
- :func:`surt_key` — the canonical dedup key (Sort-friendly URI
  Reordering Transform, a documented subset: lowercase, scheme +
  fragment + leading ``www.`` + default-port strip, host labels
  reversed comma-joined, ``)`` + path). Pure column expression; the
  DuckDB twin (:func:`surt_key_sql`) applies the same regexes
  verbatim (Java/RE2 common subset — ``\\z`` anchors, no lookaround).
- :func:`latest_captures` — one row per urlkey: the capture with the
  greatest (timestamp, offset, filename), winner-in-aggregate
  ``max(struct(...))`` so it is ONE hash aggregate (no window over a
  skewed partition; the hot-urlkey case is exactly a crawl's
  revisit-heavy front page). Twin = ROW_NUMBER.
- :func:`revisit_report` — the WARC-revisit economics in one scalar
  row: captures whose digest was already stored are revisits; the
  dedup ratio decides how much of the crawl budget re-downloads
  unchanged bytes.

Cited reference behavior: data_manager.py:headers (the
existing-output walk this replaces at index scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# CDX-11 field order (public "CDX N b a m s k r M S V g" header).
_FIELDS = (
    "urlkey",
    "ts",
    "url",
    "mime",
    "status",
    "digest",
    "redirect",
    "meta",
    "length",
    "offset",
    "filename",
)

_SCHEME_RE = r"^[a-z][a-z0-9+.-]*://"
_WWW_RE = r"^www\."
_PORT_RE = r":([0-9]+)\z"
_FRAG_RE = r"(?s)#.*"
_TS_RE = r"^[0-9]{14}\z"
_NUM_RE = r"^[0-9]+\z"


def surt_key(url: Column) -> Column:
    """SURT canonical key of a URL column (documented subset): the
    key under which two spellings of the same capture collide —
    ``https://WWW.Example.com:443/A#f`` and ``http://example.com/a``
    both become ``com,example)/a``. Host labels are reversed so a
    sorted index clusters by registered domain (the property CDX
    files are sorted by)."""
    u = F.regexp_replace(F.lower(url), _FRAG_RE, "")
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    rest = F.regexp_replace(rest, _WWW_RE, "")
    hostport = F.regexp_extract(rest, r"^([^/]*)", 1)
    path = F.regexp_replace(rest, r"^[^/]*", "")
    port = F.regexp_extract(hostport, _PORT_RE, 1)
    host = F.regexp_replace(hostport, r":[0-9]+\z", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    keep_port = F.when(
        port.isin("", "80", "443"), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    return F.concat(
        rev, keep_port, F.lit(")"), F.when(path == "", F.lit("/")).otherwise(path)
    )


def surt_key_sql(expr: str) -> str:
    """DuckDB twin of :func:`surt_key` — same regex strings, same
    order of operations (lower -> defrag -> descheme -> dewww ->
    split host/path -> deport -> reverse labels)."""
    u = f"regexp_replace(lower({expr}), '{_FRAG_RE}', '')"
    rest = f"regexp_replace({u}, '{_SCHEME_RE}', '')"
    rest = f"regexp_replace({rest}, '{_WWW_RE}', '')"
    hostport = f"regexp_extract({rest}, '^([^/]*)', 1)"
    path = f"regexp_replace({rest}, '^[^/]*', '')"
    port = f"regexp_extract({hostport}, '{_PORT_RE}', 1)"
    host = f"regexp_replace({hostport}, ':[0-9]+\\z', '')"
    rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    keep_port = (
        f"(CASE WHEN {port} IN ('', '80', '443') THEN '' "
        f"ELSE ':' || {port} END)"
    )
    return (
        f"{rev} || {keep_port} || ')' || "
        f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
    )


def parse_cdx(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Typed capture rows from raw CDX-11 lines. One map-side split;
    no shuffle. ``valid`` marks well-formed lines (11 space-separated
    fields, 14-digit timestamp, numeric status/length/offset when
    present); malformed lines keep NULL fields so callers can audit
    them. ``-`` is the CDX placeholder for absent values -> NULL.
    The status guard matters cross-engine: an unguarded CAST of a
    non-numeric status ('30x') is NULL on Spark but a hard error on
    DuckDB — the twin would crash instead of diverging visibly."""
    p = lines.withColumn("_f", F.split(F.col(line_col), " "))
    f = lambda i: F.try_element_at("_f", F.lit(i + 1))  # noqa: E731
    valid = (
        (F.size("_f") == len(_FIELDS))
        & f(1).rlike(_TS_RE)
        & (f(4).rlike(_NUM_RE) | (f(4) == "-"))
        & (f(8).rlike(_NUM_RE) | (f(8) == "-"))
        & (f(9).rlike(_NUM_RE) | (f(9) == "-"))
    )

    def opt(i: int) -> Column:
        return F.when(valid & (f(i) != "-"), f(i))

    return p.select(
        F.col(line_col),
        valid.alias("valid"),
        opt(0).alias("urlkey"),
        opt(1).alias("ts"),
        opt(2).alias("url"),
        opt(3).alias("mime"),
        opt(4).cast("int").alias("status"),
        opt(5).alias("digest"),
        opt(6).alias("redirect"),
        opt(7).alias("meta"),
        opt(8).cast("long").alias("length"),
        opt(9).cast("long").alias("offset"),
        opt(10).alias("filename"),
    )


def parse_cdx_sql(lines_expr: str, line_col: str = "line") -> str:
    """DuckDB twin of :func:`parse_cdx` over ``lines_expr`` (an
    inline parenthesized subquery or table name — no WITH emitted, so
    it nests; the eighth-arc composition rule)."""
    fs = f"string_split({line_col}, ' ')"
    f = lambda i: f"{fs}[{i + 1}]"  # noqa: E731
    valid = (
        f"(len({fs}) = {len(_FIELDS)}"
        f" AND regexp_matches({f(1)}, '{_TS_RE}')"
        f" AND (regexp_matches({f(4)}, '{_NUM_RE}') OR {f(4)} = '-')"
        f" AND (regexp_matches({f(8)}, '{_NUM_RE}') OR {f(8)} = '-')"
        f" AND (regexp_matches({f(9)}, '{_NUM_RE}') OR {f(9)} = '-'))"
    )

    def opt(i: int, cast: str = "") -> str:
        e = f"CASE WHEN {valid} AND {f(i)} <> '-' THEN {f(i)} END"
        return f"CAST({e} AS {cast})" if cast else e

    return f"""
      SELECT {line_col},
             {valid} AS valid,
             {opt(0)} AS urlkey,
             {opt(1)} AS ts,
             {opt(2)} AS url,
             {opt(3)} AS mime,
             {opt(4, 'INTEGER')} AS status,
             {opt(5)} AS digest,
             {opt(6)} AS redirect,
             {opt(7)} AS meta,
             {opt(8, 'BIGINT')} AS length,
             {opt(9, 'BIGINT')} AS offset,
             {opt(10)} AS filename
      FROM {lines_expr}
    """


def latest_captures(captures: DataFrame, key_col: str = "urlkey") -> DataFrame:
    """One row per ``key_col``: the capture with the greatest
    (ts, offset, filename) plus the group's capture count. Winner
    selected INSIDE the aggregate (``max(struct(...))``) — one hash
    aggregate with map-side partials, no window, so a revisit-heavy
    hot urlkey (every crawl's front pages) costs its share of one
    shuffle rather than a skewed sort partition. The sort triple must
    be non-null; payload fields ride behind it in the struct and are
    only compared on full ties (impossible when offset is unique).
    Twin: ROW_NUMBER ... ORDER BY ts DESC, offset DESC, filename
    DESC + COUNT(*) OVER."""
    w = F.max(
        F.struct(
            F.col("ts"),
            F.col("offset"),
            F.col("filename"),
            F.col("url"),
            F.col("mime"),
            F.col("status"),
            F.col("digest"),
            F.col("length"),
        )
    ).alias("_w")
    out = captures.groupBy(key_col).agg(w, F.count("*").alias("n_captures"))
    return out.select(
        key_col,
        F.col("_w.ts").alias("ts"),
        F.col("_w.url").alias("url"),
        F.col("_w.mime").alias("mime"),
        F.col("_w.status").alias("status"),
        F.col("_w.digest").alias("digest"),
        F.col("_w.length").alias("length"),
        F.col("_w.offset").alias("offset"),
        F.col("_w.filename").alias("filename"),
        "n_captures",
    )


def latest_captures_sql(captures_expr: str, key_col: str = "urlkey") -> str:
    """DuckDB twin of :func:`latest_captures` (no WITH — nests)."""
    return f"""
      SELECT {key_col}, ts, url, mime, status, digest, length,
             "offset", filename, n_captures
      FROM (
        SELECT *,
               ROW_NUMBER() OVER (
                 PARTITION BY {key_col}
                 ORDER BY ts DESC, "offset" DESC, filename DESC
               ) AS _rn,
               COUNT(*) OVER (PARTITION BY {key_col}) AS n_captures
        FROM {captures_expr}
      ) r WHERE _rn = 1
    """


def revisit_report(captures: DataFrame, key_col: str = "urlkey") -> DataFrame:
    """One scalar row of capture-index economics: total captures,
    distinct urlkeys, distinct stored digests, and the revisit count
    (captures beyond the first appearance of their digest — the bytes
    a digest-deduplicating store does NOT re-store). All counts from
    ONE multi-count-distinct aggregate (Expand + partial/final — the
    X35 skew-safe shape); the ratio is exact integer-derived."""
    return captures.filter("valid").agg(
        F.count("*").alias("n_captures"),
        F.countDistinct(key_col).alias("n_urlkeys"),
        F.countDistinct("digest").alias("n_digests"),
        (F.count("*") - F.countDistinct("digest")).alias("n_revisits"),
        F.round(
            (F.count("*") - F.countDistinct("digest"))
            / F.count("*").cast("double"),
            6,
        ).alias("revisit_ratio"),
    )


def revisit_report_sql(captures_expr: str, key_col: str = "urlkey") -> str:
    """DuckDB twin of :func:`revisit_report` (no WITH — nests)."""
    return f"""
      SELECT COUNT(*) AS n_captures,
             COUNT(DISTINCT {key_col}) AS n_urlkeys,
             COUNT(DISTINCT digest) AS n_digests,
             COUNT(*) - COUNT(DISTINCT digest) AS n_revisits,
             ROUND((COUNT(*) - COUNT(DISTINCT digest))
                   / CAST(COUNT(*) AS DOUBLE), 6) AS revisit_ratio
      FROM {captures_expr} WHERE valid
    """
