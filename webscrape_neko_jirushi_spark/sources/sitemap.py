"""Sitemap source: urlset/sitemapindex parsing + bounded expansion
(SURVEY.md §2.11 X62; sitemaps.org protocol).

The reference discovers URLs only by walking listing pages
(comprehensive_scraper.py pagination; smart_cat_discovery.py's probe
ranges) — but every polite crawl's FIRST seed source is the site's own
sitemap: robots.txt points at ``Sitemap:`` URLs, each either a
``<urlset>`` of page entries (loc, lastmod, changefreq, priority) or a
``<sitemapindex>`` of child sitemaps (nested at most one level per the
protocol; 50k URLs / 50 MB per file — which is exactly why expansion
must be a DATAFRAME op: a large site is tens of thousands of sitemap
files).

Parsing is regex in the Java/RE2 COMMON SUBSET ((?s) lazy-dotall
blocks, explicit ``[ \\t\\n]`` classes, never ``\\s`` — the X43/X46
contract), so the DuckDB twin runs the SAME pattern strings verbatim.
XML entity decoding reuses the X46 table (sitemap locs escape ``&`` as
``&amp;``). Malformed blocks (no <loc>) drop; numeric fields are
regex-guarded before the cast (both engines agree on NULL for junk —
no reliance on either engine's cast-failure behavior, ANSI or not).

Shapes:
- :func:`parse_urlset` — one row per ``<url>`` entry: map-side
  ``regexp_extract_all`` + ONE explode; pipelines with the scan.
- :func:`parse_sitemapindex` — child sitemap locs.
- :func:`expand_sitemaps` — bounded-depth expansion against a fetched
  (url, xml) page table: per level ONE semi-join (which sitemaps to
  open) + parse; a seen-set anti-join makes self-referencing indexes
  terminate (crawl-trap discipline, X35); depth caps the protocol's
  nesting rule. Returns the url-entry table for the frontier
  (``crawl/engine``'s union_dedup path consumes it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..text.extraction import _sql_quote, decode_entities, decode_entities_sql

_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_CHILD_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC_RE = r"(?s)<loc>[ \t\n]*(.*?)[ \t\n]*</loc>"
_LASTMOD_RE = r"(?s)<lastmod>[ \t\n]*(.*?)[ \t\n]*</lastmod>"
_CHANGEFREQ_RE = r"(?s)<changefreq>[ \t\n]*(.*?)[ \t\n]*</changefreq>"
_PRIORITY_RE = r"(?s)<priority>[ \t\n]*(.*?)[ \t\n]*</priority>"
_NUM_RE = r"^[0-9]+([.][0-9]+)?$"


def _field(block, pat):
    return F.regexp_extract(block, pat, 1)


def parse_urlset(
    pages: DataFrame, xml_col: str = "xml", id_col: str = "sitemap_url"
) -> DataFrame:
    """One row per ``<url>`` entry: (id_col, loc, lastmod, changefreq,
    priority). Entries without a ``<loc>`` are dropped (protocol:
    loc is mandatory); absent optional fields are NULL; priority is
    regex-guarded to survive junk on both engines identically."""
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK_RE), 1)
    e = pages.select(F.col(id_col), F.explode(blocks).alias("b"))
    loc = decode_entities(_field(F.col("b"), _LOC_RE))
    lastmod = _field(F.col("b"), _LASTMOD_RE)
    changefreq = _field(F.col("b"), _CHANGEFREQ_RE)
    prio = _field(F.col("b"), _PRIORITY_RE)
    return (
        e.select(
            F.col(id_col),
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
            F.when(changefreq != "", changefreq).alias("changefreq"),
            F.when(prio.rlike(_NUM_RE), prio.cast("double")).alias("priority"),
        )
        .filter(F.col("loc") != "")
    )


def parse_sitemapindex(
    pages: DataFrame, xml_col: str = "xml", id_col: str = "sitemap_url"
) -> DataFrame:
    """One row per child sitemap: (id_col, child)."""
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_CHILD_BLOCK_RE), 1)
    child = decode_entities(_field(F.col("b"), _LOC_RE))
    return (
        pages.select(F.col(id_col), F.explode(blocks).alias("b"))
        .select(F.col(id_col), child.alias("child"))
        .filter(F.col("child") != "")
    )


def expand_sitemaps(
    web: DataFrame,
    seeds: DataFrame,
    max_depth: int = 3,
) -> DataFrame:
    """Expand seed sitemap URLs against a fetched page table
    ``web(url, xml)`` (the fetch tier's output — in this sandbox a
    synthetic table; on a cluster the same join against the fetched
    WARC/parquet pages). ``seeds`` has column ``url``.

    Per level: ONE semi-join picks the current level's pages, urlset
    entries accumulate, sitemapindex children (minus the seen set —
    self/cyclic references terminate) become the next level.
    ``max_depth`` bounds the walk (the protocol allows one nesting
    level; hostile trees are X35's business). Returns
    (sitemap_url, loc, lastmod, changefreq, priority)."""
    if max_depth < 1:
        raise ValueError(f"expand_sitemaps: max_depth must be >= 1, got {max_depth}")
    level = seeds.select("url").distinct().localCheckpoint(eager=True)
    seen = level
    out: DataFrame | None = None
    for _ in range(max_depth):
        if level.limit(1).count() == 0:
            break
        pages = web.join(level, "url").select(
            F.col("url").alias("sitemap_url"), "xml"
        )
        entries = parse_urlset(pages)
        out = entries if out is None else out.unionByName(entries)
        nxt = (
            parse_sitemapindex(pages)
            .select(F.col("child").alias("url"))
            .distinct()
            .join(seen, "url", "left_anti")
            .localCheckpoint(eager=True)
        )
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        level = nxt
    if out is None:
        # zero seeds (a host whose robots listed no Sitemap: lines):
        # the walk never ran — an empty ENTRY table with the right
        # schema, consumable by the frontier union path, not a crash
        return parse_urlset(
            web.select(
                F.col("url").alias("sitemap_url"), "xml"
            ).limit(0)
        )
    return out


# --- DuckDB twins (same pattern strings verbatim) --------------------------

def parse_urlset_sql(pages_rel: str, xml_col: str = "xml", id_col: str = "sitemap_url") -> str:
    """Twin of :func:`parse_urlset` over ``pages_rel``; a SELECT of
    (id_col, loc, lastmod, changefreq, priority)."""
    loc = decode_entities_sql(
        f"regexp_extract(u.b, {_sql_quote(_LOC_RE)}, 1)"
    )
    lastmod = f"regexp_extract(u.b, {_sql_quote(_LASTMOD_RE)}, 1)"
    changefreq = f"regexp_extract(u.b, {_sql_quote(_CHANGEFREQ_RE)}, 1)"
    prio = f"regexp_extract(u.b, {_sql_quote(_PRIORITY_RE)}, 1)"
    return f"""
      SELECT {id_col}, loc, lastmod, changefreq, priority FROM (
        SELECT p.{id_col},
               {loc} AS loc,
               CASE WHEN {lastmod} <> '' THEN {lastmod} END AS lastmod,
               CASE WHEN {changefreq} <> '' THEN {changefreq} END AS changefreq,
               CASE WHEN regexp_matches({prio}, {_sql_quote(_NUM_RE)})
                    THEN CAST({prio} AS DOUBLE) END AS priority
        FROM {pages_rel} p,
        LATERAL UNNEST(regexp_extract_all(p.{xml_col}, {_sql_quote(_URL_BLOCK_RE)}, 1)) AS u(b)
      ) WHERE loc <> ''
    """
