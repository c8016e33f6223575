"""HTML -> text extraction — the first transformation a web-crawl
training pipeline applies to raw markup (trafilatura/jusText-lite).
The reference extracts with BeautifulSoup CSS selectors against ONE
known site template (comprehensive_scraper.py); a 100 TB generic
crawl needs a template-free extractor that runs as a full-corpus map.

Everything is pure Column logic (JVM-side codegen, zero Python):
regex strip chains plus a LITERAL entity-decode table. Every pattern
is written in the Java-regex / RE2 common subset — inline ``(?is)``
flags, lazy ``.*?``, explicit whitespace classes (never ``\\s``: Java
counts VT in ``\\s``, RE2 does not — the X43 lesson), ``\\A``/``\\z``
anchors — so the DuckDB twin runs the SAME pattern strings verbatim
and stays byte-identical.

Extraction order (each step's reason is load-bearing):

1. strip comments, then ``<script>``/``<style>``/``<noscript>``
   blocks (content is code, not text; one pass per tag name so a
   mismatched close of a DIFFERENT name never truncates a block);
2. block-boundary tags -> ``\\n`` (paragraph structure survives as
   line structure — what line-dedup and repetition stats consume);
3. every remaining tag -> ``' '``;
4. entity decode AFTER tag removal (so ``&lt;b&gt;`` renders as the
   literal text ``<b>``, never as a tag — browser semantics), with
   ``&amp;`` decoded LAST (single-pass decoding: ``&amp;lt;`` must
   yield the literal ``&lt;``, not ``<``);
5. whitespace normalization: space runs collapse to one space,
   newline runs (with adjacent spaces) to one newline, outer
   whitespace trimmed.

Scope note (documented limitation): no CSS/visibility evaluation, no
charset sniffing (X43 ``fix_encoding`` runs upstream), no main-
content scoring — cross-page boilerplate removal is X40's job, which
consumes THIS operator's block-line output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# single-decode entity table: specific entities first, &amp; LAST
ENTITY_TABLE: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),  # extractor semantics: NBSP -> plain space
    ("&amp;", "&"),
]

_COMMENT_RE = r"(?s)<!--.*?-->"
# one pattern per tag name: a stray </style> inside a <script> block
# must not end the script strip early
_BLOCK_STRIP_RES = [
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?is)<noscript[^>]*>.*?</noscript>",
    # title is metadata, not body text — extract_title reads it
    r"(?is)<title[^>]*>.*?</title>",
]
# tags whose end (or self) marks a block boundary -> newline
_NEWLINE_TAG_RE = (
    r"(?i)<br[^>]*>|</p>|</div>|</li>|</tr>|</h[1-6]>"
    r"|</table>|</ul>|</ol>|</blockquote>|</section>|</article>"
)
_ANY_TAG_RE = r"<[^>]*>"
#  \r included: CRLF documents are the web's default, and a stray \r
#  left in extracted text makes 'line1\r' != 'line1' for every
#  md5(line)-keyed consumer (line-dedup, boilerplate, repetition) —
#  the space-run pass turns it into a space, which the newline-run
#  pass then folds into the break
_SPACE_RUN_RE = r"[ \t\f\r]+"
_NEWLINE_RUN_RE = r"[ \t\f\r]*\n[ \t\f\n\r]*"
_OUTER_WS_RE = r"\A[ \t\f\n\r]+|[ \t\f\n\r]+\z"
_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
_HREF_RE = r'(?i)href="([^"]*)"'


def decode_entities(text: Column) -> Column:
    """Literal single-pass entity decode (``&amp;`` last)."""
    out = text
    for ent, ch in ENTITY_TABLE:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML document, block structure preserved as
    newlines (see module docstring for the step order)."""
    out = F.regexp_replace(html, _COMMENT_RE, " ")
    for pat in _BLOCK_STRIP_RES:
        out = F.regexp_replace(out, pat, " ")
    out = F.regexp_replace(out, _NEWLINE_TAG_RE, "\n")
    out = F.regexp_replace(out, _ANY_TAG_RE, " ")
    out = decode_entities(out)
    out = F.regexp_replace(out, _SPACE_RUN_RE, " ")
    out = F.regexp_replace(out, _NEWLINE_RUN_RE, "\n")
    return F.regexp_replace(out, _OUTER_WS_RE, "")


def extract_title(html: Column) -> Column:
    """``<title>`` content, entity-decoded and space-collapsed; empty
    string when the document has no title (both engines agree on the
    no-match value)."""
    t = F.regexp_extract(html, _TITLE_RE, 1)
    t = decode_entities(t)
    t = F.regexp_replace(t, r"[ \t\f\n]+", " ")
    return F.regexp_replace(t, _OUTER_WS_RE, "")


def extract_links(html: Column) -> Column:
    """``href`` values in document order (array<string>) — the outlink
    source the frontier consumes. Raw attribute values; URL
    normalization is ``functions.urls.canonicalize_url``'s job."""
    return F.regexp_extract_all(html, F.lit(_HREF_RE), 1)


def extraction_profile(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """One row per page: title, extracted text, outlink count + first
    outlink, and ``text_ratio`` (visible chars / markup chars — the
    boilerplate-heaviness quality signal jusText thresholds on).
    Pure map-side projection: one full-markup scan, zero shuffles —
    at 100 TB this pipelines with the parquet scan."""
    h = F.col(html_col)
    text = html_to_text(h)
    links = extract_links(h)
    return pages.select(
        F.col(id_col),
        extract_title(h).alias("title"),
        text.alias("text"),
        F.size(links).alias("n_links"),
        F.when(F.size(links) > 0, links.getItem(0)).alias("first_link"),
        F.when(
            F.length(h) > 0, F.round(F.length(text) / F.length(h), 6)
        ).otherwise(0.0).alias("text_ratio"),
    )


# --- DuckDB twins (same pattern strings verbatim) ---------------------


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def decode_entities_sql(expr: str) -> str:
    e = expr
    for ent, ch in ENTITY_TABLE:
        e = f"replace({e}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    return e


def html_to_text_sql(expr: str) -> str:
    """DuckDB twin of ``html_to_text`` — identical pattern strings in
    the identical order."""
    e = f"regexp_replace({expr}, {_sql_quote(_COMMENT_RE)}, ' ', 'g')"
    for pat in _BLOCK_STRIP_RES:
        e = f"regexp_replace({e}, {_sql_quote(pat)}, ' ', 'g')"
    e = f"regexp_replace({e}, {_sql_quote(_NEWLINE_TAG_RE)}, chr(10), 'g')"
    e = f"regexp_replace({e}, {_sql_quote(_ANY_TAG_RE)}, ' ', 'g')"
    e = decode_entities_sql(e)
    e = f"regexp_replace({e}, {_sql_quote(_SPACE_RUN_RE)}, ' ', 'g')"
    e = f"regexp_replace({e}, {_sql_quote(_NEWLINE_RUN_RE)}, chr(10), 'g')"
    return f"regexp_replace({e}, {_sql_quote(_OUTER_WS_RE)}, '', 'g')"


def extract_title_sql(expr: str) -> str:
    e = f"regexp_extract({expr}, {_sql_quote(_TITLE_RE)}, 1)"
    e = decode_entities_sql(e)
    e = f"regexp_replace({e}, '[ \\t\\f\\n]+', ' ', 'g')"
    return f"regexp_replace({e}, {_sql_quote(_OUTER_WS_RE)}, '', 'g')"


def extract_links_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, {_sql_quote(_HREF_RE)}, 1)"
