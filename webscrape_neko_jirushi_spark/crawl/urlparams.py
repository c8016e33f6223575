"""URL query-parameter significance mining (SURVEY.md §2.11 X86).

A 10^10-URL frontier is full of parameterized duplicates: session
ids, tracking tags, and pagination params that do or don't change the
page behind the URL. The classic crawler answer (Googlebot's "URL
parameters" handling, Heritrix canonicalization rules) is a per-param
verdict *learned from the crawl's own fetch log*: a param is
**content-neutral** when, across every group of fetched URLs that are
identical except for that param's value, the content digest never
changes; it is **significant** when any such group shows two digests.
Neutral params can then be stripped from the frontier's canonical
form, collapsing entire families of duplicate URLs before they are
ever fetched.

Reference analog: the reference has no param learning at all — it
string-matches raw URLs into Python sets
(comprehensive_scraper.py:181-199), so ``?sess=`` variants are
refetched forever. At frontier scale the seen-set must canonicalize,
and WHICH params to canonicalize away is a data question, answered
here from the fetch log.

Semantics (both engines, bit-for-bit):

1. Keep fetched URLs with a non-empty query string; take ONE stable
   digest per distinct URL (``min(digest)`` — an unstable page never
   gets to vote twice with different content).
2. Explode ``k=v`` pairs. For each pair, the **residual key** is the
   URL with that one pair removed and the remaining pairs sorted —
   the group of URLs "identical except for this param".
3. Per (param, residual) group: ``n_vals`` distinct values and
   ``n_digests`` distinct digests. Only groups with ``n_vals >= 2``
   are *probe* groups (single-value groups carry no evidence).
4. Per param: ``significant`` if any probe group varies
   (``n_digests >= 2``), ``content_neutral`` if probed and no group
   varies, else ``insufficient_evidence``.

Shape at scale: the explode multiplies rows by the mean param count
(small constant); both groupBys shuffle on wide well-spread keys
((param, residual) then param); the verdict table is O(#param names)
and broadcast back for stripping. Zero Python, zero collect —
everything is split/array/window-free builtin projections, so the
whole pre-aggregate stage is one WholeStageCodegen span.

Malformation policy (``malformed=`` on every learner entry point):

- ``'error'`` (default): duplicate param NAME inside one URL
  (``?a=1&a=2`` list-params) would make pair-removal ambiguous ->
  ``raise_error``; a pair with more than one ``=`` (un-encoded
  value) would split differently across engines -> ``raise_error``.
  Bare flags (``?flag``) are fine: value is ''.
- ``'skip'``: the operational mode for real fetch logs, where
  list-param URLs are ubiquitous and one of them must not kill a
  10^10-row learning job — offending URLs are EXCLUDED from
  evidence (the same no-evidence treatment single-value groups
  already get); :func:`malformed_url_report` counts what was
  excluded so the skip is never silent.

The query string is everything after the FIRST ``?`` — RFC 3986
allows ``?`` inside the query component, so a positional
``split_part`` would silently truncate ``?next=/p?id=9``-style
values and corrupt both the residual groups and the canonical form.

The DuckDB twins are emitted by ``*_sql`` builders from the same
constants so the oracle can never drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PAIR_OK = r"\A[^=&?]+(=[^=&]*)?\z"
_MODES = ("error", "skip")


def _query_of(url: Column) -> Column:
    """Everything after the FIRST '?' (not split_part: '?' is legal
    INSIDE a query per RFC 3986). locate=0 (no '?') returns the whole
    url — every caller guards with ``contains('?')`` first."""
    return F.substring(url, F.locate("?", url) + 1, F.length(url))


def _pair_names(pairs: Column) -> Column:
    return F.transform(pairs, lambda p: F.split_part(p, F.lit("="), F.lit(1)))


def _well_formed(pairs: Column) -> Column:
    """All pairs match _PAIR_OK and no param name repeats."""
    return F.forall(pairs, lambda p: p.rlike(_PAIR_OK)) & (
        F.array_size(pairs) == F.array_size(F.array_distinct(_pair_names(pairs)))
    )


def _checked_mode(malformed: str) -> None:
    if malformed not in _MODES:
        raise ValueError(
            f"urlparams: malformed={malformed!r} (one of {_MODES}) required"
        )


def _exploded_pairs(
    df: DataFrame, url_col: str, digest_col: str, malformed: str = "error"
) -> DataFrame:
    """(url, digest) -> one row per k=v pair with the residual key.

    ``digest`` is first reduced to min() per distinct URL, then the
    query string is split. Output: url, digest, param, value,
    residual. ``malformed='skip'`` filters offending URLs out instead
    of raising (see module docstring).
    """
    _checked_mode(malformed)
    base = F.split_part(F.col("url"), F.lit("?"), F.lit(1))
    query = _query_of(F.col("url"))
    one = (
        df.select(
            F.col(url_col).alias("url"), F.col(digest_col).alias("digest")
        )
        .filter(F.col("url").isNotNull())
        .groupBy("url")
        .agg(F.min("digest").alias("digest"))
        .filter(F.col("url").contains("?") & (F.length(query) > 0))
        .select("url", "digest", base.alias("base"), F.split(query, "&").alias("pairs"))
    )
    pair = F.col("pair")
    if malformed == "skip":
        one = one.filter(_well_formed(F.col("pairs")))
        name = F.split_part(pair, F.lit("="), F.lit(1))
        checked_pairs = F.col("pairs")
    else:
        bad_pair = ~pair.rlike(_PAIR_OK)
        name = F.when(
            bad_pair,
            F.raise_error(
                F.concat(F.lit("urlparams: malformed k=v pair in "), F.col("url"))
            ),
        ).otherwise(F.split_part(pair, F.lit("="), F.lit(1)))
        dup_name = F.array_size(F.col("pairs")) != F.array_size(
            F.array_distinct(_pair_names(F.col("pairs")))
        )
        checked_pairs = F.when(
            dup_name,
            F.raise_error(
                F.concat(
                    F.lit("urlparams: duplicate param name in "), F.col("url")
                )
            ),
        ).otherwise(F.col("pairs"))
    # r6: sort ONCE per URL below the explode, remove per pair above it.
    # array_remove deletes every element equal to `pair`, so
    # sort-then-remove == remove-then-sort for ANY input (multiset ops
    # commute, duplicates included) — and EXPLODING the sorted array
    # makes the Generate node itself depend on `_sp`, so Catalyst
    # cannot collapse the O(p log p) sort back into the per-pair
    # residual expression (a plain hoisted projection gets re-inlined).
    # Element order out of the explode changes, but every consumer
    # aggregates, and param/value/residual are per-element facts.
    residual = F.concat(
        F.col("base"),
        F.lit("?"),
        F.array_join(F.array_remove(F.col("_sp"), pair), "&"),
    )
    return (
        one.select("url", "digest", "base", checked_pairs.alias("pairs"))
        .select(
            "url", "digest", "base", F.array_sort(F.col("pairs")).alias("_sp")
        )
        .select(
            "url",
            "digest",
            "base",
            "_sp",
            F.explode("_sp").alias("pair"),
        )
        .select(
            "url",
            "digest",
            name.alias("param"),
            F.split_part(pair, F.lit("="), F.lit(2)).alias("value"),
            residual.alias("residual"),
        )
    )


def malformed_url_report(df: DataFrame, url_col: str = "url") -> DataFrame:
    """One row: (n_urls_with_query, n_malformed) over DISTINCT urls —
    the companion every ``malformed='skip'`` run reports next to its
    verdicts, so excluded evidence is counted, never silent. A
    malformed URL has a duplicate param name or a pair that fails
    ``_PAIR_OK`` (more than one un-encoded ``=``)."""
    q = _query_of(F.col("url"))
    urls = (
        df.select(F.col(url_col).alias("url"))
        .filter(
            F.col("url").isNotNull()
            & F.col("url").contains("?")
            & (F.length(q) > 0)
        )
        .distinct()
        .select(F.split(q, "&").alias("pairs"))
    )
    return urls.agg(
        F.count("*").cast("long").alias("n_urls_with_query"),
        F.coalesce(
            F.sum((~_well_formed(F.col("pairs"))).cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("n_malformed"),
    )


def param_significance(
    df: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    malformed: str = "error",
) -> DataFrame:
    """Per-param verdict table: (param, n_urls, n_groups,
    n_probe_groups, n_varying_groups, verdict). ``malformed='skip'``
    excludes list-param / un-encoded URLs from evidence instead of
    raising — pair it with :func:`malformed_url_report`."""
    px = _exploded_pairs(df, url_col, digest_col, malformed)
    groups = px.groupBy("param", "residual").agg(
        F.countDistinct("value").alias("n_vals"),
        F.countDistinct("digest").alias("n_digests"),
        F.countDistinct("url").alias("n_urls"),
    )
    probe = F.col("n_vals") >= 2
    varying = probe & (F.col("n_digests") >= 2)
    rep = groups.groupBy("param").agg(
        F.sum("n_urls").alias("n_urls"),
        F.count("*").alias("n_groups"),
        F.sum(probe.cast("long")).alias("n_probe_groups"),
        F.sum(varying.cast("long")).alias("n_varying_groups"),
    )
    return rep.select(
        "param",
        "n_urls",
        "n_groups",
        "n_probe_groups",
        "n_varying_groups",
        F.when(F.col("n_varying_groups") > 0, F.lit("significant"))
        .when(F.col("n_probe_groups") > 0, F.lit("content_neutral"))
        .otherwise(F.lit("insufficient_evidence"))
        .alias("verdict"),
    )


def strip_params(url_col, params: list[str]):
    """Column: ``url_col`` with every pair whose name is in
    ``params`` removed and the survivors sorted (canonical stripped
    form). URLs without a query pass through with their path intact;
    a URL whose every pair is stripped loses the '?' entirely.
    Pure projection."""
    if not params:
        raise ValueError("strip_params: empty param list")
    base = F.split_part(url_col, F.lit("?"), F.lit(1))
    query = _query_of(url_col)
    has_q = url_col.contains("?") & (F.length(query) > 0)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: ~F.split_part(p, F.lit("="), F.lit(1)).isin(*params),
        )
    )
    return (
        F.when(~has_q, url_col)
        .when(F.array_size(kept) == 0, base)
        .otherwise(F.concat(base, F.lit("?"), F.array_join(kept, "&")))
    )


def param_strip_savings(
    df: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    malformed: str = "error",
) -> DataFrame:
    """One-row frontier-reduction report from learned verdicts:
    (n_urls_raw, n_neutral_params, n_canonical_before,
    n_canonical_after, n_saved).

    ``before`` counts distinct *sorted-param* canonical forms (so
    param-order variants don't inflate the savings claim); ``after``
    strips the learned content-neutral params as well. The verdict
    table is tiny -> broadcast join, one extra shuffle-free stage on
    top of :func:`param_significance`'s plan.
    """
    verdicts = param_significance(df, url_col, digest_col, malformed)
    neutral = verdicts.filter(F.col("verdict") == "content_neutral").select(
        "param"
    )
    px = _exploded_pairs(df, url_col, digest_col, malformed)
    marked = px.join(
        F.broadcast(neutral.withColumn("neutral", F.lit(True))),
        "param",
        "left",
    ).select(
        "url",
        F.concat(F.col("param"), F.lit("="), F.col("value")).alias("pair"),
        F.coalesce(F.col("neutral"), F.lit(False)).alias("neutral"),
    )
    per_url = marked.groupBy("url").agg(
        F.array_join(
            F.array_sort(F.collect_list("pair")), "&"
        ).alias("all_sorted"),
        F.array_join(
            F.array_sort(
                F.collect_list(F.when(~F.col("neutral"), F.col("pair")))
            ),
            "&",
        ).alias("kept_sorted"),
    )
    base = F.split_part(F.col("url"), F.lit("?"), F.lit(1))
    canon = per_url.select(
        F.concat(base, F.lit("?"), F.col("all_sorted")).alias("before_url"),
        F.when(F.col("kept_sorted") == "", base)
        .otherwise(F.concat(base, F.lit("?"), F.col("kept_sorted")))
        .alias("after_url"),
    )
    return canon.agg(
        F.count("*").alias("n_urls_raw"),
        F.countDistinct("before_url").alias("n_canonical_before"),
        F.countDistinct("after_url").alias("n_canonical_after"),
    ).join(
        neutral.agg(F.count("*").alias("n_neutral_params"))
    ).select(
        "n_urls_raw",
        "n_neutral_params",
        "n_canonical_before",
        "n_canonical_after",
        (F.col("n_canonical_before") - F.col("n_canonical_after")).alias(
            "n_saved"
        ),
    )


# --------------------------------------------------------------------------
# DuckDB twins
# --------------------------------------------------------------------------


# query = everything after the FIRST '?' (strpos, not split_part — see
# module docstring); both engines run the same extraction rule
_Q_SQL = "substr(url, strpos(url, '?') + 1)"

# DuckDB twin of _well_formed: every pair matches _PAIR_OK and no
# param name repeats
_WF_SQL = (
    f"length(list_filter(pairs, p -> NOT regexp_matches(p, '{_PAIR_OK}'))) = 0"
    " AND length(pairs) = length(list_distinct("
    "list_transform(pairs, p -> split_part(p, '=', 1))))"
)


def _exploded_pairs_sql(
    from_sql: str, url_expr: str, digest_expr: str, malformed: str = "error"
) -> str:
    """CTE body producing (url, digest, param, value, residual) —
    the twin of :func:`_exploded_pairs` (in 'error' mode the guards
    live Spark-side; 'skip' emits the same well-formedness filter)."""
    _checked_mode(malformed)
    skip = f"WHERE {_WF_SQL}" if malformed == "skip" else ""
    return f"""
    WITH one0 AS (
      SELECT url, MIN(digest) AS digest,
             split_part(url, '?', 1) AS base,
             string_split({_Q_SQL}, '&') AS pairs
      FROM (SELECT {url_expr} AS url, {digest_expr} AS digest FROM {from_sql})
      WHERE url IS NOT NULL AND contains(url, '?')
        AND length({_Q_SQL}) > 0
      GROUP BY url
    ),
    one AS (SELECT * FROM one0 {skip}),
    px AS (
      SELECT url, digest, base, pairs, unnest(pairs) AS pair FROM one
    )
    SELECT url, digest,
           split_part(pair, '=', 1) AS param,
           split_part(pair, '=', 2) AS value,
           base || '?' || array_to_string(
             list_sort(list_filter(pairs, x -> x <> pair)), '&'
           ) AS residual
    FROM px
    """


def malformed_url_report_sql(from_sql: str, url_expr: str = "url") -> str:
    """DuckDB twin of :func:`malformed_url_report`."""
    return f"""
    WITH mu AS (
      SELECT DISTINCT url FROM (SELECT {url_expr} AS url FROM {from_sql})
      WHERE url IS NOT NULL AND contains(url, '?')
        AND length({_Q_SQL}) > 0
    ),
    mp AS (SELECT string_split({_Q_SQL}, '&') AS pairs FROM mu)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_urls_with_query,
           CAST(COALESCE(SUM(CASE WHEN {_WF_SQL} THEN 0 ELSE 1 END), 0)
                AS BIGINT) AS n_malformed
    FROM mp
    """


def param_significance_sql(
    from_sql: str,
    url_expr: str = "url",
    digest_expr: str = "digest",
    malformed: str = "error",
) -> str:
    """DuckDB twin of :func:`param_significance`."""
    return f"""
    WITH flat AS ({_exploded_pairs_sql(from_sql, url_expr, digest_expr, malformed)}),
    grp AS (
      SELECT param, residual,
             COUNT(DISTINCT value)  AS n_vals,
             COUNT(DISTINCT digest) AS n_digests,
             COUNT(DISTINCT url)    AS n_urls
      FROM flat GROUP BY param, residual
    )
    SELECT param,
           SUM(n_urls) AS n_urls,
           COUNT(*) AS n_groups,
           SUM(CASE WHEN n_vals >= 2 THEN 1 ELSE 0 END) AS n_probe_groups,
           SUM(CASE WHEN n_vals >= 2 AND n_digests >= 2 THEN 1 ELSE 0 END)
             AS n_varying_groups,
           CASE
             WHEN SUM(CASE WHEN n_vals >= 2 AND n_digests >= 2 THEN 1 ELSE 0 END) > 0
               THEN 'significant'
             WHEN SUM(CASE WHEN n_vals >= 2 THEN 1 ELSE 0 END) > 0
               THEN 'content_neutral'
             ELSE 'insufficient_evidence'
           END AS verdict
    FROM grp GROUP BY param
    """


def param_strip_savings_sql(
    from_sql: str,
    url_expr: str = "url",
    digest_expr: str = "digest",
    malformed: str = "error",
) -> str:
    """DuckDB twin of :func:`param_strip_savings`."""
    return f"""
    WITH flat AS ({_exploded_pairs_sql(from_sql, url_expr, digest_expr, malformed)}),
    grp AS (
      SELECT param, residual,
             COUNT(DISTINCT value)  AS n_vals,
             COUNT(DISTINCT digest) AS n_digests
      FROM flat GROUP BY param, residual
    ),
    verdicts AS (
      SELECT param,
             CASE
               WHEN SUM(CASE WHEN n_vals >= 2 AND n_digests >= 2 THEN 1 ELSE 0 END) > 0
                 THEN 'significant'
               WHEN SUM(CASE WHEN n_vals >= 2 THEN 1 ELSE 0 END) > 0
                 THEN 'content_neutral'
               ELSE 'insufficient_evidence'
             END AS verdict
      FROM grp GROUP BY param
    ),
    neutral AS (SELECT param FROM verdicts WHERE verdict = 'content_neutral'),
    marked AS (
      SELECT f.url, f.param || '=' || f.value AS pair,
             n.param IS NOT NULL AS neutral
      FROM flat f LEFT JOIN neutral n ON f.param = n.param
    ),
    per_url AS (
      SELECT url,
             array_to_string(list_sort(list(pair)), '&') AS all_sorted,
             coalesce(array_to_string(
               list_sort(list(pair) FILTER (WHERE NOT neutral)), '&'
             ), '') AS kept_sorted
      FROM marked GROUP BY url
    ),
    canon AS (
      SELECT split_part(url, '?', 1) || '?' || all_sorted AS before_url,
             CASE WHEN kept_sorted = '' THEN split_part(url, '?', 1)
                  ELSE split_part(url, '?', 1) || '?' || kept_sorted
             END AS after_url
      FROM per_url
    )
    SELECT (SELECT COUNT(*) FROM canon) AS n_urls_raw,
           (SELECT COUNT(*) FROM neutral) AS n_neutral_params,
           COUNT(DISTINCT before_url) AS n_canonical_before,
           COUNT(DISTINCT after_url)  AS n_canonical_after,
           COUNT(DISTINCT before_url) - COUNT(DISTINCT after_url) AS n_saved
    FROM canon
    """
