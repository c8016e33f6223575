"""Link-graph authority scoring (PageRank) — the frontier-priority
signal a web-scale crawler feeds back into scheduling: pages (hosts)
that many crawled pages link to outrank pages found once, so the
priority queue (``crawl/politeness.frontier_order``'s (depth,
discovery-time, host-budget) key) can weight host budgets by measured
authority instead of treating every discovered URL equally. The
reference walks listing pages in fixed order (comprehensive_scraper.py
pagination loop) and has no ranking; first-class per the build brief's
crawl tier.

PageRank (Page et al. 1998) with uniform teleport and dangling-mass
redistribution:

    r'(v) = (1-d)/N + d * ( sum_{u->v} r(u)/deg(u)  +  DM/N )

where DM is the total rank sitting on dangling nodes (no out-edges).

Scale shape — each iteration is ONE equi-join + ONE hash aggregate:

- the edge list is pre-joined with out-degrees ONCE and
  localCheckpointed (the ``connected_components`` edge-list-first
  discipline: every iteration re-reads the same materialized edges
  instead of re-executing the upstream DAG per round);
- per round: join current ranks on ``src`` (ranks are one row per
  node — the SMALL side; Catalyst broadcasts it under the threshold,
  AQE handles the hot-dst skew above), ``groupBy(dst).sum``, then a
  map-side rank update against two scalars (N, DM);
- dangling mass is a one-scalar aggregate over the checkpointed ranks
  (the Lloyd-round pattern: collecting a scalar per round is the
  convergence price, not a driver-side loop over data);
- ranks are localCheckpointed per round, so lineage stays flat at any
  iteration count.

Determinism: all arithmetic is IEEE double with the operation order
mirrored by the DuckDB twin (``pagerank_sql_ctes``); per-node
contribution sums are order-nondeterministic at ~1e-16 relative, so
comparisons happen on ROUND(rank * N, 6) — the normalized rank keeps
6-decimal rounding meaningful at any N (raw ranks are O(1/N)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iters: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    dedup_edges: bool = True,
    n_nodes: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list. Returns
    ``(node, rank, rank_norm)`` — one row per node (source or
    destination), ``rank_norm = rank * N`` rounded to 6 decimals
    (1.0 = the uniform share). ``n_nodes`` is the lazy-hint
    discipline: pass the known node count and construction skips the
    sizing count job (the node set is still built for the update
    join). NULL endpoints are rejected loudly — a NULL would silently
    drop edges in the equi-joins."""
    if n_iters < 1:
        raise ValueError(f"pagerank: n_iters must be >= 1, got {n_iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"pagerank: damping must be in (0,1), got {damping}")

    # NULL endpoints raise IN-PLAN, fused into the columns BEFORE the
    # out_deg equi-join (a NULL src never equi-matches, so a post-join
    # check would look at a table the offending edges have already
    # silently vanished from) — and evaluated during the ONE eager
    # checkpoint scan, not a separate eager count job that would
    # re-execute an expensive upstream DAG a second time
    def _req(col_name: str):
        return F.coalesce(
            F.when(
                F.col(col_name).isNull(),
                F.raise_error(
                    F.lit("pagerank: NULL src/dst endpoint in edge list")
                ),
            ),
            F.col(col_name),
        )

    e = edges.select(
        _req(src_col).alias("src"), _req(dst_col).alias("dst")
    )
    if dedup_edges:
        e = e.dropDuplicates(["src", "dst"])
    # one materialization of the (edge x out-degree) table: every
    # iteration joins against THIS, never the upstream DAG again
    out_deg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    ew = e.join(out_deg, "src").localCheckpoint(eager=True)

    nodes = (
        ew.select(F.col("src").alias("node"))
        .union(ew.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = int(n_nodes) if n_nodes is not None else nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    # degrees of nodes-with-out-edges, re-derived from the small
    # checkpointed table (for the dangling anti-join)
    srcs = ew.select("src").distinct()

    d = float(damping)
    nf = float(n)
    # every scalar is derived by the SAME IEEE ops as the SQL twin:
    # divisions by n, never multiplication by a precomputed 1/n (the
    # two round differently in the last ulp)
    teleport = (1.0 - d) / nf

    ranks = nodes.select("node", F.lit(1.0 / nf).alias("rank")).localCheckpoint(
        eager=True
    )
    for _ in range(n_iters):
        dm = (
            ranks.join(srcs, ranks["node"] == srcs["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .first()["m"]
        )
        contribs = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.lit(float(dm) / nf)
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "node", "rank", F.round(F.col("rank") * F.lit(float(n)), 6).alias("rank_norm")
    )


def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Resolve HTTP-redirect chains to their final targets (SURVEY
    §2.11 X59) — the canonical-URL question every crawler faces after
    the fetch tier records ``301/302 src -> dst`` pairs: the frontier
    must enqueue the FINAL url (or drop the loop), and the URL-seen
    set must be keyed by it, or every hop of a chain is re-crawled as
    a distinct page. The reference follows redirects implicitly inside
    ``requests`` one page at a time (comprehensive_scraper.py fetch
    loop); at a 10^10-URL frontier, chain resolution is a BATCH graph
    problem over the recorded redirect table.

    ``edges`` must be a FUNCTIONAL mapping (one outgoing redirect per
    ``src`` — enforced loudly; duplicate-target rows are deduped
    first). Returns one row per distinct ``src``:

    - ``status='ok'``: the walk reached a terminal node (no outgoing
      redirect) within ``max_hops`` — ``final`` is that node, ``hops``
      the EXACT chain length;
    - ``status='unresolved'``: the walk exceeded the hop budget — a
      redirect LOOP or an over-long chain, indistinguishable under a
      hop cap (HTTP clients cap at ~20 for the same reason); ``final``
      and ``hops`` are NULL so both engines agree bit-for-bit without
      exposing algorithm-dependent partial distances.

    Scale shape — POINTER DOUBLING, not per-hop walking: the state
    table maps every src to a node ``2^r`` hops away (or its terminal,
    with the exact distance once reached); each round composes the
    mapping with itself — ONE self equi-join — so a length-L chain
    resolves in ``ceil(log2(L))`` rounds instead of L sequential
    joins. The DuckDB oracle twin walks per-hop with a bounded
    recursive CTE; both land on identical (final, hops) because
    doubling composes exact distances. State is localCheckpointed per
    round (flat lineage, the ``connected_components`` discipline) and
    the loop exits early on an all-done scalar probe (the Lloyd-round
    pattern: one scalar per round, never a driver-side row loop)."""
    if max_hops < 1:
        raise ValueError(f"resolve_redirects: max_hops must be >= 1, got {max_hops}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    if e.filter(F.col("src").isNull() | F.col("dst").isNull()).limit(1).count():
        raise ValueError("resolve_redirects: NULL src/dst endpoint in edge list")
    if (
        e.groupBy("src")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .limit(1)
        .count()
    ):
        raise ValueError(
            "resolve_redirects: edges are not a functional mapping "
            "(some src has >1 outgoing redirect) — dedupe upstream "
            "(e.g. keep the latest fetch's record)"
        )

    srcs = e.select(F.col("src").alias("s2")).distinct()
    # state: src -> (cur at exact distance hops; done once cur is terminal)
    f = (
        e.join(srcs, e["dst"] == srcs["s2"], "left")
        .select(
            "src",
            F.col("dst").alias("cur"),
            F.lit(1).cast("int").alias("hops"),
            F.col("s2").isNull().alias("done"),
        )
        .localCheckpoint(eager=True)
    )
    rounds = max(1, (max_hops - 1).bit_length() + 1)  # 2^rounds >= 2*max_hops
    for _ in range(rounds):
        if f.filter(~F.col("done")).limit(1).count() == 0:
            break
        j = f.select(
            F.col("src").alias("j_src"),
            F.col("cur").alias("j_cur"),
            F.col("hops").alias("j_hops"),
            F.col("done").alias("j_done"),
        )
        stepped = (
            f.filter(~F.col("done"))
            .join(j, F.col("cur") == F.col("j_src"))
            .select(
                "src",
                F.col("j_cur").alias("cur"),
                (F.col("hops") + F.col("j_hops")).alias("hops"),
                F.col("j_done").alias("done"),
            )
        )
        f = f.filter(F.col("done")).unionByName(stepped).localCheckpoint(eager=True)

    ok = F.col("done") & (F.col("hops") <= F.lit(max_hops))
    return f.select(
        "src",
        F.when(ok, F.col("cur")).alias("final"),
        F.when(ok, F.col("hops")).alias("hops"),
        F.when(ok, F.lit("ok")).otherwise(F.lit("unresolved")).alias("status"),
    )


def resolve_redirects_sql_ctes(edges_sql: str, max_hops: int = 20) -> str:
    """DuckDB twin of :func:`resolve_redirects`: bounded recursive-CTE
    walk over ``edges_sql`` (columns ``src, dst``, functional, already
    deduplicated). Ends in CTE ``redir(src, final, hops, status)``.
    The walk explores exactly the paths of length <= max_hops, so
    'ok' iff the terminal is within the budget — the same boundary
    the doubling side enforces with ``hops <= max_hops``."""
    return f"""e AS ({edges_sql}),
    walk(src, cur, hops) AS (
      SELECT src, dst, 1 FROM e
      UNION ALL
      SELECT w.src, e.dst, w.hops + 1
      FROM walk w JOIN e ON e.src = w.cur
      WHERE w.hops < {int(max_hops)}
    ),
    term AS (
      SELECT w.src, w.cur, w.hops
      FROM walk w LEFT JOIN e t ON t.src = w.cur
      WHERE t.src IS NULL
    ),
    redir AS (
      SELECT s.src,
             t.cur AS final,
             CAST(t.hops AS INTEGER) AS hops,
             CASE WHEN t.src IS NULL THEN 'unresolved' ELSE 'ok' END AS status
      FROM (SELECT DISTINCT src FROM e) s
      LEFT JOIN term t ON t.src = s.src
    )"""


def pagerank_sql_ctes(
    edges_sql: str, n_iters: int = 2, damping: float = 0.85
) -> str:
    """DuckDB twin: unrolled fixed-iteration PageRank over
    ``edges_sql`` (a relation with columns ``src, dst``, already
    deduplicated). Ends in CTE ``pr(node, rank, rank_norm)``. Every
    literal is CAST AS DOUBLE and the update expression mirrors
    ``pagerank``'s operation order, so doubles stay bit-comparable
    (modulo sum order, absorbed by the rank_norm rounding)."""
    d = f"CAST({damping} AS DOUBLE)"
    ctes = [
        f"e AS ({edges_sql})",
        "pr_nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pr_nodes)",
        "outd AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM e GROUP BY src)",
        "r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM pr_nodes, nn)",
    ]
    prev = "r0"
    for i in range(n_iters):
        ctes.append(
            f"""dm{i} AS (
              SELECT COALESCE(SUM(r.rank), CAST(0 AS DOUBLE)) AS m
              FROM {prev} r LEFT JOIN outd o ON o.src = r.node
              WHERE o.src IS NULL
            )"""
        )
        ctes.append(
            f"""c{i} AS (
              SELECT e.dst, SUM(r.rank / o.deg) AS contrib
              FROM e JOIN {prev} r ON r.node = e.src
                     JOIN outd o ON o.src = e.src
              GROUP BY e.dst
            )"""
        )
        ctes.append(
            f"""r{i + 1} AS (
              SELECT n.node,
                     (CAST(1 AS DOUBLE) - {d}) / nn.n
                     + {d} * (COALESCE(c.contrib, CAST(0 AS DOUBLE))
                              + dm{i}.m / nn.n) AS rank
              FROM pr_nodes n
              CROSS JOIN nn CROSS JOIN dm{i}
              LEFT JOIN c{i} c ON c.dst = n.node
            )"""
        )
        prev = f"r{i + 1}"
    ctes.append(
        f"""pr AS (
          SELECT node, rank, ROUND(rank * nn.n, 6) AS rank_norm
          FROM {prev}, nn
        )"""
    )
    return ",\n".join(ctes)
