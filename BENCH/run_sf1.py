#!/usr/bin/env python3
"""One-tier-up headline leg (VERDICT r3 item #5): the most expensive
DRIVER queries, run through ``__spark_entry__.queries()`` itself,
against an sf1-shaped table set (10x the sf0.1 documents/embeddings
row counts, same schema) — sf0.1 caught what sf0.01 hid; this tier
does the same for sf0.1.

Unlike BENCH/run_dedup_scale.py (which measures the raw operators on
the synthetic corpus), this leg exercises the exact driver query
functions with their own parameter choices, so a parameterization that
only breaks one tier above the graded scale (band-space saturation, a
collected driver-side structure, a plan flip) shows up here first.

The sf1 tables are deterministic synthetics (sources/synth_corpus.py)
projected to the sf schema: documents(doc_id, text, lang, source,
n_chars), embeddings(vec_id, embedding float[64], label) — no external
data. Both tiers run in ONE session, sf0.1 first, so per-query growth
is measured under identical JVM/codegen warmth.

Besides timing, this leg re-runs the DRIVER's DuckDB oracle comparison
at the sf1 tier (VERDICT r4 #5): each sf tier has caught divergences
the smaller one hid (truncation, overflow, band-occupancy effects), and
the graded gate stops at sf0.1 — so the 10x tier's rows/schema/hash
CHECK lives here, using the same canonicalizer as the driver
(tools/check_oracle.table_hash).

Usage:  SPARK_GRAFT_CPUS=32 python BENCH/run_sf1.py
Env:    SF1_DIR (default /tmp/sf1_tables) generated-table cache
Writes BENCH/SF1.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from tools.check_oracle import table_hash  # noqa: E402
from webscrape_neko_jirushi_spark.session import get_spark  # noqa: E402
from webscrape_neko_jirushi_spark.sources.synth_corpus import (  # noqa: E402
    synth_documents,
    synth_embeddings,
)

SF01 = "/root/testdata/sf0.1"
N_DOCS, N_VECS = 50_000, 20_000  # 10x the sf0.1 row counts
QUERIES = [
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_dups",
    "embedding_near_dup_pairs",
    "near_dup_clusters",
    # round-5 additions: the substring/k-gram rollup is the new heavy
    # query; the other three are cheap but rounding/window-sensitive,
    # so their hash parity earns the 10x-tier check too
    "substr_dup_ratio",
    "pq_adc_topk",
    "stratified_sample",
    "weighted_interleave_mix",
    "ivf_train_lloyd",
    "pack_sequences",
    "repetition_stats",
    "gopher_admission",
    "pii_scrub_stats",
    "benchmark_contamination",
    "token_budget_mix",
    # round-5 second-arc additions: the shuffle permutation and the
    # version diff are cheap and hash-sensitive (60-bit keys, md5
    # fingerprints) — worth the 10x tier. semantic_dedup_flags is
    # deliberately NOT here: with the 8 seed centroids its within-cell
    # pair space is ~n^2/8 and the DuckDB side of the oracle would
    # dominate the leg at 26k vectors (the operator's sf1-tier growth
    # evidence is DEDUP_SCALE's semantic_dedup_cscaled leg, where C
    # scales with n as the operator prescribes).
    "corpus_shuffle_seq",
    "corpus_version_diff",
    # round-5 third-arc additions: the LM trains on (and scores) the
    # full corpus, so band/vocab saturation effects would first show
    # one tier up; the classifier twin unrolls 2 GD rounds in DuckDB
    # over the same 10x feature rows. (link_authority_rank is NOT
    # here: it reads orders/lineitem, which the synthetic sf1 table
    # set does not include — its 10x evidence is DEDUP_SCALE's
    # pagerank_i3_deg4 leg.)
    "lm_perplexity",
    "ccnet_quality_buckets",
    "quality_classifier_weights",
    "quality_classifier_confusion",
    # round-5 fourth-arc: the admission cascade + Wilson bound at 10x
    # rows (single 'synth' source — the rate math, not the grouping,
    # is what the tier checks). bm25_relevance is NOT here: its
    # driver-query terms come from the sf vocabulary, which the synth
    # corpus doesn't share (all-zero scores would check nothing) —
    # its 10x evidence is DEDUP_SCALE's bm25_probe_t4 leg; the other
    # new ops (anchors/traps/revisit) read orders/lineitem/events,
    # absent from the sf1 table set — DEDUP_SCALE legs cover them.
    "domain_quality_rollup",
    # round-5 fifth-arc additions: all read only documents. The
    # containment self-join is the new heavy query at this tier; the
    # temperature fold and the shard member-list md5 are exact-scalar
    # checks whose failure mode (float order / int division) is
    # precisely what a 10x total would expose. line_dedup_docs and
    # boilerplate_* read orders/lineitem (absent here) — their 10x
    # evidence is DEDUP_SCALE's line_dedup_l8 and the bp host shape.
    "containment_pairs",
    "shard_assignment",
    "encoding_quality_stats",
    "temperature_mixture_plan",
    # round-5 sixth-arc additions: all read only documents. The
    # canonical pair rides the same recursive-CTE cluster oracle as
    # near_dup_clusters (the heavy side at 10x); html/warc/dsir are
    # map-side but hash-pinned (regex chains, framing md5s, 6-dp
    # folds) — exactly the failure modes a 10x corpus would surface.
    "canonical_selection",
    "canonical_kept_corpus",
    "html_extraction",
    "dsir_log_ratios",
    "dsir_selection",
    "warc_roundtrip",
    # X51 reads only embeddings (26k vecs at this tier): the Gram
    # reduce's float-sum magnitude and the bit-exact fold both get
    # their 10x check. (key_skew/hot_keys/ip_range read events —
    # absent from the sf1 table set; range_join's 10x evidence is
    # DEDUP_SCALE's range_join_b24 leg.)
    "embedding_gram",
    "pca_projection",
    # X54 reads only documents; the byte-exact corpus_md5 pin is the
    # strongest 10x check in the file (any stage divergence breaks it)
    "curation_pipeline_e2e",
    # X60/X61 read only documents: the postings explode and the
    # windowed pair join are the new heavy queries at this tier (the
    # pair join is the one whose plan would flip quadratic if the
    # window trick regressed to a distance filter). phrase_search is
    # NOT here: its literal trigram comes from the sf vocabulary,
    # which the synth corpus doesn't share (0 rows would check
    # nothing — the bm25_relevance rule); its 10x evidence is
    # DEDUP_SCALE's phrase_probe_inv leg. The X58/X59/X62 driver rows
    # read orders/customer (absent here) — their 10x evidence is
    # DEDUP_SCALE's merge/scd2/redirect legs.
    "inverted_term_stats",
    "pmi_collocations",
    # X68/X70 read only documents: the HDR bucket law and the window
    # rank both get their 10x check (bucket saturation and rank-hash
    # ties are exactly the one-tier-up failure modes). The X58/59/
    # 62-67/71 driver rows read orders/customer/lineitem/events
    # (absent here) — their 10x evidence is DEDUP_SCALE's merge/scd2/
    # redirect/fuzzy legs.
    "equi_depth_histogram",
    "group_sample_docs",
]


def _sf1_tables(spark, root: Path) -> str:
    docs = root / "documents.parquet"
    vecs = root / "embeddings.parquet"
    if not (docs / "_SUCCESS").exists():
        d = synth_documents(spark, N_DOCS, partitions=32)
        d.select(
            "doc_id",
            "text",
            F.lit("en").alias("lang"),
            F.lit("synth").alias("source"),
            F.length("text").alias("n_chars"),
        ).write.mode("overwrite").parquet(str(docs))
    if not (vecs / "_SUCCESS").exists():
        e = synth_embeddings(spark, N_VECS, dim=64, partitions=16)
        e.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("float")).alias("embedding"),
            (F.col("vec_id") % 10).cast("int").alias("label"),
        ).write.mode("overwrite").parquet(str(vecs))
    return str(root)


def main() -> None:
    root = Path(os.environ.get("SF1_DIR", "/tmp/sf1_tables"))
    root.mkdir(parents=True, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("sf1-leg", shuffle_partitions=64)
    qs = entry.queries()
    sf1_dir = _sf1_tables(spark, root)

    # untimed warmup (sf0.01) for JVM/codegen/parquet-reader state
    for name in QUERIES:
        qs[name](spark, "/root/testdata/sf0.01").count()

    results: dict[str, dict[str, dict[str, float]]] = {"sf0.1": {}, "sf1": {}}
    for tier, sf_dir in (("sf0.1", SF01), ("sf1", sf1_dir)):
        for name in QUERIES:
            t0 = time.monotonic()
            rows = qs[name](spark, sf_dir).count()
            dt = time.monotonic() - t0
            results[tier][name] = {"sec": round(dt, 3), "rows": rows}
            print(f"[{tier}] {name}: {dt:.2f}s, {rows} rows", file=sys.stderr)

    # -- sf1 ORACLE correctness (rows + schema + value hash, the
    # driver's own canonicalizer) over the sf1 tables -------------------
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "embeddings"):  # the only sf1 tables; the
        # six heavy queries (and their oracle SQL) touch nothing else.
        # (sf1 tables are parquet DIRECTORIES, so glob the part files)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf1_dir}/{t}.parquet/*.parquet'"
        )
    oracles = entry.oracle_sql()
    checks: dict[str, str] = {}
    for name in QUERIES:
        sdf = qs[name](spark, sf1_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        if sorted(scols) != sorted(dcols):
            checks[name] = f"FAIL cols {sorted(scols)} vs {sorted(dcols)}"
            continue
        sn, sh = table_hash(srows, scols)
        dn, dh = table_hash(drows, dcols)
        checks[name] = (
            "ok" if (sn, sh) == (dn, dh) else f"FAIL rows {sn}/{dn} hash {sh[:8]}/{dh[:8]}"
        )
        print(f"[sf1-oracle] {name}: {checks[name]}", file=sys.stderr)

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    lines = [
        "# BENCH/SF1.md — one-tier-up headline leg (10x sf0.1)",
        "",
        f"Generated {stamp} by `SPARK_GRAFT_CPUS={cpus} python BENCH/run_sf1.py`",
        f"(local[{cpus}], 64 shuffle partitions, one session, sf0.01 warmup).",
        "",
        f"sf1 tables: deterministic synthetics at 10x sf0.1 row counts —",
        f"documents {N_DOCS:,} rows (sf0.1: 5,000), embeddings {N_VECS:,}",
        "rows / dim 64 (sf0.1: 2,000) — run through the DRIVER query",
        "functions (`__spark_entry__.queries()`), not raw operators, so",
        "driver-side parameter choices are measured at the bigger tier.",
        "",
        "| query | sf0.1 sec (rows) | sf1 sec (rows) | growth | flag (>2x size ratio = 20x) |",
        "|---|---|---|---|---|",
    ]
    growths: dict[str, float] = {}
    flagged = []
    for name in QUERIES:
        a, b = results["sf0.1"][name], results["sf1"][name]
        g = b["sec"] / max(a["sec"], 1e-9)
        growths[name] = round(g, 2)
        flag = "**EXCEEDS**" if g > 20 else "ok"
        if g > 20:
            flagged.append(name)
        lines.append(
            f"| {name} | {a['sec']} ({a['rows']:,}) | {b['sec']} ({b['rows']:,}) "
            f"| {g:.1f}x | {flag} |"
        )
    lines += [
        "",
        "Growth <= the 10x size ratio is linear scaling; the gate is 2x",
        "the size ratio (20x) — anything above it indicates a plan or",
        "parameterization that degrades one tier above the graded scale.",
        "",
        "## sf1 oracle CHECK (rows + schema + value hash vs DuckDB)",
        "",
        "The driver's correctness gate stops at sf0.1; this table is the",
        "same comparison (identical canonicalizer, `tools/check_oracle.",
        "table_hash`) run at the 10x tier — each tier has historically",
        "caught divergences the smaller one hid.",
        "",
        "| query | sf1 check |",
        "|---|---|",
        *[f"| {name} | {checks[name]} |" for name in QUERIES],
        "",
        "Honesty caveat: the sf1 synthetics do NOT replicate the sf0.1",
        "text distribution (the driver-generated sf tables carry heavy",
        "TPC-H-comment self-similarity — visible in the simhash pair",
        "counts), so the growth column is a PLAN-ROBUSTNESS indicator at",
        "10x the row count, not a strict same-distribution throughput",
        "ratio; the same-distribution growth measurement is",
        "BENCH/DEDUP_SCALE.md (1x/10x/100x on one generator).",
        "",
    ]
    (REPO / "BENCH" / "SF1.md").write_text("\n".join(lines))
    print(
        json.dumps(
            {
                "metric": "sf1_headline_growth",
                "size_ratio": 10,
                "growth": growths,
                "flagged": flagged,
                "oracle_checks": checks,
                "results": results,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
