"""Curation operators (text/curation.py): nested/deterministic
hash-stratified sampling with its DuckDB twin, and stride-scheduled
weighted interleaving — exact prefix-rate property, bucketed-path
parity, and the cross-engine twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.sources.synth_corpus import synth_documents
from webscrape_neko_jirushi_spark.text import curation


@pytest.fixture(scope="module")
def corpus(spark):
    docs = (
        synth_documents(spark, 2000, dup_frac=0.0)
        .withColumn(
            "stratum",
            F.element_at(
                F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
            ),
        )
        .cache()
    )
    yield docs
    docs.unpersist()


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_stratified_sample_nested_deterministic_and_spec_complete(spark, corpus):
    f10 = {"a": 0.1, "b": 0.1, "c": 0.1}
    f30 = {"a": 0.3, "b": 0.3, "c": 0.3}
    s10 = _ids(curation.hash_stratified_sample(corpus, "stratum", f10, "doc_id"))
    s30 = _ids(curation.hash_stratified_sample(corpus, "stratum", f30, "doc_id"))
    assert s10 and s10 < s30  # nested: scaling up only ADDS rows

    # deterministic in the key, not the partitioning
    again = _ids(
        curation.hash_stratified_sample(
            corpus.repartition(7), "stratum", f10, "doc_id"
        )
    )
    assert again == s10

    # a different salt draws an independent split (not nested)
    other = _ids(
        curation.hash_stratified_sample(corpus, "stratum", f30, "doc_id", salt="eval")
    )
    assert other != s30

    # the dict IS the mixture spec: omitted stratum == 0.0 == dropped
    only_a = curation.hash_stratified_sample(corpus, "stratum", {"a": 1.0}, "doc_id")
    rows = only_a.select("stratum").distinct().collect()
    assert [r["stratum"] for r in rows] == ["a"]
    assert only_a.count() == corpus.filter(F.col("stratum") == "a").count()
    assert (
        curation.hash_stratified_sample(corpus, "stratum", {"a": 0.0}, "doc_id")
        .count()
        == 0
    )
    # the empty dict is the legal drop-everything spec on BOTH engines
    # (the twin must emit FALSE, not a WHEN-less CASE DuckDB rejects)
    import duckdb

    assert (
        curation.hash_stratified_sample(corpus, "stratum", {}, "doc_id").count()
        == 0
    )
    con = duckdb.connect()
    con.register("c", corpus.toPandas())
    n = con.execute(
        "SELECT COUNT(*) FROM c WHERE "
        + curation.hash_stratified_sample_sql(
            "stratum", {}, "CAST(doc_id AS VARCHAR)"
        )
    ).fetchone()[0]
    assert n == 0


def test_stratified_sample_rates_track_fractions(spark, corpus):
    frac = {"a": 0.25, "b": 0.5, "c": 0.05}
    got = {
        r["stratum"]: r["n"]
        for r in curation.hash_stratified_sample(corpus, "stratum", frac, "doc_id")
        .groupBy("stratum")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    totals = {
        r["stratum"]: r["n"]
        for r in corpus.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    for s, f in frac.items():
        rate = got.get(s, 0) / totals[s]
        assert abs(rate - f) < 0.06, (s, rate, f)


def test_stratified_sample_matches_duckdb_twin(spark, corpus):
    import duckdb

    frac = {"a": 0.25, "b": 0.5}  # c deliberately unlisted
    got = _ids(curation.hash_stratified_sample(corpus, "stratum", frac, "doc_id"))

    rows = corpus.select("doc_id", "stratum").collect()
    vals = ", ".join(f"({r['doc_id']}, '{r['stratum']}')" for r in rows)
    pred = curation.hash_stratified_sample_sql(
        "stratum", frac, "CAST(doc_id AS VARCHAR)"
    )
    want = {
        int(v)
        for (v,) in duckdb.connect()
        .execute(
            f"SELECT doc_id FROM (VALUES {vals}) t(doc_id, stratum) WHERE {pred}"
        )
        .fetchall()
    }
    assert got == want


def test_weighted_interleave_exact_stride_rates(spark, corpus):
    a = corpus.filter(F.col("stratum") == "a")
    b = corpus.filter(F.col("stratum") == "b")
    na, nb = a.count(), b.count()
    out = curation.weighted_interleave(
        {"A": (a, 3.0), "B": (b, 1.0)},
        "doc_id",
        n_rows={"A": na, "B": nb},
    )
    assert "source" in out.columns and "mix_key" in out.columns
    assert out.count() == na + nb
    keys = [(r["source"], r["mix_key"]) for r in out.select("source", "mix_key").collect()]

    # any prefix mix_key <= t holds EXACTLY the rows whose rank/w <= t
    # (compute the expectation with the identical float predicate)
    for t in (20.1, 50.7, 150.3):
        for src, w, n in (("A", 3.0, na), ("B", 1.0, nb)):
            want = sum(1 for r in range(1, n + 1) if r / w <= t)
            got = sum(1 for s, k in keys if s == src and k <= t)
            assert got == want, (src, t, got, want)

    # the first 40 rows of the mixed stream are 30 A + 10 B
    head = sorted(keys, key=lambda sk: (sk[1], sk[0]))[:40]
    assert sum(1 for s, _ in head if s == "A") == 30


def test_weighted_interleave_bucketed_path_parity(spark, corpus):
    a = corpus.filter((F.col("stratum") == "a") & (F.col("doc_id") < 600))
    b = corpus.filter((F.col("stratum") == "b") & (F.col("doc_id") < 300))
    srcs = {"A": (a, 2.0), "B": (b, 1.0)}

    def canon(df):
        return sorted(
            (r["source"], r["doc_id"], r["mix_key"])
            for r in df.select("source", "doc_id", "mix_key").collect()
        )

    single = canon(curation.weighted_interleave(srcs, "doc_id", buckets=0))
    bucketed = canon(curation.weighted_interleave(srcs, "doc_id", buckets=4))
    assert single == bucketed


def test_weighted_interleave_matches_duckdb_twin(spark, corpus):
    import duckdb

    a = corpus.filter((F.col("stratum") == "a") & (F.col("doc_id") < 360))
    b = corpus.filter((F.col("stratum") == "b") & (F.col("doc_id") < 240))
    out = curation.weighted_interleave(
        {"A": (a, 2.5), "B": (b, 1.0)}, "doc_id", buckets=0
    )
    got = sorted(
        (r["source"], r["doc_id"], round(r["mix_key"], 9))
        for r in out.select("source", "doc_id", "mix_key").collect()
    )

    con = duckdb.connect()
    h = curation.portable_hash64_sql("CAST(doc_id AS VARCHAR)", salt="mix")
    parts = []
    for name, df, w in (("A", a, 2.5), ("B", b, 1.0)):
        vals = ", ".join(f"({r['doc_id']})" for r in df.select("doc_id").collect())
        parts.append(
            f"SELECT '{name}' AS source, doc_id, "
            f"CAST(ROW_NUMBER() OVER (ORDER BY {h}) AS DOUBLE) / {w!r} AS mix_key "
            f"FROM (VALUES {vals}) t(doc_id)"
        )
    want = sorted(
        (s, int(d), round(float(k), 9))
        for s, d, k in con.execute(" UNION ALL ".join(parts)).fetchall()
    )
    assert got == want


def test_weighted_interleave_rejects_bad_weights(spark, corpus):
    a = corpus.limit(5)
    with pytest.raises(ValueError, match="weight"):
        curation.weighted_interleave({"A": (a, 0.0)}, "doc_id", buckets=0)
    with pytest.raises(ValueError, match="no sources"):
        curation.weighted_interleave({}, "doc_id")


def test_token_budget_sample_exact_nested_deterministic(spark, corpus):
    import duckdb

    from webscrape_neko_jirushi_spark.functions.hashing import (
        portable_hash64_sql,
    )

    docs = corpus.withColumn("n_tok", F.size(F.split(F.trim("text"), r"\s+")))
    small = {"a": 2000, "b": 1000}  # c unlisted -> dropped
    out = curation.token_budget_sample(
        docs, small, "stratum", "n_tok", "doc_id"
    ).cache()

    # budget semantics: tokens-before-last < budget <= tokens-with-last
    # (overshoot at most one doc), and 'c' is gone
    per = {
        r["stratum"]: r["tok"]
        for r in out.groupBy("stratum").agg(F.sum("n_tok").alias("tok")).collect()
    }
    assert set(per) == {"a", "b"}
    # overshoot is exactly one doc: dropping the LAST-kept (max-hash)
    # doc lands strictly under budget; keeping it reaches the budget
    for s, b in small.items():
        kept = out.filter(F.col("stratum") == s).withColumn(
            "_h",
            curation.portable_hash64(F.col("doc_id").cast("string"), salt="budget"),
        )
        last_n = kept.orderBy(F.col("_h").desc()).head()["n_tok"]
        assert per[s] >= b  # never undershoots while docs remain
        assert per[s] - last_n < b  # ...and by at most the last doc

    # nested: raising budgets only APPENDS documents
    bigger = {"a": 4000, "b": 1000}
    more = curation.token_budget_sample(
        docs, bigger, "stratum", "n_tok", "doc_id"
    )
    assert _ids(out) < _ids(more)
    # deterministic in keys, not partitioning
    again = curation.token_budget_sample(
        docs.repartition(11), small, "stratum", "n_tok", "doc_id"
    )
    assert _ids(again) == _ids(out)

    # DuckDB twin: same hash order, same exclusive prefix-sum cut
    rows = docs.select("doc_id", "stratum", "n_tok").collect()
    vals = ", ".join(
        f"({r['doc_id']}, '{r['stratum']}', {r['n_tok']})" for r in rows
    )
    h = portable_hash64_sql("CAST(doc_id AS VARCHAR)", salt="budget")
    want = {
        int(v)
        for (v,) in duckdb.connect().execute(f"""
            SELECT doc_id FROM (
              SELECT doc_id, stratum,
                CAST(SUM(n_tok) OVER (PARTITION BY stratum ORDER BY {h})
                     - n_tok AS BIGINT) AS before
              FROM (VALUES {vals}) t(doc_id, stratum, n_tok)
            )
            WHERE before < CASE stratum WHEN 'a' THEN 2000 WHEN 'b' THEN 1000 END
        """).fetchall()
    }
    assert _ids(out) == want
    out.unpersist()

    with pytest.raises(ValueError, match="negative"):
        curation.token_budget_sample(docs, {"a": -1}, "stratum", "n_tok", "doc_id")


# ===========================================================================
# X70: deterministic per-group fixed-size sample
# ===========================================================================

def test_group_sample_exact_k_and_determinism(spark):
    import duckdb
    import pytest

    from webscrape_neko_jirushi_spark.text.curation import (
        group_sample,
        group_sample_sql,
    )

    rows = [(f"g{i % 4}" if i % 10 else "tiny", i) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id int")
    out = group_sample(df, ["g"], 7, "id")
    counts = {
        r["g"]: r["n"]
        for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 7 for g, n in counts.items() if g != "tiny")
    assert counts["tiny"] == 7 if sum(1 for g, _ in rows if g == "tiny") >= 7 else True
    assert out.filter(F.col("sample_rank") > 7).count() == 0

    # identical sample set across recomputation AND repartitioning
    again = group_sample(df.repartition(13), ["g"], 7, "id")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))

    # engine twin: the same rows with the same ranks
    con = duckdb.connect()
    con.register("rel", df.toPandas())
    want = sorted(
        (a, int(b), int(c))
        for a, b, c in con.execute(
            group_sample_sql("rel", ["g"], 7, "id", cols="g, id")
        ).fetchall()
    )
    got = sorted((r["g"], r["id"], r["sample_rank"]) for r in out.collect())
    assert got == want

    with pytest.raises(ValueError, match="k must be"):
        group_sample(df, ["g"], 0, "id")
