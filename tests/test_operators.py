"""Unit tests for analytics operators (beyond the DuckDB oracle gate):
filter-cascade goldens with planted edge cases (SURVEY.md §5.2 item 5),
dedup family behavior, text analysis, reorganize windows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark import schemas
from webscrape_neko_jirushi_spark.operators import cleaning, dedup, reorganize, similarity
from webscrape_neko_jirushi_spark.text import analysis


def _img(doc_id, idx, filename="image_1.jpg", size=20000, w=500, h=500,
         mode="RGB", alpha=255, top=0.2, warm=0.3, md5="m"):
    return (doc_id, idx * 1000, idx, f"https://h/{filename}", filename, "image/jpeg",
            size, w, h, mode, alpha, top, warm, md5)


IMG_COLS = ("doc_id string, src_key long, image_idx int, url string, filename string,"
            " content_type string, size_bytes long, width int, height int, mode string,"
            " alpha_max int, top_color_ratio double, warm_ratio double, md5 string")


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        _img("cat_1", 1),                                      # clean keeper
        _img("cat_1", 2, size=43),                             # suspicious exact size (AC:72)
        _img("cat_1", 3, size=4999),                           # below 5KB min
        _img("cat_2", 1, filename="site_logo.png"),            # pattern reject
        _img("cat_2", 2, w=99),                                # below min dim
        _img("cat_2", 3, w=10001),                             # above max dim
        _img("cat_3", 1, w=2000, h=150),                       # aspect 13.33 > 10
        _img("cat_3", 2, mode="RGBA", alpha=30),               # mostly transparent
        _img("cat_4", 1, size=43),                             # fully-removed group
        _img("cat_5", 1, md5="dup"), _img("cat_5", 2, md5="dup"),
        _img("cat_6", 1, md5="dup"),                           # cross-group duplicate
        _img("cat_7", 1, size=6490),                           # AGG problematic size
        _img("cat_7", 2, w=299),                               # AGG min dim 300
        _img("cat_7", 3, top=0.9),                             # uniform color
    ]
    return spark.createDataFrame(rows, IMG_COLS)


def test_advanced_cascade_reasons(images):
    out = {(r["doc_id"], r["image_idx"]): r for r in cleaning.advanced_cascade(images).collect()}
    assert out[("cat_1", 1)]["keep"] is True
    assert out[("cat_1", 2)]["reason"] == "File size suspicious: 43"
    assert out[("cat_1", 3)]["reason_category"] == "file_size"
    assert out[("cat_2", 1)]["reason_category"] == "pattern"
    assert out[("cat_2", 2)]["reason"] == "Too small: 99x500"
    assert out[("cat_2", 3)]["reason"] == "Too large: 10001x500"
    assert out[("cat_3", 1)]["reason"] == "Bad aspect ratio: 13.33"
    assert out[("cat_3", 2)]["reason"] == "Mostly transparent"
    # first-match-wins: size beats pattern beats dimension (AC:128-149)
    assert out[("cat_4", 1)]["reason_category"] == "file_size"


def test_cleaning_stats_fully_removed(images):
    stats = cleaning.cleaning_stats(cleaning.advanced_cascade(images), "doc_id").collect()[0]
    assert stats["total_groups"] == 7
    assert stats["total_images_before"] == 15
    assert stats["groups_fully_removed"] == 3  # cat_2, cat_3, cat_4


def test_aggressive_cascade(images):
    out = {(r["doc_id"], r["image_idx"]): r for r in cleaning.aggressive_cascade(images).collect()}
    # note: every AG "problematic size" is below the 10KB minimum, so
    # the size check fires first — faithful to AG:149-160 order
    assert out[("cat_7", 1)]["reason"] == "File too small: 6490"
    assert out[("cat_7", 2)]["reason"] == "Too small: 299x500"
    assert out[("cat_7", 3)]["reason"] == "Too uniform (likely logo/icon)"
    assert out[("cat_1", 1)]["keep"] is True


def test_keep_first_dedup_deterministic(images):
    survivors = dedup.exact_dedup(images, "md5", ["doc_id", "image_idx", "src_key"])
    dup_rows = survivors.filter(F.col("md5") == "dup").collect()
    assert len(dup_rows) == 1
    assert (dup_rows[0]["doc_id"], dup_rows[0]["image_idx"]) == ("cat_5", 1)
    groups = {r["md5"]: r for r in dedup.duplicate_groups(images, "md5", "doc_id").collect()}
    assert groups["dup"]["n_members"] == 3


def test_yolo_filter_exists(spark):
    rows = [
        ("a", [(0.9, [0.0, 0.0, 1.0, 1.0]), (0.2, [0.0, 0.0, 1.0, 1.0])]),
        ("b", [(0.1, [0.0, 0.0, 1.0, 1.0])]),
        ("c", []),
        ("d", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, detections array<struct<confidence double, bbox array<double>>>"
    )
    out = {r["doc_id"]: r for r in cleaning.yolo_filter(df, 0.3).collect()}
    assert out["a"]["keep"] and out["a"]["detection_count"] == 1
    assert out["a"]["avg_confidence"] == 0.9
    assert not out["b"]["keep"] and not out["c"]["keep"] and not out["d"]["keep"]


def test_minhash_similar_docs_collide(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again today?"),
        (3, "completely different words about spark catalyst tungsten execution engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(df, "text", "doc_id", 16, 5)
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.lsh_candidate_pairs(sigs, "doc_id", 16, 4).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    jac = dedup.ngram_jaccard_pairs(df, "text", "doc_id", 5, 0.5).collect()
    assert len(jac) == 1 and jac[0]["id_a"] == 1 and jac[0]["jaccard"] > 0.7


def test_simhash_hamming(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: r["sh"] for r in df.select("doc_id", dedup.simhash64(F.col("text")).alias("sh")).collect()}
    ham12 = bin(sh[1] ^ sh[2]).count("1")
    ham13 = bin(sh[1] ^ sh[3]).count("1")
    assert ham12 < ham13


def test_lang_id_and_quality(spark):
    rows = [
        (1, "this is a plain english sentence with enough words to score well for the test"),
        (2, "猫はとても可愛い動物ですにゃんにゃん"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        analysis.lang_id(F.col("text")).alias("lang"),
        analysis.token_count(F.col("text")).alias("tokens"),
        analysis.quality_score(F.col("text")).alias("q"),
    ).collect()}
    assert out[1]["lang"] == "en" and out[2]["lang"] == "ja"
    assert out[1]["tokens"] == 15 and out[3]["tokens"] == 0
    assert out[1]["q"] >= 3 and out[3]["q"] <= 1


def test_renumber_and_ordinal(spark):
    cats = spark.createDataFrame(
        [(5, None, "Momo", None, None), (2, "  ", None, None, "copy A"), (9, None, None, None, None)],
        "cat_id long, name string, cat_name string, title string, catch_copy string",
    )
    out = {r["cat_id"]: r["new_dir"] for r in reorganize.renumber_groups(cats).collect()}
    assert out[2] == "cat_0001_copy_A"
    assert out[5] == "cat_0002_Momo"
    assert out[9] == "cat_0003_cat_9"


def test_cosine_topk_and_ann_agree(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((200, 16)).astype(float)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    query = [float(x) for x in vecs[0]]
    exact = [r["vec_id"] for r in similarity.cosine_topk(df, query, k=5).collect()]
    assert exact[0] == 0  # self is nearest
    approx = [r["vec_id"] for r in similarity.ann_topk_lsh(df, query, k=5, bits=6).collect()]
    assert approx[0] == 0
    # ANN recall sanity: at least 2 of exact top-5 in approx top-5
    assert len(set(exact) & set(approx)) >= 2


def test_global_sequence_matches_single_window(spark):
    """W3 scale path: bucketed two-phase global sequence == the direct
    single-partition row_number, and no single global sort remains."""
    from pyspark.sql import Window

    from webscrape_neko_jirushi_spark.operators.reorganize import global_sequence

    df = spark.range(0, 5000).select(
        (F.xxhash64(F.col("id").cast("string")) % 100000).alias("key"),
        F.col("id").alias("payload"),
    ).filter(F.col("key").isNotNull()).dropDuplicates(["key"])
    got = {
        (r["key"], r["seq"]) for r in global_sequence(df, "key", buckets=16).collect()
    }
    w = Window.orderBy("key")
    want = {
        (r["key"], r["seq"])
        for r in df.withColumn("seq", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want


def test_renumber_groups_bucketed_equals_default(spark):
    from webscrape_neko_jirushi_spark.operators import reorganize
    from webscrape_neko_jirushi_spark.sources.analog import cat_info_analog

    cats = cat_info_analog(
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    )
    a = {
        (r["cat_id"], r["new_dir"])
        for r in reorganize.renumber_groups(cats).select("cat_id", "new_dir").collect()
    }
    b = {
        (r["cat_id"], r["new_dir"])
        for r in reorganize.renumber_groups(cats, buckets=8)
        .select("cat_id", "new_dir")
        .collect()
    }
    assert a == b


def test_renumber_groups_auto_selects_bucketed_path(spark):
    """Above auto_threshold the bucketed path is the DEFAULT: the plan
    contains no single-partition exchange, and the output still equals
    the small-N single-window form."""
    from webscrape_neko_jirushi_spark.operators import reorganize
    from webscrape_neko_jirushi_spark.sources.analog import cat_info_analog

    cats = cat_info_analog(
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    )
    auto = reorganize.renumber_groups(cats, auto_threshold=100)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    got = {(r["cat_id"], r["new_dir"]) for r in auto.select("cat_id", "new_dir").collect()}
    want = {
        (r["cat_id"], r["new_dir"])
        for r in reorganize.renumber_groups(cats).select("cat_id", "new_dir").collect()
    }
    assert got == want


def test_renumber_groups_n_rows_hint_resolves_gate(spark):
    """The n_rows hint resolves the auto gate with ZERO construction
    jobs: a hint above the threshold plans the bucketed path (no
    single-partition exchange), below it the single window — and both
    produce the same numbering."""
    from webscrape_neko_jirushi_spark.operators import reorganize
    from webscrape_neko_jirushi_spark.sources.analog import cat_info_analog

    cats = cat_info_analog(
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    )
    big_hint = reorganize.renumber_groups(cats, n_rows=3_000_000)
    assert "SinglePartition" not in (
        big_hint._jdf.queryExecution().executedPlan().toString()
    )
    small_hint = reorganize.renumber_groups(cats, n_rows=10)
    assert "SinglePartition" in (
        small_hint._jdf.queryExecution().executedPlan().toString()
    )
    got = {
        (r["cat_id"], r["new_dir"])
        for r in big_hint.select("cat_id", "new_dir").collect()
    }
    want = {
        (r["cat_id"], r["new_dir"])
        for r in small_hint.select("cat_id", "new_dir").collect()
    }
    assert got == want


def test_simhash_signatures_equal_hof_form(spark):
    """The one-pass relational SimHash returns identical signatures to
    the HOF column form — including NULL and empty text (explode_outer
    keeps the NULL-text row; both forms sign it 0)."""
    from webscrape_neko_jirushi_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    docs = docs.unionByName(
        spark.createDataFrame(
            [(-1, None), (-2, "")], "doc_id long, text string"
        ).withColumns(
            {f.name: F.lit(None).cast(f.dataType) for f in docs.schema.fields
             if f.name not in ("doc_id", "text")}
        )
    )
    rel = {
        (r["doc_id"], r["simhash"])
        for r in dedup.simhash_signatures(docs, "text", "doc_id").collect()
    }
    hof = {
        (r["doc_id"], r["simhash"])
        for r in docs.select(
            "doc_id", dedup.simhash64(F.col("text")).alias("simhash")
        ).collect()
    }
    assert rel == hof


def test_connected_components_chain_and_star(spark):
    """Min-label propagation handles a 4-node chain (diameter > 1) and
    a star, and leaves separate components separate."""
    from webscrape_neko_jirushi_spark.operators import dedup

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain 1-2-3-4
         (10, 11), (10, 12), (10, 13),    # star at 10
         (20, 21)],                       # pair
        "id_a long, id_b long",
    )
    got = {
        (r["id"], r["cluster_id"])
        for r in dedup.connected_components(edges).collect()
    }
    want = {(1, 1), (2, 1), (3, 1), (4, 1),
            (10, 10), (11, 10), (12, 10), (13, 10),
            (20, 20), (21, 20)}
    assert got == want


def test_chunk_spans_overlap_semantics(spark):
    """Multi-chunk documents: stride = chunk-overlap, overlapping token
    windows, short final chunk, empty doc yields no chunks."""
    from webscrape_neko_jirushi_spark.text import analysis

    long_text = " ".join(f"w{i}" for i in range(300))
    contained_tail = " ".join(f"w{i}" for i in range(230))
    df = spark.createDataFrame(
        [
            ("d1", long_text),
            ("d2", "only three words"),
            ("d3", "  "),
            ("d4", contained_tail),
        ],
        "doc_id string, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in analysis.chunk_spans(df, chunk_tokens=128, overlap=16).collect()
    }
    # d1: starts 0,112,224 -> 3 chunks of 128,128,76 tokens
    assert {k for k in rows if k[0] == "d1"} == {("d1", 0), ("d1", 1), ("d1", 2)}
    assert rows[("d1", 0)]["n_chunk_tokens"] == 128
    assert rows[("d1", 1)]["n_chunk_tokens"] == 128
    assert rows[("d1", 2)]["n_chunk_tokens"] == 300 - 224
    # overlap: chunk 1 starts at token 112 (chunk 0 covered 0..127)
    assert rows[("d1", 1)]["chunk_text"].split()[0] == "w112"
    assert rows[("d1", 0)]["chunk_text"].split()[-1] == "w127"
    # d2: one short chunk; d3: none
    assert rows[("d2", 0)]["n_chunk_tokens"] == 3
    assert not any(k[0] == "d3" for k in rows)
    # d4 (230 tokens): the start at 224 would be fully contained in the
    # chunk at 112 (tokens 113-230) — it must NOT be emitted
    assert {k for k in rows if k[0] == "d4"} == {("d4", 0), ("d4", 1)}
    assert rows[("d4", 1)]["n_chunk_tokens"] == 230 - 112


def test_training_filter_reasons(spark):
    from webscrape_neko_jirushi_spark.text import analysis

    ok = "the quick brown fox jumps over the lazy dog and runs to the barn " * 2
    docs = spark.createDataFrame(
        [
            ("keep", ok),
            ("short", "tiny"),
            ("long", "word " * 1500),
            ("punct", "a, b, c! d? e; f: " + "g.,!? " * 20),
            ("wl", "x" * 100 + " " + "y" * 100),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: (r["keep"], r["reason"]) for r in analysis.training_filter(docs).collect()}
    assert got["keep"] == (True, None)
    assert got["short"] == (False, "too_short")
    assert got["long"] == (False, "too_long")
    assert got["punct"][1] == "punctuation"
    assert got["wl"][1] == "word_length"


def test_asof_join_semantics(spark):
    """Backward as-of: latest right <= left time, exact ties match,
    no prior right -> NULL, keys never cross."""
    from webscrape_neko_jirushi_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 5), (4, "b", 15), (5, "c", 9)],
        "event_id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 18, 2.0), ("b", 1, 3.0), ("b", 15, 4.0)],
        "k string, t long, v double",
    )
    got = {
        r["event_id"]: (r["asof_v"], r["asof_t"])
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t", value_cols=("v",)
        ).collect()
    }
    assert got[1] == (1.0, 10)   # exact tie matches
    assert got[2] == (2.0, 18)   # latest prior
    assert got[3] == (None, None)  # nothing at or before t=5
    assert got[4] == (4.0, 15)   # key b, tie
    assert got[5] == (None, None)  # key c has no right rows


def test_asof_join_null_values_do_not_splice(spark):
    """A NULL value column in the matched right row must come through
    as NULL — not be back-filled from an OLDER right row (the match is
    atomic per right row); NULL right_time rows never match."""
    from webscrape_neko_jirushi_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, "a", 12), (2, "a", 7)], "event_id long, k string, t long")
    right = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 10, None), ("a", None, 99.0)],
        "k string, t long, v double",
    )
    got = {
        r["event_id"]: (r["asof_v"], r["asof_t"])
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t", value_cols=("v",)
        ).collect()
    }
    assert got[1] == (None, 10)  # latest prior row, its NULL v intact
    assert got[2] == (1.0, 5)
    # the NULL-time row (v=99.0) never matched anything
    assert all(v != 99.0 for v, _ in got.values())


def test_ivf_cells_matches_duckdb_oracle(spark):
    """q_ivf_cells left the driver's 50-query registry (slot given to
    ann_topk_lsh) but keeps its full oracle gate here: Spark result vs
    the same DuckDB SQL at sf0.001, order-insensitive value compare."""
    import duckdb

    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        (r["cell"], r["n_vectors"])
        for r in entry.q_ivf_cells(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = sorted(
        (int(c), int(n))
        for c, n in con.execute(entry.IVF_CELLS_ORACLE_SQL).fetchall()
    )
    assert got == want


def test_hot_bucket_star_cap_bounds_pairs_and_keeps_clusters(spark):
    """Planted skew: many near-identical docs land in ONE LSH bucket.
    AQE's skew split fixes partition imbalance but not the quadratic
    pair OUTPUT — max_bucket's star expansion does: the hot bucket
    contributes O(B) edges instead of O(B^2), and connected components
    over the capped candidates still recover the full duplicate group."""
    from webscrape_neko_jirushi_spark.operators import dedup

    hot = [(i, "the same boilerplate cat adoption page text repeated verbatim")
           for i in range(300)]
    cold = [(1000 + i, f"unique document number {i} about cat {i * 37} fostering")
            for i in range(50)]
    docs = spark.createDataFrame(hot + cold, "doc_id long, text string")
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", 16, 5)

    capped = dedup.lsh_candidate_pairs(sigs, "doc_id", 16, 4, max_bucket=50)
    n_capped = capped.count()
    # star edges: 299 per band at most, dedup'd across bands -> 299;
    # plus any cold-doc collisions (none expected). Uncapped would be
    # 300*299/2 = 44850 from the hot bucket alone.
    assert n_capped <= 350, n_capped

    clusters = dedup.connected_components(capped)
    hot_clusters = {
        r["cluster_id"]
        for r in clusters.filter(F.col("id") < 300).collect()
    }
    assert hot_clusters == {0}, hot_clusters  # one group, min-id label
    # all 300 hot members present in the component
    assert clusters.filter(F.col("cluster_id") == 0).count() == 300

    # uncapped semantics unchanged (exhaustive pairs inside the bucket)
    uncapped = dedup.lsh_candidate_pairs(sigs, "doc_id", 16, 4)
    assert uncapped.count() >= 300 * 299 // 2


def test_ivf_train_centroids_matches_duckdb_lloyd(spark):
    """Differential check of the DISTRIBUTED part of k-means training
    (X10): inject the same deterministic init (the driver-side
    _sample_for_init + _greedy_spread helpers are shared by
    construction) and unroll two Lloyd rounds in DuckDB SQL — assign =
    argmax of ROUND(cosine, 9) with ties to the lowest cell (exactly
    ivf_assign's contract), update = per-dim AVG with empty cells
    keeping their previous centroid. Final centroids must agree
    coordinate-for-coordinate at 6 decimals (the only legitimate
    divergence is double summation order inside AVG)."""
    import duckdb

    from webscrape_neko_jirushi_spark.operators.similarity import (
        _greedy_spread,
        _sample_for_init,
        ivf_train_centroids,
    )

    sf_dir = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_cells, n_iters, seed, dim = 4, 2, 7, 64

    got_cents = ivf_train_centroids(
        e, n_cells, n_iters=n_iters, seed=seed, tol=0.0
    )
    got = {
        (cid, d): round(x, 6)
        for cid, c in enumerate(got_cents)
        for d, x in enumerate(c, start=1)
    }

    init = _greedy_spread(
        _sample_for_init(e, 8 * n_cells, seed, "vec_id", "embedding"), n_cells
    )
    init_values = ", ".join(
        f"({cid}, [{', '.join(repr(float(x)) for x in c)}])"
        for cid, c in enumerate(init)
    )
    cos = (
        "(list_aggregate(list_transform(range(1, 65), i -> m.e[i] * c.c[i]), 'sum')"
        " / (sqrt(list_aggregate(list_transform(range(1, 65), i -> m.e[i] * m.e[i]), 'sum'))"
        " * sqrt(list_aggregate(list_transform(range(1, 65), i -> c.c[i] * c.c[i]), 'sum'))))"
    )
    avg_list = "[" + ", ".join(f"avg(e[{i}])" for i in range(1, dim + 1)) + "]"

    def assign(cents: str) -> str:
        return f"""
          SELECT vec_id, e, cid FROM (
            SELECT m.vec_id, m.e, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY m.vec_id
                     ORDER BY ROUND({cos}, 9) DESC, c.cid) AS rn
            FROM emb m CROSS JOIN {cents} c
          ) t WHERE rn = 1
        """

    def update(prev: str, assigned: str) -> str:
        return f"""
          SELECT p.cid, COALESCE(u.c, p.c) AS c
          FROM {prev} p LEFT JOIN (
            SELECT cid, {avg_list} AS c FROM {assigned} GROUP BY cid
          ) u USING (cid)
        """

    sql = f"""
      WITH emb AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
      ),
      c0(cid, c) AS (VALUES {init_values}),
      a1 AS ({assign('c0')}),
      c1 AS ({update('c0', 'a1')}),
      a2 AS ({assign('c1')}),
      c2 AS ({update('c1', 'a2')})
      SELECT cid, d.i AS dim, ROUND(c[d.i], 6) AS coord
      FROM c2, range(1, 65) d(i)
    """
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = {
        (int(cid), int(d)): float(coord)
        for cid, d, coord in con.execute(sql).fetchall()
    }
    assert got == want
    # and the rounds actually moved the centroids off the init
    assert any(
        abs(init[cid][d - 1] - got[(cid, d)]) > 1e-6 for (cid, d) in got
    )


def test_ivf_train_centroids_init_warm_start(spark):
    """init= skips the sample/greedy-spread init but changes NOTHING
    about the rounds: warm-starting from the exact centroids the
    default path would have drawn yields the identical result, and
    shape mismatches fail loudly."""
    from webscrape_neko_jirushi_spark.operators.similarity import (
        _greedy_spread,
        _sample_for_init,
        ivf_train_centroids,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    inits = _greedy_spread(
        _sample_for_init(e, 16, 7, "vec_id", "embedding"), 2
    )
    a = ivf_train_centroids(e, 2, n_iters=1, seed=7, tol=0.0)
    b = ivf_train_centroids(e, 2, n_iters=1, seed=7, tol=0.0, init=inits)
    assert a == b

    with pytest.raises(ValueError, match="init has"):
        ivf_train_centroids(e, 2, init=[inits[0]])
    with pytest.raises(ValueError, match="centroid dim"):
        ivf_train_centroids(e, 2, init=[[1.0, 2.0], [3.0, 4.0]])
