"""Property-based tests (hypothesis) for the load-bearing invariants
whose input space is too big for example tests:

- the portable 60-bit hash agrees with its DuckDB twin on ARBITRARY
  unicode keys (every dedup/sampling/mixing operator rides on it);
- the PII scrub pair agrees cross-engine on arbitrary text (Java
  regex vs RE2 on generated adversarial unicode, beyond the seeded
  fuzz corpus);
- pack_sequences tiling/fullness invariants hold for arbitrary
  token-count multisets;
- token_budget_sample never undershoots and is nested in the budget
  for arbitrary budgets/counts.

Each example pays a small Spark job, so example counts are tuned low
(the strategies still shrink on failure); deadline is disabled —
Spark latency is not a property violation — and examples are
derandomized so the gate is reproducible run-to-run (widen by
removing ``derandomize`` locally when hunting)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from webscrape_neko_jirushi_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)
from webscrape_neko_jirushi_spark.text import curation, packing, scrubbing

# valid-unicode text (hypothesis excludes lone surrogates by default;
# Arrow cannot carry them either, so that boundary is out of scope)
_TEXT = st.text(max_size=60)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(st.lists(_TEXT, min_size=1, max_size=40, unique=True))
def test_portable_hash_matches_duckdb_on_arbitrary_keys(spark, keys):
    pdf = pd.DataFrame({"i": range(len(keys)), "s": keys})
    got = {
        r["i"]: r["h"]
        for r in spark.createDataFrame(pdf)
        .select("i", portable_hash64(F.col("s")).alias("h"))
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        int(i): int(h)
        for i, h in con.execute(
            f"SELECT i, {portable_hash64_sql('s')} AS h FROM t"
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None, derandomize=True)
@given(st.lists(_TEXT, min_size=1, max_size=30))
def test_pii_scrub_matches_duckdb_on_arbitrary_text(spark, texts):
    pdf = pd.DataFrame({"i": range(len(texts)), "s": texts})
    got = {
        r["i"]: (r["n_email"], r["n_ipv4"], r["n_phone"], r["scrubbed"])
        for r in scrubbing.scrub_pii(
            spark.createDataFrame(pdf), text_col="s", id_col="i"
        )
        .withColumnRenamed("doc_id", "i")
        .collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    want = {
        int(i): (int(a), int(b), int(c), s)
        for i, a, b, c, s in con.execute(
            scrubbing.scrub_pii_sql(id_expr="i", text_expr="s")
        ).fetchall()
    }
    assert got == want


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=64),
)
def test_pack_sequences_invariants_hold_for_any_counts(spark, counts, budget):
    rows = [(i, int(n)) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok int")
    out = packing.pack_sequences(
        df, budget, tokens_col="n_tok", buckets=0
    ).collect()
    total = sum(n for _, n in rows if n > 0)
    if total == 0:
        assert out == []
        return
    # global conservation + per-sequence fullness
    assert sum(r["n_tokens"] for r in out) == total
    per_seq: dict[int, int] = {}
    for r in out:
        assert 0 < r["n_tokens"] <= budget
        assert 0 <= r["seq_offset"] < budget
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["n_tokens"]
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))
    assert all(per_seq[s] == budget for s in per_seq if s != last)
    # per-doc tiling: fragments cover [0, n) contiguously in seq order
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, n in rows:
        frags = sorted(by_doc.get(d, []), key=lambda r: r["seq_id"])
        if n == 0:
            assert not frags
            continue
        acc = 0
        for r in frags:
            assert r["doc_offset"] == acc
            acc += r["n_tokens"]
        assert acc == n


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=40),
    st.integers(min_value=0, max_value=2000),
    st.integers(min_value=0, max_value=2000),
)
def test_token_budget_sample_cover_and_nested(spark, counts, b1, b2):
    lo, hi = sorted((b1, b2))
    rows = [(i, "s", int(n)) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tok int")

    def run(budget):
        kept = curation.token_budget_sample(
            df, {"s": budget}, "src", "n_tok", "doc_id"
        ).collect()
        return {r["doc_id"] for r in kept}, sum(r["n_tok"] for r in kept)

    ids_lo, tok_lo = run(lo)
    ids_hi, tok_hi = run(hi)
    total = sum(counts)
    # cover: reaches the budget unless the corpus ran out; exact-zero
    # budget keeps nothing
    assert tok_lo >= min(lo, total)
    if lo == 0:
        assert ids_lo == set()
    # nested: the smaller budget's keep-set is a subset of the larger
    assert ids_lo <= ids_hi


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),  # source size
            st.integers(min_value=1, max_value=4),  # integer weight
        ),
        min_size=1,
        max_size=3,
    )
)
def test_weighted_interleave_prefix_rate_property(spark, specs):
    """Stride-scheduling fairness for ARBITRARY sizes/weights: at any
    observed prefix boundary t, each source has contributed exactly
    min(n_s, floor(t * w_s)) rows — rates proportional to weights
    until exhaustion (the documented contract, checked at every
    boundary rather than the example tests' handful)."""
    import math

    sources = {}
    sizes = {}
    for si, (n, w) in enumerate(specs):
        name = f"s{si}"
        df = spark.createDataFrame(
            [(f"{name}-k{i}",) for i in range(n)], "doc_id string"
        )
        sources[name] = (df, float(w))
        sizes[name] = n
    if all(n == 0 for n in sizes.values()):
        return
    mixed = curation.weighted_interleave(sources, "doc_id", buckets=0)
    rows = sorted(
        mixed.select("source", "mix_key").collect(),
        key=lambda r: (r["mix_key"], r["source"]),
    )
    assert len(rows) == sum(sizes.values())
    for t in sorted({r["mix_key"] for r in rows}):
        got = {name: 0 for name in sources}
        for r in rows:
            if r["mix_key"] <= t:
                got[r["source"]] += 1
        for name, (df, w) in sources.items():
            want = min(sizes[name], math.floor(t * w + 1e-9))
            assert got[name] == want, (
                f"prefix t={t}: source {name} gave {got[name]} rows, "
                f"contract says {want}"
            )


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_substr_dup_ratio_bounds_and_exact_dup_property(spark, docs_words, k):
    """For arbitrary corpora: n_grams == max(0, n_tokens - k + 1),
    0 <= n_dup_grams <= n_grams, dup_ratio in [0, 1] — and any doc
    whose text is EXACTLY duplicated under another id has every gram
    cross-document-duplicated (ratio 1.0 when it has grams at all)."""
    from webscrape_neko_jirushi_spark.text import substrings

    rows = [(f"d{i}", " ".join(ws)) for i, ws in enumerate(docs_words)]
    # exact duplicate of the first doc under a fresh id
    rows.append(("twin", rows[0][1]))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: r
        for r in substrings.substr_dup_ratio(df, k=k).collect()
    }
    assert set(got) == {d for d, _ in rows}
    for doc_id, text in rows:
        r = got[doc_id]
        n_tokens = len(text.split()) if text.strip() else 0
        assert r["n_grams"] == max(0, n_tokens - k + 1)
        assert 0 <= r["n_dup_grams"] <= r["n_grams"]
        assert 0.0 <= r["dup_ratio"] <= 1.0
    # the planted twin pair: every gram appears in >= 2 distinct docs
    for doc_id in ("d0", "twin"):
        r = got[doc_id]
        if r["n_grams"] > 0:
            assert r["n_dup_grams"] == r["n_grams"]
            assert r["dup_ratio"] == 1.0


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=15), _TEXT, max_size=12
    ),
    st.dictionaries(
        st.integers(min_value=0, max_value=15), _TEXT, max_size=12
    ),
)
def test_corpus_diff_matches_dict_mirror(spark, old_rows, new_rows):
    """corpus_diff classification equals the obvious dict diff for
    ARBITRARY id/content snapshot pairs (including unicode content and
    empty snapshots)."""
    from webscrape_neko_jirushi_spark.operators import stats

    schema = "doc_id long, text string"
    old = spark.createDataFrame(list(old_rows.items()) or [], schema)
    new = spark.createDataFrame(list(new_rows.items()) or [], schema)
    got = {
        r["doc_id"]: r["change"]
        for r in stats.corpus_diff(old, new, "doc_id", ("text",)).collect()
    }
    want = {}
    for i in set(old_rows) | set(new_rows):
        if i not in old_rows:
            want[i] = "added"
        elif i not in new_rows:
            want[i] = "removed"
        elif old_rows[i] == new_rows[i]:
            want[i] = "unchanged"
        else:
            want[i] = "changed"
    assert got == want


# --- X52 morton key: bijectivity + order-preservation per axis --------

def _unmorton(z: int) -> tuple[int, int]:
    a = b = 0
    for i in range(31):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 31) - 1),
            st.integers(min_value=0, max_value=(1 << 31) - 1),
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_morton_key_bijective_on_arbitrary_points(spark, pts):
    from webscrape_neko_jirushi_spark.operators import layout

    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select(
        "x", "y", layout.morton_key(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in rows:
        assert _unmorton(r["z"]) == (r["x"], r["y"])


# --- X53 HLL: estimate depends only on the distinct SET ---------------

@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=50),
    st.integers(min_value=1, max_value=4),
)
def test_hll_multiset_invariance(spark, keys, reps):
    from webscrape_neko_jirushi_spark.operators import hll

    once = spark.createDataFrame([(k,) for k in set(keys)], "v string")
    many = spark.createDataFrame(
        [(k,) for k in keys for _ in range(reps)], "v string"
    )
    a = {
        (r["bucket"], r["register"])
        for r in hll.hll_registers(once, "v", 8).collect()
    }
    b = {
        (r["bucket"], r["register"])
        for r in hll.hll_registers(many, "v", 8).collect()
    }
    assert a == b


# --- X55 CMS: one-sided for every key in the input --------------------

@settings(max_examples=6, deadline=None, derandomize=True)
@given(st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=40))
def test_cms_never_undercounts(spark, keys):
    from collections import Counter

    from webscrape_neko_jirushi_spark.operators import cms

    truth = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "v string")
    sk = cms.cms_build(df, "v", 256, 3)
    probe = spark.createDataFrame([(k,) for k in truth], "v string")
    est = {
        r["v"]: r["estimate"]
        for r in cms.cms_query(sk, probe, "v", 256, 3).collect()
    }
    for k, t in truth.items():
        assert est[k] >= t
