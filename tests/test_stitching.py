"""Paginated-document stitching (text/stitching.py): hand-built page
chains with nav-crumb overlaps, overlap diagnosis values, stitched
reassembly exactness, the raw/trimmed/stitched conservation law,
NULL-text page slots, the max_overlap cap semantics, the duplicate
(base, page) in-plan guard, partitioning invariance, and the DuckDB
twins."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.errors.exceptions.captured import SparkRuntimeException

from webscrape_neko_jirushi_spark.text import stitching

# chain A: 3 pages sharing nav crumbs across the break
A1 = "Chapter one begins here. NAV-A-1"
A2 = "NAV-A-1 middle of the story. NAV-A-2"
A3 = "NAV-A-2 the end."
PAGES = [
    ("a", 1, A1),
    ("a", 2, A2),
    ("a", 3, A3),
    # chain B: no shared text across the break
    ("b", 1, "standalone first."),
    ("b", 2, "totally different second."),
    # chain C: single page
    ("c", 1, "solo page"),
    # chain D: empty-body fetch in the middle holds its page slot
    ("d", 1, "d-one TAIL"),
    ("d", 2, None),
    ("d", 3, "unrelated d-three"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "base string, page int, text string")


def test_page_overlaps(pages):
    out = {
        (r["base"], r["page"]): r.asDict()
        for r in stitching.page_overlaps(pages).collect()
    }
    assert len(out) == len(PAGES)
    assert out[("a", 1)]["overlap"] == 0
    assert out[("a", 2)]["overlap"] == len("NAV-A-1")
    assert out[("a", 3)]["overlap"] == len("NAV-A-2")
    assert out[("b", 2)]["overlap"] == 0
    assert out[("c", 1)]["overlap"] == 0
    # NULL text -> '' holds the slot, overlaps 0 on both sides
    assert out[("d", 2)]["n_chars"] == 0
    assert out[("d", 2)]["overlap"] == 0
    assert out[("d", 3)]["overlap"] == 0
    for r in out.values():
        assert r["frag_chars"] == r["n_chars"] - r["overlap"]


def test_stitch_pages(pages):
    out = {
        r["base"]: r.asDict() for r in stitching.stitch_pages(pages).collect()
    }
    assert out["a"]["stitched_text"] == (
        A1 + A2[len("NAV-A-1"):] + A3[len("NAV-A-2"):]
    )
    assert out["a"]["n_pages"] == 3
    assert out["a"]["trimmed_chars"] == len("NAV-A-1") + len("NAV-A-2")
    assert out["b"]["stitched_text"] == (
        "standalone first." + "totally different second."
    )
    assert out["c"]["stitched_text"] == "solo page"
    assert out["d"]["stitched_text"] == "d-one TAIL" + "unrelated d-three"
    for r in out.values():
        # conservation: raw - trimmed = stitched = len(stitched_text)
        assert r["raw_chars"] - r["trimmed_chars"] == r["stitched_chars"]
        assert len(r["stitched_text"]) == r["stitched_chars"]


def test_max_overlap_cap(pages):
    # cap below the real overlap: largest k <= cap with an EXACT
    # suffix/prefix match — the crumb's last-4 != first-4, so 0.
    out = {
        (r["base"], r["page"]): r["overlap"]
        for r in stitching.page_overlaps(pages, max_overlap=4).collect()
    }
    assert out[("a", 2)] == 0
    # cap exactly at the crumb length still finds it
    out7 = {
        (r["base"], r["page"]): r["overlap"]
        for r in stitching.page_overlaps(pages, max_overlap=7).collect()
    }
    assert out7[("a", 2)] == 7


def test_duplicate_page_guard(spark):
    dup = spark.createDataFrame(
        [("a", 1, "x"), ("a", 1, "y")], "base string, page int, text string"
    )
    with pytest.raises(SparkRuntimeException, match="duplicate page"):
        stitching.stitch_pages(dup).collect()
    with pytest.raises(SparkRuntimeException, match="duplicate page"):
        stitching.page_overlaps(dup).collect()


def test_partitioning_invariance(pages):
    base = sorted(
        tuple(r) for r in stitching.stitch_pages(pages).collect()
    )
    repart = sorted(
        tuple(r)
        for r in stitching.stitch_pages(pages.repartition(7)).collect()
    )
    assert base == repart


def test_bad_args(pages):
    with pytest.raises(ValueError):
        stitching.page_overlaps(pages, max_overlap=0)
    with pytest.raises(ValueError):
        stitching.stitch_pages(pages, max_overlap=0)


def test_duckdb_twin(pages):
    con = duckdb.connect()
    con.register(
        "p", pd.DataFrame(PAGES, columns=["base", "page", "text"])
    )
    got_ov = sorted(
        tuple(r) for r in stitching.page_overlaps(pages).collect()
    )
    want_ov = sorted(
        tuple(r)
        for r in con.execute(
            stitching.page_overlaps_sql("p")
        ).fetchall()
    )
    assert got_ov == want_ov
    got_st = sorted(
        tuple(r) for r in stitching.stitch_pages(pages).collect()
    )
    want_st = sorted(
        tuple(r)
        for r in con.execute(stitching.stitch_pages_sql("p")).fetchall()
    )
    assert got_st == want_st


def test_null_page_guard(spark):
    """ADVICE r5: a NULL page orders NULLS FIRST on Spark but NULLS
    LAST on the DuckDB twin — it must raise in-plan like a duplicate,
    not quietly stitch in an engine-dependent order."""
    nul = spark.createDataFrame(
        [("a", None, "x"), ("a", 2, "y")], "base string, page int, text string"
    )
    with pytest.raises(SparkRuntimeException, match="NULL page"):
        stitching.stitch_pages(nul).collect()
    with pytest.raises(SparkRuntimeException, match="NULL page"):
        stitching.page_overlaps(nul).collect()
