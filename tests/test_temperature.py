"""Temperature mixture reweighting (text/curation.py): hand-computed
weights, alpha limit behaviors, epoch budgeting, and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from webscrape_neko_jirushi_spark.text import curation

STATS = [("web", 800), ("books", 150), ("code", 50)]


@pytest.fixture(scope="module")
def stats(spark):
    return spark.createDataFrame(STATS, "source string, n_tokens long")


def test_hand_computed_alpha_half(spark, stats):
    out = {
        r["source"]: r.asDict()
        for r in curation.temperature_mixture(stats, alpha=0.5).collect()
    }
    ps = {s: n / 1000 for s, n in STATS}
    z = sum(p**0.5 for p in sorted(ps.values(), key=lambda v: v))  # any
    # order works for the assertion tolerance; engine order is fixed
    for s, p in ps.items():
        assert out[s]["token_share"] == pytest.approx(p, abs=1e-15)
        assert out[s]["weight"] == pytest.approx(p**0.5 / z, rel=1e-12)
    # alpha < 1 upsamples the small source vs its natural share
    assert out["code"]["weight"] > ps["code"]
    assert out["web"]["weight"] < ps["web"]


def test_alpha_limits(spark, stats):
    nat = {
        r["source"]: r["weight"]
        for r in curation.temperature_mixture(stats, alpha=1.0).collect()
    }
    for s, n in STATS:
        assert nat[s] == pytest.approx(n / 1000, rel=1e-12)
    uni = {
        r["source"]: r["weight"]
        for r in curation.temperature_mixture(stats, alpha=0.0).collect()
    }
    for s, _ in STATS:
        assert uni[s] == pytest.approx(1 / 3, rel=1e-12)
    with pytest.raises(ValueError, match="alpha"):
        curation.temperature_mixture(stats, alpha=-0.1)


def test_epochs_budget(spark, stats):
    out = {
        r["source"]: r["epochs"]
        for r in curation.temperature_mixture(
            stats, alpha=0.5, target_tokens=1000
        ).collect()
    }
    # epochs = budget * weight / tokens; the small source repeats
    assert out["code"] > 1.0 and out["web"] < 1.0
    total_drawn = sum(out[s] * n for s, n in STATS)
    assert total_drawn == pytest.approx(1000, rel=1e-12)


def test_duckdb_twin(spark, stats):
    got = sorted(
        tuple(r)
        for r in curation.temperature_mixture(
            stats, alpha=0.7, target_tokens=5000
        ).collect()
    )
    con = duckdb.connect()
    con.register("s", pd.DataFrame(STATS, columns=["source", "n_tokens"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            curation.temperature_mixture_sql(
                "SELECT * FROM s", alpha=0.7, target_tokens=5000
            )
        ).fetchall()
    )
    assert got == want  # fixed-order fold -> bit-identical doubles
