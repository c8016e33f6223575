"""Targeted salted equi-join (SURVEY.md §2.11 X64) — the MITIGATION
half of the X50 skew toolkit: ``stats.key_skew_report`` measures and
prescribes ``n_salts``; this operator applies it. At a 10^10-URL
frontier the hot join keys are structural (one host = 30% of the
frontier, one user = half the event log), AQE's skew-join only covers
sort-merge paths, and a single hot key serializes one reducer for the
whole stage — the classic fix is salting: split the hot key's rows
across ``n_salts`` sub-keys, replicate ONLY the matching build-side
rows per sub-key, join on ``(key, salt)``.

Semantics: bit-identical result multiset to the plain equi-join for
``inner`` and ``left`` joins (the oracle twin IS the plain join — the
strongest possible correctness statement for a performance rewrite).

Execution shape:
- ``hot`` keys (a bounded driver-side list — the output of
  ``stats.hot_keys``, top-k by construction) become plan literals;
- probe side: ``salt = portable-hash(row) % n_salts`` for hot-key rows
  (deterministic per row content — no ``rand()``: retries, resumes
  and oracle runs all reproduce the same partitioning), salt 0
  otherwise;
- build side: hot-key rows explode into all ``n_salts`` salts
  (replication is |hot build rows| x n_salts — bounded because hot
  keys are top-k and build-side hot rows are few when the skew is on
  the probe side, the case salting addresses); cold rows carry salt 0;
- ONE equi-join on ``(key, salt)`` — no reducer receives more than
  ~1/n_salts of the hottest key's rows.

When the build side is broadcastable none of this is needed (Spark
never shuffles a broadcast join); salting is the shuffle-join path
for two LARGE tables with a skewed probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join of ``probe`` (large, skewed) with ``build``
    on ``key``. ``hot_keys``: the keys to salt (plan literals, e.g.
    from ``stats.hot_keys``); None salts every key (build side
    replicated n_salts-fold — only for small build sides). ``how`` in
    {'inner', 'left'} (semantics-preserving cases; a right/full join
    would need the salting mirrored the other way)."""
    if n_salts < 2:
        raise ValueError(f"salted_join: n_salts must be >= 2, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: how must be inner|left, got {how!r}")
    dup = [c for c in probe.columns if c in build.columns and c != key]
    if dup:
        raise ValueError(
            f"salted_join: overlapping non-key columns {dup} — rename "
            "upstream (the joined row would be ambiguous)"
        )

    is_hot = (
        F.col(key).isin(list(hot_keys)) if hot_keys is not None else F.lit(True)
    )
    # deterministic per-row salt: hash of the whole row struct — no
    # rand(), so resumes/retries/oracle runs reproduce the partitioning
    row_salt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in probe.columns])),
        F.lit(n_salts),
    ).cast("int")
    p = probe.withColumn(_SALT, F.when(is_hot, row_salt).otherwise(F.lit(0)))

    salts = F.when(
        is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).otherwise(F.array(F.lit(0)))
    b = build.withColumn(_SALT, F.explode(salts))

    return p.join(b, on=[key, _SALT], how=how).drop(_SALT)
