"""Skew mitigation: salted equi-join.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime, but it only applies to sort-merge joins and
after-the-fact. This helper is the explicit form for joins whose key
histogram is known-pathological (one tenant/entity dominating): the
skewed side's rows fan out over ``n_salts`` sub-keys via a deterministic
row hash, the small side is replicated ``n_salts`` times, and the join
key becomes (key, salt) — the hot key's rows now land on ``n_salts``
tasks instead of one.

Semantics are identical to the plain inner equi-join (each left row
carries exactly one salt; the right replica set covers every salt).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the skewed side salted over ``n_salts``
    sub-partitions. ``small`` is replicated ``n_salts``× (keep it the
    dimension side)."""
    keys = list(on)
    salted = skewed.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, on=keys + [_SALT], how="inner").drop(_SALT)
