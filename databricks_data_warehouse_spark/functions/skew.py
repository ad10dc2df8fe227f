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
    salt_expr=None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted over ``n_salts``
    sub-partitions. ``small`` is replicated ``n_salts``× (keep it the
    dimension side).

    ``salt_expr`` is the deterministic per-row expression the salt is
    hashed from (default: all of the skewed side's columns). It MUST be
    deterministic — ``rand()`` would re-salt differently when a task
    retries recomputes the row, losing/duplicating matches (the classic
    nondeterministic-salt bug). ``how`` supports ``inner`` and ``left``
    (an unmatched left row joins nothing under every salt, so the
    null-extension is identical to the plain left join)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(on)
    salt_src = (
        [salt_expr]
        if salt_expr is not None
        else [F.col(c) for c in skewed.columns]
    )
    salted = skewed.withColumn(
        _SALT, F.pmod(F.xxhash64(*salt_src), F.lit(n_salts))
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, on=keys + [_SALT], how=how).drop(_SALT)
