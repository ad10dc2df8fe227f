"""Merge condition/column-map builders (reference parity: CommonFunctions.py:39-73).

Pure-Python string builders fed to ``F.expr`` by the table layer.

The reference skipped any column whose *name contains* ``ingestion_time``
(a substring match, CommonFunctions.py:54). We keep that observable
behavior but expose ``exclude_substrings`` so callers can tighten it.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence


def condition_builder(
    columns: Sequence[str],
    ingested_alias: str,
    updates_alias: str,
    exclude_substrings: Iterable[str] = ("ingestion_time",),
) -> str:
    """Equality condition over all columns except audit-time ones.

    Produces ``"a.c1 = b.c1 AND a.c2 = b.c2"`` — the match condition of the
    reference's idempotent insert-only MERGE (Bronze-Ingestion-Customers.py:51-58).
    Null-safe equality is deliberately NOT used, matching the reference:
    rows with NULLs in any matched column never match and are re-inserted.
    """
    exclude = tuple(exclude_substrings)
    parts = [
        f"{ingested_alias}.{c} = {updates_alias}.{c}"
        for c in columns
        if not any(sub in c for sub in exclude)
    ]
    return " AND ".join(parts)


def build_insert_columns_dict(
    columns: Sequence[str], source_alias: str
) -> dict[str, str]:
    """``{col: "alias.col"}`` map for MERGE insert/update clauses
    (CommonFunctions.py:64-73)."""
    return {c: f"{source_alias}.{c}" for c in columns}
