"""String cleansing (reference parity: CommonFunctions.py:77-117).

Semantics observed in the reference (C1 in SURVEY.md §2.J):

1. tabs → spaces
2. special characters → spaces; two modes:
   - default: every non-letter (keeps only ``a-zA-Z`` and space)
   - address: keep alphanumerics and ``/``, then drop any ``/`` that is
     not between two digits (so ``1/2`` survives, a trailing ``/`` dies)
3. initcap (capitalize first letter of each word)
4. collapse runs of whitespace to a single space
5. trim

Ground-truth fixtures: TestCommonFunctions.py:36-61 —
``"  test #   1231phrase 1/2   /"`` → ``"Test Phrase"`` (default) /
``"Test 1231phrase 1/2"`` (address mode).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# keep-letters-only (default mode) vs keep-alnum-and-slash (address mode)
_NON_LETTER = "[^a-zA-Z ]"
_NON_ALNUM_SLASH = "[^a-zA-Z0-9 /]"
# a slash not sandwiched between digits (lookbehind/lookahead)
_LONE_SLASH = "(?<![0-9])/(?![0-9])"


def clean_string_expr(column: Column, is_address: bool = False) -> Column:
    """Column-level cleansing expression (pure, composable, codegen-friendly).

    The whole chain is built-in ``regexp_replace``/``initcap``/``trim`` —
    single projection, stays inside WholeStageCodegen, no Python boundary.
    """
    out = F.regexp_replace(column, "\t", " ")
    if is_address:
        out = F.regexp_replace(out, _NON_ALNUM_SLASH, " ")
        out = F.regexp_replace(out, _LONE_SLASH, " ")
    else:
        out = F.regexp_replace(out, _NON_LETTER, " ")
    out = F.initcap(out)
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def clean_string_in_df(
    dataframe: DataFrame,
    column_to_clean: str,
    new_column: str | None = None,
    is_address: bool = False,
) -> DataFrame:
    """Clean/standardize a string column; reference-parity wrapper.

    If ``new_column`` is None the column is cleaned in place, otherwise the
    cleaned value lands in ``new_column`` and the original is preserved.
    """
    target = new_column or column_to_clean
    return dataframe.withColumn(
        target, clean_string_expr(F.col(column_to_clean), is_address=is_address)
    )
