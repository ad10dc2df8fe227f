"""Delta Live Tables–style pipeline expectations.

The reference validates row quality imperatively (CommonFunctions.py's
validate_column / the Silver-Validation split, SURVEY.md §2.C2/C6);
the modern Databricks spelling of the same intent is DLT's
``@dlt.expect`` family — declarative per-rule boolean predicates with
three enforcement actions and per-run violation metrics:

- ``expect`` (warn): violating rows are KEPT, violations counted;
- ``expect_or_drop``: violating rows are dropped from the output;
- ``expect_or_fail``: any violation aborts the update.

DLT rule reproduced exactly: a predicate that evaluates to NULL counts
as a VIOLATION (``coalesce(pred, false)``).

Scale design — metrics must not cost an extra pass:

- :func:`with_expectations` is the zero-extra-pass form: it attaches
  every rule's violation counter as an ``observe`` metric (computed by
  the SAME job that consumes the frame — Spark's AccumulatorV2-backed
  observed metrics, no second scan) and returns the drop-filtered
  frame.  Works on batch AND streaming DataFrames (streaming surfaces
  the metrics per micro-batch in ``StreamingQueryProgress``).
- :func:`run_expectations` is the batch convenience form: ONE
  aggregate job computes every rule's violation count map-side
  (partial aggregation; the shuffle carries one row per partition),
  raises on a violated ``fail`` rule, and returns the kept frame plus
  a tiny metrics DataFrame.  The unpivot to (rule, action, violations)
  happens on a single driver-sized row.

Dropped rows are not silently lost: ``quarantine_predicate`` gives the
DLQ-side filter (the medallion pipelines' C6 split, pipelines/dlq.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

_ACTIONS = ("warn", "drop", "fail")
_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_RESERVED_NAMES = frozenset({"__total", "__rows_observed"})


class ExpectationFailedError(Exception):
    """An ``expect_or_fail`` rule saw at least one violating row."""


@dataclass(frozen=True)
class Expectation:
    """One named rule: SQL boolean predicate + enforcement action."""

    name: str
    condition: str
    action: str = "warn"

    def __post_init__(self) -> None:
        if self.action not in _ACTIONS:
            raise ValueError(
                f"expectation {self.name!r}: action must be one of "
                f"{_ACTIONS}, got {self.action!r}"
            )
        # names are interpolated into stack() SQL and used as column
        # aliases — restrict to safe identifiers and reserve the
        # internal aliases so no name can break or inject the
        # metrics query (ADVICE r10)
        if not _NAME_RE.fullmatch(self.name):
            raise ValueError(
                f"expectation name {self.name!r}: must match "
                "[A-Za-z_][A-Za-z0-9_]* (letters, digits, underscore)"
            )
        if self.name in _RESERVED_NAMES:
            raise ValueError(
                f"expectation name {self.name!r} is reserved"
            )

    def passes(self) -> Column:
        """True where the row satisfies the rule (NULL → violation,
        the DLT convention)."""
        return F.coalesce(F.expr(self.condition), F.lit(False))


def expect(name: str, condition: str) -> Expectation:
    """Warn-only rule: keep violating rows, count them."""
    return Expectation(name, condition, "warn")


def expect_or_drop(name: str, condition: str) -> Expectation:
    """Drop rule: violating rows are removed from the output."""
    return Expectation(name, condition, "drop")


def expect_or_fail(name: str, condition: str) -> Expectation:
    """Fail rule: any violating row aborts the update."""
    return Expectation(name, condition, "fail")


def _check_names(exps: Sequence[Expectation]) -> None:
    seen: set[str] = set()
    for e in exps:
        if e.name in seen:
            raise ValueError(f"duplicate expectation name: {e.name!r}")
        seen.add(e.name)


def keep_predicate(exps: Sequence[Expectation]) -> Column:
    """AND of every drop/fail rule — True where the row survives.
    (Fail rules are included so that, post-assert, the kept frame is
    consistent even if the caller swallows the exception.)"""
    pred = F.lit(True)
    for e in exps:
        if e.action in ("drop", "fail"):
            pred = pred & e.passes()
    return pred


def quarantine_predicate(exps: Sequence[Expectation]) -> Column:
    """Complement of :func:`keep_predicate` — the DLQ-side filter."""
    return ~keep_predicate(exps)


def with_expectations(
    df: DataFrame,
    exps: Sequence[Expectation],
    observation: Observation | None = None,
    observation_name: str = "expectations",
) -> DataFrame:
    """Zero-extra-pass enforcement: observe violation counters, then
    drop-filter.  The counters are computed by whatever action the
    caller runs on the result (write/collect/stream) — no second scan.

    Batch: pass an :class:`~pyspark.sql.Observation` and read
    ``observation.get`` after the action.  Streaming: pass no
    observation; the named metrics arrive in every micro-batch's
    ``StreamingQueryProgress.observedMetrics[observation_name]``.

    ``fail`` rules cannot abort mid-job in this form (metrics are only
    known after the action); use :func:`run_expectations` for batch
    fail semantics, or check the observed metric per micro-batch.
    """
    _check_names(exps)
    metrics = [
        F.sum(F.when(e.passes(), 0).otherwise(1)).alias(e.name) for e in exps
    ]
    metrics.append(F.count(F.lit(1)).alias("__rows_observed"))
    observed = (
        df.observe(observation_name, *metrics)
        if observation is None
        else df.observe(observation, *metrics)
    )
    return observed.where(keep_predicate(exps))


def expectation_metrics(
    df: DataFrame, exps: Sequence[Expectation]
) -> DataFrame:
    """Violation counts as data, in ONE aggregate job:
    ``(rule, action, violations, rows_total)`` — one output row per
    rule.  The scan aggregates map-side (one partial row per
    partition); the stack/unpivot runs on the single global row.
    """
    _check_names(exps)
    aggs = [
        F.sum(F.when(e.passes(), 0).otherwise(1)).alias(e.name) for e in exps
    ]
    row = df.agg(F.count(F.lit(1)).alias("__total"), *aggs)
    # unpivot the 1×(n+1) row to n×(rule, violations)
    pairs = ", ".join(f"'{e.name}', `{e.name}`" for e in exps)
    action_map = F.create_map(
        *[x for e in exps for x in (F.lit(e.name), F.lit(e.action))]
    )
    return (
        row.selectExpr(
            "__total",
            f"stack({len(exps)}, {pairs}) as (rule, violations)",
        )
        .select(
            "rule",
            action_map[F.col("rule")].alias("action"),
            F.col("violations").cast("bigint").alias("violations"),
            F.col("__total").cast("bigint").alias("rows_total"),
        )
    )


def run_expectations(
    df: DataFrame, exps: Sequence[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Batch enforcement with DLT fail semantics: compute the metrics
    (one aggregate job), raise :class:`ExpectationFailedError` if any
    ``fail`` rule was violated, and return
    ``(kept_df, metrics_df)`` — kept = drop/fail-filtered, lazily.
    """
    _check_names(exps)
    metrics = expectation_metrics(df, exps)
    failed = {
        r["rule"]: r["violations"]
        for r in metrics.where(
            (F.col("action") == "fail") & (F.col("violations") > 0)
        ).collect()
    }
    if failed:
        raise ExpectationFailedError(
            "expect_or_fail violated: "
            + ", ".join(f"{k} ({v} rows)" for k, v in sorted(failed.items()))
        )
    return df.where(keep_predicate(exps)), metrics


# ---------------------------------------------------------------- adapter

def expectations_from_rules(rules=(), fk_rules=()):
    """One rule set, two spellings (VERDICT r10 item 6): translate the
    reference-parity silver validation rules (C2 Type/Domain, C3 FK —
    :mod:`.silver`'s ``TypeRule``/``DomainRule``/``FkRule``) into DLT
    ``expect_or_drop`` expectations with IDENTICAL row routing, so the
    same quality spec can drive the medallion split AND the DLT
    spelling (``quarantine_predicate`` is the DLQ-side filter).

    Returns ``(prepare, expectations)``: ``prepare(df)`` augments the
    frame with one ``__fk_ok_<col>`` boolean per FK rule (the parent
    membership is a JOIN, not a row-local predicate — distributed
    left join against the distinct parent keys, broadcast-eligible,
    the same plan shape as ``validate_relationship``); the
    expectations then reference only row-local columns.

    Semantics matched to :mod:`..functions.validation` exactly:

    - numeric/timestamp: NULL or uncastable → violation
      (``validate_column`` marks cast-NULL invalid);
    - domain: NULL passes (the reference's ``~isin`` NULL
      fall-through leaves the row valid), non-member → violation;
    - FK: NULL child passes, non-NULL orphan → violation.
    """
    # Arbitrary column names are legal rule targets (the replaced
    # validate_column path accepted any F.col-able name, e.g. a
    # rename_map output like "order id") — quote them, don't reject
    # them. A backtick inside a quoted identifier is escaped by
    # doubling (Spark's rule), which closes the injection vector the
    # old _NAME_RE refusal guarded against; expectation NAMES stay
    # _NAME_RE-safe by sanitizing the column part (names are metric
    # aliases, not references back to the data).
    def _qi(name: str) -> str:
        # parity with F.col: a dot denotes struct-field access (the
        # old validate_column path resolved 'payload.amount' as a
        # nested field), so each path segment is quoted separately
        return ".".join(
            "`" + p.replace("`", "``") + "`" for p in name.split(".")
        )

    def _qflag(name: str) -> str:
        # internal flag columns are literal top-level names — never
        # dot-split (withColumn created them verbatim)
        return "`" + name.replace("`", "``") + "`"

    def _lit(v) -> str:
        # Spark SQL string literal: backslashes are escape characters
        # in the default parser mode, so they must be doubled ALONG
        # WITH quote-doubling — otherwise a domain value like 'a\\b'
        # silently un-escapes and matching rows route invalid
        return "'" + str(v).replace("\\", "\\\\").replace("'", "''") + "'"

    _used_names: set[str] = set()

    def _nm(name: str, suffix: str) -> str:
        safe = re.sub(r"[^A-Za-z0-9_]", "_", name) or "_"
        if not re.match(r"[A-Za-z_]", safe):
            safe = "_" + safe
        out = f"{safe}{suffix}"
        i = 2
        while out in _used_names:  # "a b" and "a_b" must not collide
            out = f"{safe}{suffix}_{i}"
            i += 1
        _used_names.add(out)
        return out

    exps: list[Expectation] = []
    prep_joins: list = []
    for rule in rules:
        col = rule.column
        if hasattr(rule, "accepted_values"):
            vals = ", ".join(_lit(v) for v in rule.accepted_values)
            exps.append(
                expect_or_drop(
                    _nm(col, "_in_domain"),
                    # empty domain: only NULL passes (the reference's
                    # ~isin([]) marks every non-NULL row invalid); a
                    # bare "IN ()" would not parse
                    f"{_qi(col)} IS NULL OR {_qi(col)} IN ({vals})"
                    if vals
                    else f"{_qi(col)} IS NULL",
                )
            )
        elif rule.datatype == "numeric":
            exps.append(
                expect_or_drop(
                    _nm(col, "_is_numeric"),
                    f"try_cast({_qi(col)} AS bigint) IS NOT NULL",
                )
            )
        elif rule.datatype == "timestamp":
            exps.append(
                expect_or_drop(
                    _nm(col, "_is_timestamp"),
                    f"try_cast({_qi(col)} AS timestamp) IS NOT NULL",
                )
            )
        else:
            raise ValueError(
                f"expectations_from_rules: unsupported rule {rule!r}"
            )
    for i, fk in enumerate(fk_rules):
        col = fk.column
        # keyed by rule INDEX too: two FkRules on one child column must
        # not join two identically-named flags (AMBIGUOUS_REFERENCE)
        flag = f"__fk_ok_{i}_{col}"
        parent_df, parent_col = fk.parent_df, fk.parent_column
        prep_joins.append((col, flag, parent_df, parent_col))
        exps.append(
            expect_or_drop(
                _nm(col, "_fk_valid"),
                f"{_qi(col)} IS NULL OR {_qflag(flag)}",
            )
        )

    def prepare(df: DataFrame) -> DataFrame:
        for col, flag, parent_df, parent_col in prep_joins:
            parents = (
                parent_df.select(F.col(parent_col).alias(col))
                .where(F.col(col).isNotNull())
                .distinct()
                .withColumn(flag, F.lit(True))
            )
            df = df.join(parents, on=col, how="left").withColumn(
                flag, F.coalesce(F.col(flag), F.lit(False))
            )
        return df

    return prepare, exps
