"""DLT-style expectations (pipelines/expectations.py).

Reference shape: declarative re-spelling of the reference's
validate-and-split (Silver-Validation-Orders.py:47-155, CommonFunctions
validate_column) as Databricks DLT's expect / expect_or_drop /
expect_or_fail with per-run metrics."""

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from databricks_data_warehouse_spark.pipelines.expectations import (
    Expectation,
    ExpectationFailedError,
    expect,
    expect_or_drop,
    expect_or_fail,
    expectation_metrics,
    keep_predicate,
    quarantine_predicate,
    run_expectations,
    with_expectations,
)


@pytest.fixture
def df(spark):
    # id 0..9; val NULL on ids 7,8,9
    return spark.range(0, 10).select(
        F.col("id"),
        F.when(F.col("id") < 7, F.col("id") * 10).alias("val"),
    )


def test_warn_keeps_rows_and_counts(df):
    kept, metrics = run_expectations(df, [expect("small", "id < 3")])
    assert kept.count() == 10  # warn never drops
    m = {r["rule"]: r for r in metrics.collect()}
    assert m["small"]["violations"] == 7
    assert m["small"]["action"] == "warn"
    assert m["small"]["rows_total"] == 10


def test_drop_removes_violating_rows(df):
    kept, metrics = run_expectations(df, [expect_or_drop("even", "id % 2 = 0")])
    assert sorted(r["id"] for r in kept.collect()) == [0, 2, 4, 6, 8]
    assert metrics.collect()[0]["violations"] == 5


def test_null_predicate_counts_as_violation_and_drops(df):
    # val IS NULL on 3 rows -> predicate NULL -> violation (DLT rule)
    kept, metrics = run_expectations(df, [expect_or_drop("v", "val >= 0")])
    assert kept.count() == 7
    assert metrics.collect()[0]["violations"] == 3


def test_fail_raises_with_rule_and_count(df):
    with pytest.raises(ExpectationFailedError, match=r"pos \(3 rows\)"):
        run_expectations(df, [expect_or_fail("pos", "id < 7")])


def test_fail_passes_when_clean(df):
    kept, _ = run_expectations(df, [expect_or_fail("pos", "id >= 0")])
    assert kept.count() == 10


def test_combined_rules_one_metrics_row_each(df):
    exps = [
        expect("w", "id < 5"),
        expect_or_drop("d", "id <> 0"),
        expect_or_fail("f", "id < 100"),
    ]
    kept, metrics = run_expectations(df, exps)
    assert kept.count() == 9  # only the drop rule removes rows
    rows = {r["rule"]: (r["action"], r["violations"]) for r in metrics.collect()}
    assert rows == {"w": ("warn", 5), "d": ("drop", 1), "f": ("fail", 0)}


def test_quarantine_complements_keep(df):
    exps = [expect_or_drop("even", "id % 2 = 0"), expect("w", "id < 3")]
    kept = df.where(keep_predicate(exps))
    dlq = df.where(quarantine_predicate(exps))
    assert kept.count() + dlq.count() == 10
    assert dlq.agg(F.min("id")).collect()[0][0] == 1  # odd ids quarantined


def test_with_expectations_observe_single_pass(df):
    obs = Observation()
    out = with_expectations(df, [expect_or_drop("even", "id % 2 = 0")], obs)
    assert out.count() == 5  # the action that also computes the metrics
    got = obs.get
    assert got["even"] == 5
    assert got["__rows_observed"] == 10  # observed BEFORE the filter


def test_duplicate_rule_names_rejected(df):
    with pytest.raises(ValueError, match="duplicate"):
        expectation_metrics(df, [expect("a", "id>0"), expect("a", "id<5")])


def test_bad_action_rejected():
    with pytest.raises(ValueError, match="action"):
        Expectation("x", "1=1", "quarantine")


def test_streaming_observe_metrics(spark, tmp_path):
    """with_expectations works on a streaming frame: drop enforced per
    micro-batch, violation counters in observedMetrics."""
    src = tmp_path / "src"
    src.mkdir()
    spark.range(0, 20).select(
        F.col("id"), (F.col("id") % 4).alias("g")
    ).coalesce(1).write.parquet(str(src), mode="overwrite")
    stream = spark.readStream.schema("id long, g long").parquet(str(src))
    out = with_expectations(
        stream, [expect_or_drop("g_ok", "g <> 0"), expect("big", "id >= 10")]
    )
    q = (
        out.writeStream.format("memory")
        .queryName("exp_stream")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        assert spark.table("exp_stream").count() == 15  # g==0 dropped
        observed = [
            p.observedMetrics["expectations"]
            for p in q.recentProgress
            if "expectations" in (p.observedMetrics or {})
        ]
        assert sum(m["g_ok"] for m in observed) == 5
        assert sum(m["big"] for m in observed) == 10
        assert sum(m["__rows_observed"] for m in observed) == 20
    finally:
        q.stop()


def test_expectation_name_validation():
    """ADVICE r10: names reach stack() SQL and column aliases — reject
    anything that could break/inject the metrics query, and the
    reserved internal aliases."""
    import pytest as _pytest

    from databricks_data_warehouse_spark.pipelines.expectations import (
        Expectation,
    )

    Expectation("valid_name_1", "k > 0")  # fine
    for bad in ("has'quote", "back`tick", "with space", "1leading",
                "semi;colon", ""):
        with _pytest.raises(ValueError, match="must match"):
            Expectation(bad, "k > 0")
    for reserved in ("__total", "__rows_observed"):
        with _pytest.raises(ValueError, match="reserved"):
            Expectation(reserved, "k > 0")


def test_rules_adapter_matches_reference_validation_split(spark):
    """VERDICT r10 item 6: the SAME C2/C3 rule set routed through (a)
    the reference-parity validate_batch split and (b) the DLT
    expectations spelling must quarantine EXACTLY the same rows —
    covering numeric NULL/uncastable, domain NULL fall-through
    (NULL stays valid, the reference's ~isin quirk), timestamp, and
    FK orphan/NULL-child semantics."""
    from databricks_data_warehouse_spark.pipelines.expectations import (
        expectations_from_rules,
        keep_predicate,
        quarantine_predicate,
    )
    from databricks_data_warehouse_spark.pipelines.silver import (
        DomainRule,
        FkRule,
        TypeRule,
        validate_batch,
    )

    rows = [
        # (row_id, num, dom, ts, fk)
        (1, "7", "a", "2024-01-01 00:00:00", 10),     # all valid
        (2, "x", "a", "2024-01-01 00:00:00", 10),     # bad numeric
        (3, None, "a", "2024-01-01 00:00:00", 10),    # NULL numeric -> invalid
        (4, "7", "z", "2024-01-01 00:00:00", 10),     # bad domain
        (5, "7", None, "2024-01-01 00:00:00", 10),    # NULL domain -> VALID
        (6, "7", "a", "nope", 10),                    # bad timestamp
        (7, "7", "a", "2024-01-01 00:00:00", 99),     # FK orphan
        (8, "7", "a", "2024-01-01 00:00:00", None),   # NULL FK -> VALID
    ]
    df = spark.createDataFrame(
        rows, "row_id long, num string, dom string, ts string, fk long"
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk long")
    rules = [
        TypeRule("num", "numeric"),
        DomainRule("dom", ["a", "b"]),
        TypeRule("ts", "timestamp"),
    ]
    fk_rules = [FkRule("fk", parent, "pk")]
    # (a) reference-parity path (empty ingested set, unique ids: the
    # ingestion/duplicate stages are neutral — C2/C3 decide the split)
    labeled = validate_batch(
        df, df.select("row_id").limit(0), ["row_id"], "ts",
        rules=rules, fk_rules=fk_rules,
    )
    ref_invalid = {
        r["row_id"]
        for r in labeled.where("validation_status = 'invalid'").collect()
    }
    # (b) DLT spelling from the SAME rule objects
    prepare, exps = expectations_from_rules(rules, fk_rules)
    pdf = prepare(df)
    dlt_invalid = {
        r["row_id"] for r in pdf.where(quarantine_predicate(exps)).collect()
    }
    dlt_valid = {
        r["row_id"] for r in pdf.where(keep_predicate(exps)).collect()
    }
    assert ref_invalid == dlt_invalid == {2, 3, 4, 6, 7}
    assert dlt_valid == {1, 5, 8}
    assert dlt_valid | dlt_invalid == {r[0] for r in rows}  # conservation


def test_stream_expectations_entry_matches_batch_totals(spark):
    """The stream_expectations oracle entry: summed observedMetrics
    across the availableNow drain == batch totals, kept count == drop
    enforcement (uses sf0.001 for speed)."""
    from databricks_data_warehouse_spark.streaming.windows import (
        stream_expectations,
    )

    sf = "/root/testdata/sf0.001"
    got = {r["rule"]: r for r in stream_expectations(spark, sf).collect()}
    ev = spark.read.parquet(sf + "/events.parquet")
    n = ev.count()
    n_err = ev.where("event_type = 'error'").count()
    n_over = ev.where("NOT coalesce(value > 300, false)").count()
    n_under = ev.where("NOT coalesce(value < 450, false)").count()
    kept = ev.where(
        "coalesce(event_type <> 'error', false) AND "
        "coalesce(value < 450, false)"
    ).count()
    assert got["not_error"]["violations"] == n_err
    assert got["value_over_300"]["violations"] == n_over
    assert got["value_under_450"]["violations"] == n_under
    for r in got.values():
        assert r["rows_observed"] == n and r["rows_kept"] == kept


def test_rules_adapter_accepts_non_identifier_columns(spark):
    """Rule columns are data references, not metric names: a renamed
    column like "order id" must route rows (the old adapter refused
    any non-identifier name — a regression vs the replaced
    validate_column path, which accepted every F.col-able name).
    Expectation NAMES stay identifier-safe via sanitization, with a
    collision counter ("a b" vs "a_b")."""
    from databricks_data_warehouse_spark.pipelines.expectations import (
        expectations_from_rules,
        quarantine_predicate,
    )
    from databricks_data_warehouse_spark.pipelines.silver import (
        DomainRule,
        TypeRule,
    )

    df = spark.createDataFrame(
        [(1, "7", "a"), (2, "x", "a"), (3, "7", "z")],
        ["row_id", "order id", "a`b"],
    )
    rules = [
        TypeRule("order id", "numeric"),
        DomainRule("a`b", ["a"]),
        TypeRule("order_id", "numeric"),  # sanitizes to the same stem
    ]
    df = df.withColumn("order_id", df["`order id`"])
    prepare, exps = expectations_from_rules(rules)
    assert len({e.name for e in exps}) == 3  # collision de-duped
    bad = {
        r["row_id"]
        for r in prepare(df).where(quarantine_predicate(exps)).collect()
    }
    assert bad == {2, 3}


def test_rules_adapter_backslash_domain_and_nested_and_dup_fk(spark):
    """Three parity regressions vs the replaced validation path (r12
    review 3): backslashes in domain literals must survive Spark's
    escape parsing; dotted rule targets resolve as nested fields like
    F.col did; two FK rules on one child column must not collide on
    the prepare flag name."""
    from databricks_data_warehouse_spark.pipelines.expectations import (
        expectations_from_rules,
        quarantine_predicate,
    )
    from databricks_data_warehouse_spark.pipelines.silver import (
        DomainRule,
        FkRule,
        TypeRule,
    )

    df = spark.createDataFrame(
        [(1, "a\\b", ("7",), 10), (2, "zzz", ("x",), 99)],
        "row_id long, status string, payload struct<amount:string>, loc long",
    )
    wh = spark.createDataFrame([(10,)], "wh long")
    st = spark.createDataFrame([(99,), (10,)], "st long")
    rules = [
        DomainRule("status", ["a\\b"]),          # backslash survives
        TypeRule("payload.amount", "numeric"),    # nested field target
    ]
    fk_rules = [
        FkRule("loc", wh, "wh"),                  # row 2 orphan here
        FkRule("loc", st, "st"),                  # both rows pass here
    ]
    prepare, exps = expectations_from_rules(rules, fk_rules)
    bad = {
        r["row_id"]
        for r in prepare(df).where(quarantine_predicate(exps)).collect()
    }
    # row 1: domain ok (a\b), nested numeric ok, both FKs ok -> valid
    # row 2: domain violation + nested non-numeric + wh-FK orphan
    assert bad == {2}
