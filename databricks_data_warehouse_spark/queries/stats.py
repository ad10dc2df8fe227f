"""Statistical aggregates: correlation / covariance / least-squares
regression, computed from EXACT integer sufficient statistics.

The reference has no statistical functions at all (SURVEY.md §2.D —
its aggregate surface is count/avg/sum); Spark ships corr/covar_samp/
regr_slope natively, but their streaming-double accumulation makes the
result depend on partial-aggregation order — unusable for a
cross-engine value-hash oracle. So these operators compute the five
sufficient statistics n, Σx, Σy, Σxy, Σx², Σy² as exact integers
(money/quantity via ``cents``) and assemble corr/slope/intercept from
them in IEEE doubles at the very end: the same integer inputs go
through the same correctly-rounded double ops in any engine →
bit-identical results, rounded once more via ``rnd`` for belt and
braces.

Scale: one partial+final hash aggregate per group — the sufficient
statistics ARE the map-side combine, so the shuffle carries six longs
per group regardless of row count. Products that can exceed int64 at
100 TB row counts (n·Σy² with y in cents) are computed in
decimal(38,0) on the Spark side and HUGEINT in the DuckDB oracle —
both exact 128-bit-class integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import cents, load, rnd

_DEC = "decimal(38,0)"


def _exact_sums(df: DataFrame, keys: list[str], x, y) -> DataFrame:
    """Per-group exact sufficient statistics for (x, y) integer cols."""
    return (
        df.select(
            *keys,
            x.alias("x"),
            y.alias("y"),
        )
        .groupBy(*keys)
        .agg(
            F.count("*").cast(_DEC).alias("n"),
            F.sum(F.col("x").cast(_DEC)).alias("sx"),
            F.sum(F.col("y").cast(_DEC)).alias("sy"),
            F.sum((F.col("x") * F.col("y")).cast(_DEC)).alias("sxy"),
            F.sum((F.col("x") * F.col("x")).cast(_DEC)).alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast(_DEC)).alias("syy"),
        )
    )


def stats_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation and sample covariance between line quantity
    and extended price per return flag — the "does order size drive
    spend" profile over the TPC-H fact table.

    corr = (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²)),
    covar_samp = (n·Σxy − Σx·Σy) / (n·(n−1)), both from exact integer
    cents, so the doubles agree across engines to the last bit. The
    covariance is rescaled to (units · dollars).
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    s = _exact_sums(
        li, ["l_returnflag"], cents(F.col("l_quantity")), cents(F.col("l_extendedprice"))
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov_num = (n * F.col("sxy") - sx * sy).cast("double")
    varx = (n * F.col("sxx") - sx * sx).cast("double")
    vary = (n * F.col("syy") - sy * sy).cast("double")
    nd = n.cast("double")
    return (
        s.select(
            "l_returnflag",
            n.cast("long").alias("n_items"),
            rnd(cov_num / (F.sqrt(varx) * F.sqrt(vary)), 6).alias("corr_qty_price"),
            # cents²-scaled covariance → (quantity units)·(dollars): /10^4
            rnd(cov_num / (nd * (nd - 1)) / 10_000, 4).alias("covar_qty_price"),
        )
        .orderBy("l_returnflag")
    )


def stats_delay_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares regression of ship delay (days from order date to
    ship date) on line quantity, per order priority: does ordering more
    move your place in the queue?

    slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²), intercept = (Σy −
    slope·Σx)/n, r² = corr². x is quantity in cents (exact for the
    2-decimal doubles the generator emits) so the raw slope is
    per-cent; reported ×100 = days per quantity unit. One shuffle for
    the fact-to-orders join, one for the group-by; the sufficient
    statistics travel as six integers per group.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_orderpriority",
        cents(F.col("l_quantity")).alias("xq"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("yd"),
    )
    s = _exact_sums(joined, ["o_orderpriority"], F.col("xq"), F.col("yd"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = (n * F.col("sxy") - sx * sy).cast("double")
    varx = (n * F.col("sxx") - sx * sx).cast("double")
    vary = (n * F.col("syy") - sy * sy).cast("double")
    slope = cov / varx  # days per cent of quantity
    intercept = (sy.cast("double") - slope * sx.cast("double")) / n.cast("double")
    corr = cov / (F.sqrt(varx) * F.sqrt(vary))
    return (
        s.select(
            "o_orderpriority",
            n.cast("long").alias("n_items"),
            rnd(slope * 100, 6).alias("slope_days_per_unit"),
            rnd(intercept, 6).alias("intercept_days"),
            rnd(corr * corr, 6).alias("r2"),
        )
        .orderBy("o_orderpriority")
    )
