"""Vectorized Python UDF surface (SURVEY.md §2.I: the reference has no
UDAF/UDTF at all, and its one scalar UDF was rewritten as a join; these
are the additive demos of the remaining Python-extension API classes,
each built so its result is EXACTLY oracle-checkable).

- ``udaf_weighted_delay``: a pandas GROUPED_AGG UDAF (Arrow-batched
  aggregation written in Python) — weighted average ship delay per
  priority, weights = line quantity. All sums are int64 inside numpy,
  so partial order cannot change the result; the only float op is the
  final division — IEEE-identical to the SQL twin.
- ``udtf_word_bigrams``: a Python UDTF (table function) exploding
  each document into ordered word bigrams — the lateral/table-function
  class Spark exposes to Python (one row in, many rows out, Python
  logic per row); the tokenization is replayed in the DuckDB oracle.

Both are demos of the API class, not the hot path — the engine's core
operators stay JVM-side (COVERAGE.md); use these shapes when the logic
genuinely cannot be expressed in built-ins.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from ..queries._util import load, rnd


@pandas_udf(DoubleType())
def _weighted_delay(delay: pd.Series, qty: pd.Series) -> float:
    """Σ(delay·qty)/Σ(qty) with exact int64 numerator/denominator."""
    d = delay.astype("int64")
    q = qty.astype("int64")
    num = int((d * q).sum())
    den = int(q.sum())
    return float("nan") if den == 0 else num / den


def udaf_weighted_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average ship delay per order priority, computed
    by a pandas GROUPED_AGG UDAF. Scale shape: Arrow transfer of two
    int columns per group partition — same shuffle as the built-in agg;
    the Python work is one vectorized multiply-sum per batch."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("delay"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return joined.groupBy("o_orderpriority").agg(
        rnd(_weighted_delay("delay", "qty"), 4).alias("weighted_avg_delay")
    )


@udtf(returnType="bigram_idx: int, bigram: string")
class _WordBigrams:
    """Tokenize on runs of the EXPLICIT ASCII whitespace class
    ``[ \\t\\n\\r\\f]`` (empties dropped) and emit consecutive word
    pairs with their 1-based index. The class is spelled out — not
    ``str.split()`` — because Python splits on Unicode whitespace
    (NBSP, U+2028, …) while the DuckDB oracle's RE2 ``\\s`` is
    ASCII-only; a document containing non-ASCII whitespace would
    diverge (ADVICE r05). The oracle splits on the same literal class
    and filters empties, so both sides are pinned to one definition."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = [t for t in re.split(r"[ \t\n\r\f]+", text) if t]
        for i in range(len(toks) - 1):
            yield (i + 1, toks[i] + " " + toks[i + 1])


def word_bigrams_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION shape of :func:`udtf_word_bigrams`: identical
    output from built-in expressions only — tokenize with ``split`` on
    the same explicit ASCII whitespace class, pair adjacent tokens with
    ``zip_with`` over two slices, ``posexplode`` the pair array. Stays
    inside whole-stage codegen with zero Python boundary, so this is
    the form a 100 TB corpus pass uses; the UDTF variant exists to
    demo the Python table-function API class, not as a hot path
    (COVERAGE.md, VERDICT r05 item 8)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # double-backslash: the SQL parser must pass \t \n \r \f through to
    # the regex engine (a single \f in a Spark SQL literal is an unknown
    # escape and collapses to the letter f — which would split on "f")
    t = docs.select(
        "doc_id",
        F.expr(
            r"filter(split(text, '[ \\t\\n\\r\\f]+'), x -> x != '')"
        ).alias("t"),
    )
    pairs = t.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN "
                "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1), "
                "(a, b) -> concat(a, ' ', b)) "
                "ELSE array() END"
            )
        ).alias("i0", "bigram"),
    )
    return pairs.select(
        "doc_id",
        (F.col("i0") + 1).cast("int").alias("bigram_idx"),
        "bigram",
    )


def udtf_word_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents exploded into ordered word bigrams by a Python UDTF —
    the lateral table-function class. The UDTF is registered and
    invoked per row via LATERAL; output is (doc_id, bigram_idx,
    bigram). API demo — :func:`word_bigrams_builtin` is the equivalent
    JVM-side production shape."""
    spark.udtf.register("word_bigrams", _WordBigrams)
    load(spark, sf_dir, "documents").select("doc_id", "text").createOrReplaceTempView(
        "docs_for_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.bigram_idx, s.bigram
        FROM docs_for_udtf d, LATERAL word_bigrams(d.text) s
        """
    )
