"""Integer PageRank over the near-dup document graph (ext/graph.py).

Properties pinned here (the oracle entry graph_pagerank_docs pins the
exact values; these tests pin the invariants that make the algorithm a
PageRank and the arithmetic scale-safe):

- mass conservation up to floor-quantization loss,
- isolated (dangling) nodes all share one rank, strictly below any
  connected node that receives in-flow,
- determinism across runs (no fp, no partition-order sensitivity),
- degrees agree with an independently computed symmetrized edge count.
"""

from __future__ import annotations
import pytest

from pyspark.sql import functions as F

from databricks_data_warehouse_spark.ext import graph
from databricks_data_warehouse_spark.ext.dedup import ngram_jaccard_pairs

SF_DIR = "/root/testdata/sf0.001"


def test_pagerank_mass_and_dangling(spark):
    out = graph.pagerank_near_dup(spark, SF_DIR).cache()
    n = out.count()
    assert n == 500  # one row per document, isolated docs included

    total = out.agg(F.sum("pagerank_e12")).collect()[0][0]
    # Each of the 3 iterations loses at most ~1 unit per node per floor
    # division (teleport, contribution, damping) — bound generously.
    assert total <= graph.RANK_SCALE
    assert total >= graph.RANK_SCALE - 10 * 3 * n

    dang = out.where(F.col("degree") == 0).select("pagerank_e12").distinct()
    assert dang.count() == 1  # all dangling nodes are interchangeable
    dang_rank = dang.collect()[0][0]
    connected_min = (
        out.where(F.col("degree") > 0)
        .agg(F.min("pagerank_e12"))
        .collect()[0][0]
    )
    if connected_min is not None:
        # a connected node keeps the dangling baseline PLUS in-flow
        assert connected_min >= dang_rank


def test_pagerank_deterministic_and_degrees(spark):
    a = graph.pagerank_near_dup(spark, SF_DIR)
    b = graph.pagerank_near_dup(spark, SF_DIR)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    pairs = ngram_jaccard_pairs(spark, SF_DIR).select("doc_a", "doc_b")
    sym_deg = (
        pairs.union(pairs.select("doc_b", "doc_a"))
        .groupBy(F.col("doc_a").alias("doc_id"))
        .agg(F.count("*").alias("d"))
    )
    joined = a.join(sym_deg, "doc_id", "left").select(
        "doc_id", "degree", F.coalesce("d", F.lit(0)).alias("d")
    )
    assert joined.where(F.col("degree") != F.col("d")).count() == 0


# ---------------------------------------------------- property suite

from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _model(nodes, pairs, iterations=3):
    """Pure-Python integer reference of the power iteration — the spec
    the Spark plan and the DuckDB oracle must both realize."""
    sym = set()
    for a, b in pairs:
        if a != b:
            sym.add((a, b))
            sym.add((b, a))
    deg = Counter(s for s, _ in sym)
    n = len(nodes)
    base = graph.RANK_SCALE // n
    teleport = (
        (graph.DAMP_DEN - graph.DAMP_NUM) * base
    ) // graph.DAMP_DEN
    r = {v: base for v in nodes}
    for _ in range(iterations):
        dang = sum(r[v] for v in nodes if deg.get(v, 0) == 0)
        dd = dang // n
        insum = defaultdict(int)
        for s, d in sym:
            insum[d] += r[s] // deg[s]
        r = {
            v: teleport
            + (graph.DAMP_NUM * (insum.get(v, 0) + dd)) // graph.DAMP_DEN
            for v in nodes
        }
    return {v: (deg.get(v, 0), r[v]) for v in nodes}


@st.composite
def _graph_case(draw):
    n = draw(st.integers(min_value=1, max_value=9))
    nodes = list(range(n))
    pairs = draw(
        st.sets(
            st.tuples(
                st.integers(0, n - 1), st.integers(0, n - 1)
            ).map(lambda t: (min(t), max(t))).filter(lambda t: t[0] != t[1]),
            max_size=12,
        )
    )
    return nodes, sorted(pairs)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_graph_case())
@pytest.mark.slow
def test_pagerank_matches_integer_reference_model(spark, case):
    nodes, pairs = case
    docs = spark.createDataFrame([(v,) for v in nodes], "doc_id long")
    if pairs:
        pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    else:
        pdf = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {
        r["doc_id"]: (r["degree"], r["pagerank_e12"])
        for r in graph.pagerank_from_pairs(docs, pdf).collect()
    }
    assert got == _model(nodes, pairs)
