"""Recall floors for the approximate ANN operators — the accuracy-bound
companion to the approx-percentile rank-error test (VERDICT r04): an
approximate index with unmeasured recall is not a usable operator.
Ground truth is the oracle-checked brute-force ann_cosine_topk.

Caveat the floors encode: the synthetic embeddings are ISOTROPIC
random vectors — the worst case for sign-LSH, whose buckets only help
when neighbors share hyperplane signs (i.e. when the data has angular
cluster structure). IVF with 4/16 probes is nearly exhaustive and
stays high everywhere; LSH recall rises with corpus size as the true
top-k concentrates, and multi-probe must always dominate single-probe
at equal plane count."""

import pytest

from databricks_data_warehouse_spark.ext import similarity as sim

# measured floors (r06): single-probe 0.1/0.2, multi-probe 0.2/0.9
_LSH_MULTI_FLOOR = {"sf0.001": 0.2, "sf0.01": 0.5}


def _topk_ids(df):
    return [r.vec_id for r in df.collect()]


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_ann_recall_floors(spark, sf):
    sf_dir = f"/root/testdata/{sf}"
    truth = set(_topk_ids(sim.ann_cosine_topk(spark, sf_dir)))
    assert len(truth) == 10
    ivf = set(_topk_ids(sim.ann_ivf_topk(spark, sf_dir)))
    lsh1 = set(_topk_ids(sim.ann_lsh_topk(spark, sf_dir)))
    lshm = set(_topk_ids(sim.ann_lsh_topk_multiprobe(spark, sf_dir)))
    r_ivf = len(truth & ivf) / len(truth)
    r_lsh1 = len(truth & lsh1) / len(truth)
    r_lshm = len(truth & lshm) / len(truth)
    # IVF with 4-of-16 probes: high recall (measured 0.9-1.0)
    assert r_ivf >= 0.8, r_ivf
    # multi-probe dominates single-probe at equal plane count…
    assert r_lshm >= r_lsh1, (r_lshm, r_lsh1)
    # …and clears the measured floor for this corpus size
    assert r_lshm >= _LSH_MULTI_FLOOR[sf], (r_lshm, r_lsh1)


def test_auto_centroids_scales_with_corpus(spark):
    # k ~= sqrt(n/2): sf0.01 (500 vectors) -> ceil(sqrt(250)) = 16,
    # exactly the historical constant (hash-stable); sf0.1 (2000) ->
    # ceil(sqrt(1000)) = 32
    assert sim._auto_centroids(spark, "/root/testdata/sf0.01") == 16
    assert sim._auto_centroids(spark, "/root/testdata/sf0.1") == 32


def test_pq_codes_properties(spark):
    sf = "/root/testdata/sf0.001"
    pq = sim.emb_pq_codes(spark, sf).collect()
    n_vecs = {r.vec_id for r in pq}
    assert len(pq) == len(n_vecs) * 4  # m=4 codes per vector
    for r in pq:
        assert 0 <= r.code < 16 and 0 <= r.sub_id < 4
        assert r.dist6 >= 0.0
    # a codebook vector encodes as ITSELF with zero distance in every
    # subspace (its subvectors ARE centroids)
    for r in pq:
        if r.vec_id < 16:
            assert r.code == r.vec_id and r.dist6 == 0.0


def test_pq_adc_shortlist_rerank_recall(spark):
    # raw ADC@10 with 4x16 seed codebooks is a COARSE ranking (recall
    # 0.1-0.3 measured — the quantization cells are wide relative to
    # the neighbor gaps on this corpus); the production pattern is an
    # ADC shortlist + exact re-rank, whose recall is set by the
    # shortlist size (measured 0.8 at shortlist=100)
    sf = "/root/testdata/sf0.01"
    truth = set(_topk_ids(sim.ann_cosine_topk(spark, sf)))
    adc = _topk_ids(sim.ann_pq_topk(spark, sf))
    assert len(adc) == 10 and 0 not in adc  # query excluded, k rows
    rr = set(_topk_ids(sim.ann_pq_rerank_topk(spark, sf)))
    assert len(truth & rr) / len(truth) >= 0.5, (truth, rr)
    # the re-ranked set can only agree with truth at least as well as
    # raw ADC does
    assert len(truth & rr) >= len(truth & set(adc))


def test_hard_negatives_semantics(spark):
    sf = "/root/testdata/sf0.001"
    from databricks_data_warehouse_spark.queries._util import load
    labels = {
        r.vec_id: r.label
        for r in load(spark, sf, "embeddings").select("vec_id", "label").collect()
    }
    rows = sim.emb_hard_negatives(spark, sf).collect()
    assert len(rows) == 8 * 5
    for r in rows:
        assert r.label != labels[r.query_id]  # negatives only
        assert 1 <= r.rank <= 5
    # ranks are descending-similarity within each query
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine_sim))
    for q, rs in by_q.items():
        rs.sort()
        sims = [s for _, s in rs]
        assert sims == sorted(sims, reverse=True), (q, sims)


def _semantic_reference(emb, threshold, k):
    """The collapse-free round-7 algorithm: assignment over ALL
    vectors, intra-cluster pairs over ALL vectors, CC, anti-join."""
    from pyspark.sql import functions as F

    from databricks_data_warehouse_spark.ext.dedup import (
        connected_components,
    )

    assign = sim._assign_to_centroids(
        emb.select("vec_id", "embedding"),
        sim._ivf_centroids(emb.select("vec_id", "embedding"), k),
    ).select("vec_id", "centroid_id")
    vecs = (
        emb.join(assign, "vec_id")
        .select(
            "centroid_id", "vec_id",
            sim._as_double(F.col("embedding")).alias("e"),
        )
        .withColumn("n", sim.norm(F.col("e")))
    )
    a = vecs.select(
        "centroid_id", F.col("vec_id").alias("vec_a"),
        F.col("e").alias("e_a"), F.col("n").alias("n_a"),
    )
    b = vecs.select(
        "centroid_id", F.col("vec_id").alias("vec_b"),
        F.col("e").alias("e_b"), F.col("n").alias("n_b"),
    )
    pairs = (
        a.join(b, on="centroid_id")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            F.round(
                sim.dot(F.col("e_a"), F.col("e_b"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("s"),
        )
        .where(F.col("s") >= threshold)
    )
    comps = connected_components(pairs, "vec_a", "vec_b")
    losers = comps.where(F.col("comp") != F.col("node")).select(
        F.col("node").alias("vec_id")
    )
    return emb.select("vec_id", "label").join(losers, "vec_id", "left_anti")


@pytest.mark.slow
def test_semantic_dedup_collapse_equivalence(spark):
    """The exact-duplicate collapse is result-identical to the
    collapse-free reference on randomized corpora WITH planted exact
    duplicates (seeded — deterministic across runs)."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        base = [
            [rng.uniform(-1, 1) for _ in range(8)] for _ in range(40)
        ]
        rows = []
        vid = 0
        for i, v in enumerate(base):
            copies = 1 + (i % 3)  # 1-3 exact copies of each vector
            for _ in range(copies):
                rows.append((vid, f"l{i % 4}", v))
                vid += 1
        rng.shuffle(rows)
        emb = spark.createDataFrame(
            rows, "vec_id long, label string, embedding array<double>"
        )
        got = sorted(
            tuple(r) for r in sim.semantic_dedup_df(emb, 0.6, 8).collect()
        )
        want = sorted(
            tuple(r) for r in _semantic_reference(emb, 0.6, 8).collect()
        )
        assert got == want, (seed, len(got), len(want))


def test_retrieval_hybrid_rrf_invariants(spark):
    """Hybrid RRF fusion (round 12): the fused list is k rows, every
    row appeared in at least one side's top-n (no rank-0/rank-0 row),
    the score equals the two-term RRF sum of its ranks, and a doc
    present in BOTH lists outranks a same-best-rank doc present in
    one (the fusion property that makes RRF work)."""
    import databricks_data_warehouse_spark.ext.similarity as sim

    sf = "/root/testdata/sf0.001"
    got = sim.retrieval_hybrid_rrf(spark, sf, k=20, n=50).collect()
    assert len(got) == 20
    assert len({r["doc_id"] for r in got}) == 20
    for r in got:
        assert r["r_lex"] > 0 or r["r_vec"] > 0
        expect = (1.0 / (60 + r["r_lex"]) if r["r_lex"] else 0.0) + (
            1.0 / (60 + r["r_vec"]) if r["r_vec"] else 0.0
        )
        import math

        assert math.isclose(
            r["rrf"], math.floor(expect * 1e6 + 0.5) / 1e6
        )
    # descending fused score with doc_id tiebreak
    keys = [(-r["rrf"], r["doc_id"]) for r in got]
    assert keys == sorted(keys)


def test_rrf_oracle_lex_ranking_matches_canonical_bm25_twin():
    """Drift guard (round-12 review 3): retrieval_hybrid_rrf_oracle
    replays the BM25 scorer rather than composing the canonical
    text_bm25 twin — if either copy's constants/tokenization change
    without the other, this comparison breaks loudly instead of the
    fusion oracle silently scoring with stale formulas. DuckDB-only:
    compares the RRF entry's emitted lexical ranks against ranks
    derived from the canonical text_bm25 oracle."""
    import duckdb

    import __spark_entry__ as entry_mod
    from databricks_data_warehouse_spark.ext.similarity import (
        retrieval_hybrid_rrf_oracle,
    )

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    # canonical twin, re-ranked over the fusion's candidate width
    canonical = con.execute(
        entry_mod.oracle_sql()["text_bm25"].replace("LIMIT 20", "LIMIT 50")
    ).fetchall()
    expected_rank = {
        row[0]: i + 1 for i, row in enumerate(canonical)
    }
    fused = con.execute(retrieval_hybrid_rrf_oracle()).fetchall()
    lex_ranked = [(r[0], r[1]) for r in fused if r[1] > 0]
    assert lex_ranked, "fusion output carries no lexical ranks"
    for doc_id, r_lex in lex_ranked:
        assert expected_rank.get(doc_id) == r_lex, (
            f"doc {doc_id}: fusion r_lex={r_lex} vs canonical "
            f"{expected_rank.get(doc_id)} — the two BM25 twins drifted"
        )
