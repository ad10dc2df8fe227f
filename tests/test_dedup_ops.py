

def test_containment_catches_doc_in_doc_that_jaccard_misses(spark, tmp_path):
    """A paragraph pasted into a much longer page: containment(small→big)
    ≈ 1.0 while Jaccard ≈ |small|/|big| stays far below any usable
    threshold — the asymmetric case ngram_containment_pairs exists for."""
    import os
    from databricks_data_warehouse_spark.ext.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    para = " ".join(f"tok{i} tok{i+1}" for i in range(0, 40, 2))
    page = para + " " + " ".join(f"filler{i} pad{i}" for i in range(200))
    other = " ".join(f"unrelated{i}" for i in range(60))
    docs = spark.createDataFrame(
        [
            ("small", "en", "web", para),
            ("big", "en", "web", page),
            ("other", "en", "web", other),
        ],
        "doc_id string, lang string, source string, text string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))

    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in ngram_containment_pairs(spark, sf).collect()
    }
    assert ("small", "big") in cont and cont[("small", "big")] >= 0.9
    # the big page is NOT contained in the paragraph
    assert ("big", "small") not in cont
    # symmetric Jaccard never surfaces the pair at its threshold
    jac = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, sf).collect()}
    assert ("big", "small") not in jac and ("small", "big") not in jac


def test_semantic_dedup_keeps_canonical_per_cluster(spark, tmp_path):
    """Synthetic embedding corpus with two exact near-dup groups and
    singletons: semantic_dedup must keep exactly the min vec_id of
    each group plus every singleton."""
    import os

    from databricks_data_warehouse_spark.ext.similarity import semantic_dedup

    def v(*xs):
        return [float(x) for x in xs]

    # 20 base vectors (ids 0..19 include the 16 centroid seeds); ids
    # 20/21 duplicate vec 2's direction, id 22 duplicates vec 5's.
    rows = []
    for i in range(20):
        base = [0.0] * 8
        base[i % 8] = 1.0
        base[(i * 3) % 8] += 0.25 * (i + 1)
        rows.append((i, f"l{i % 3}", v(*base)))
    dup_of_2 = [x * 2.0 for x in rows[2][2]]  # same direction as vec 2
    rows.append((20, "l0", dup_of_2))
    rows.append((21, "l1", [x * 0.5 for x in rows[2][2]]))
    rows.append((22, "l2", [x * 3.0 for x in rows[5][2]]))
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    )
    sf = str(tmp_path / "sf_sem")
    os.makedirs(sf, exist_ok=True)
    emb.write.parquet(os.path.join(sf, "embeddings.parquet"))

    survivors = {
        r.vec_id
        for r in semantic_dedup(spark, sf, threshold=0.999).collect()
    }
    # clusters: {2,20,21} and {5,22} (explicit scaled copies) plus
    # {0,8,16} and {4,12} (the base construction makes i and i+8
    # collinear when 2i % 8 == 0) — each keeps its min member
    assert 2 in survivors and 5 in survivors
    assert {20, 21, 22}.isdisjoint(survivors)
    assert survivors == set(range(20)) - {8, 12, 16}
