

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
