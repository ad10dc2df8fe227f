

def test_lm_familiarity_exact_bitlength_and_ordering(spark):
    # the Spark-side base-2 bit-length must equal floor(log2(n)) for
    # every positive integer (the exactness argument the oracle relies
    # on), and repeated bigrams must score more familiar than rare ones
    from pyspark.sql import functions as F

    df = spark.range(1, 5000).select(
        "id",
        (F.length(F.conv(F.col("id").cast("string"), 10, 2)) - 1)
        .cast("long")
        .alias("bl"),
    )
    import math

    for r in df.collect():
        assert r["bl"] == int(math.floor(math.log2(r["id"])))

    from databricks_data_warehouse_spark.ext.text import lm_familiarity

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),
            (3, "zqx wvu ponm abcd eee"),
        ],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("_unused")  # not table-routed; direct call

    import tempfile, os
    tmp = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    out = {r["doc_id"]: (r["n_bigrams"], r["familiarity"])
           for r in lm_familiarity(spark, tmp).collect()}
    # docs 1 and 2 share every bigram (count 2 → familiarity 1 each);
    # doc 3's bigrams are singletons (count 1 → familiarity 0)
    assert out[1] == (5, 5) and out[2] == (5, 5)
    assert out[3] == (4, 0)
