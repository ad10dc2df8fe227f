"""dedup_cap_report: exact dropped-mass accounting when the caps BIND
(VERDICT r06 item 5 — the no-silent-truncation observable for
_MAX_BAND_BUCKET and _MAX_GRAM_DF).

Synthetic corpus with hand-computable key spaces:
- 5 identical docs ("alpha beta gamma delta") — one signature, so 4
  band keys each holding all 5 docs, and 3 bigrams each with df=5;
- 2 unique docs ("one two three", "four five") — 4 singleton band keys
  each, and 2+1 singleton bigrams.
With caps at 3: every group-A key is dropped, every group-B key kept.
"""

from pyspark.sql import Row

from databricks_data_warehouse_spark.ext.dedup import dedup_cap_report


def _corpus(spark, tmp_path):
    rows = [
        Row(doc_id=i, lang="en", source="s", text="alpha beta gamma delta")
        for i in range(5)
    ] + [
        Row(doc_id=5, lang="en", source="s", text="one two three"),
        Row(doc_id=6, lang="en", source="s", text="four five"),
    ]
    sf_dir = tmp_path / "corpus"
    spark.createDataFrame(rows).coalesce(1).write.parquet(
        str(sf_dir / "documents.parquet")
    )
    return str(sf_dir)


def test_cap_report_exact_when_binding(spark, tmp_path):
    sf_dir = _corpus(spark, tmp_path)
    rows = {
        r.cap: r
        for r in dedup_cap_report(
            spark, sf_dir, max_bucket=3, max_df=3
        ).collect()
    }
    b = rows["band_bucket"]
    # 5 identical docs: 4 shared band keys (kn=5, dropped); 2 unique
    # docs: 8 singleton keys (kept)
    assert b.threshold == 3
    assert b.keys_total == 12
    assert b.keys_dropped == 4
    assert b.postings_total == 7 * 4
    assert b.postings_dropped == 5 * 4
    assert b.docs_affected == 5
    g = rows["gram_df"]
    # group A: 3 bigrams x df 5 (dropped); group B: 3 singleton bigrams
    assert g.keys_total == 6
    assert g.keys_dropped == 3
    assert g.postings_total == 15 + 3
    assert g.postings_dropped == 15
    assert g.docs_affected == 5


def test_cap_report_all_zero_when_not_binding(spark, tmp_path):
    sf_dir = _corpus(spark, tmp_path)
    for r in dedup_cap_report(spark, sf_dir, max_bucket=10, max_df=10).collect():
        assert r.keys_dropped == 0
        assert r.postings_dropped == 0
        assert r.docs_affected == 0
        assert r.keys_total > 0 and r.postings_total > 0
