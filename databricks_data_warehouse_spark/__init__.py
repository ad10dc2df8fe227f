"""databricks_data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch, locally-runnable Spark library with the query and
data-processing capabilities of the reference retail data warehouse
(jpedropereira/databricks_data_warehouse): medallion pipelines
(bronze ingest, silver validation + DLQ, gold aggregates, dashboard
queries), plus large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing,
streaming windows) designed for 100 TB scale.

Everything is expressed with the declarative DataFrame / Spark SQL
API so Catalyst + AQE pick physical plans; no collect-to-driver in
any hot path.
"""

__version__ = "0.1.0"
