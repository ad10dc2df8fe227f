"""Extensions beyond reference parity: the operations a large-scale
training-data pipeline needs — dedup (exact + near), text analysis,
similarity search over embeddings, JSON event extraction, multimodal
column plumbing, and streaming windows.

All hot paths are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen); no row-at-a-time Python UDFs.
"""
