"""Query layer: gold aggregate builders, dashboard SQL, TPC-H-style classics.

Every public function has the driver-contract signature
``fn(spark, sf_dir) -> DataFrame`` and aliases all computed columns so the
DuckDB oracle in ``__spark_entry__.py`` can hash-match values.
"""
