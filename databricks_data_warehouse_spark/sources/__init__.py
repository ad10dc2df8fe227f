"""Sources & sinks: parquet-backed managed tables with MERGE emulation,
and the testdata catalog loader."""

from databricks_data_warehouse_spark.sources.catalog import TABLE_NAMES, load_tables, register_views
from databricks_data_warehouse_spark.sources.tables import ManagedTable

__all__ = ["ManagedTable", "load_tables", "register_views", "TABLE_NAMES"]
