"""Config/path registry (S12) — the reference's ``Configs.py`` (44 lines
of per-table per-layer path constants, /root/reference/src/ETL/Configs.py:3-45)
replaced with one dataclass and derivation instead of 40 globals.

The reference had a latent inconsistency between ``PATH_PREFIX`` and
``DESTINATION_PATH_PREFIX`` (Configs.py:35-36 vs :13-17) — deriving
every path from a single root makes that class of bug unrepresentable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence


@dataclass(frozen=True)
class TableConfig:
    """One logical entity across medallion layers."""

    name: str
    partition_columns: Sequence[str] = field(default_factory=tuple)
    id_columns: Sequence[str] = ("id",)
    ingestion_timestamp: str = "bronze_ingestion_time"

    def table_name(self, layer: str) -> str:
        return f"{layer}_{self.name}_table"


@dataclass(frozen=True)
class WarehouseConfig:
    """Root-derived path registry for every table and layer."""

    root: str
    database: str = "warehouse"
    tables: Sequence[TableConfig] = field(default_factory=tuple)

    _LAYERS = ("bronze", "silver", "dlq", "gold")

    def path(self, layer: str, table: str) -> str:
        if layer not in self._LAYERS:
            raise ValueError(f"unknown layer {layer!r}; expected {self._LAYERS}")
        return f"{self.root.rstrip('/')}/{layer}/{table}"

    def table(self, name: str) -> TableConfig:
        for t in self.tables:
            if t.name == name:
                return t
        raise KeyError(f"table {name!r} not registered")


# the reference's five entities with their declared layouts (SURVEY.md §1.5)
REFERENCE_TABLES = (
    TableConfig("customers", ("year", "month")),
    TableConfig("orders", ("year", "month")),
    TableConfig("addresses", ("city",)),
    TableConfig("items", ()),
    TableConfig("order_details", ("item_id",), id_columns=("order_id", "item_id")),
)
