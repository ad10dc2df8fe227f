"""Medallion pipeline composition: Bronze ingestion, Silver validation
(valid/invalid split + DLQ), DLQ recovery (reference ETL layer)."""

from .bronze import bronze_ingest
from .corpus import build_training_corpus
from .dlq import recover_dlq
from .gold import build_gold
from .rollup import refresh_hourly_rollup, rollup_as_view
from .silver import DomainRule, FkRule, TypeRule, validate_to_silver

__all__ = [
    "build_training_corpus",
    "bronze_ingest",
    "recover_dlq",
    "build_gold",
    "refresh_hourly_rollup",
    "rollup_as_view",
    "validate_to_silver",
    "DomainRule",
    "FkRule",
    "TypeRule",
]
