"""Structured Streaming extensions (SURVEY.md §2.K: the reference is
batch-only; these are the additive streaming surface over ``events``)."""

from .autoloader import (
    stream_copy_into,
    stream_copy_into_oracle,
    stream_copy_into_query,
)
from .cdc_stream import (
    stream_apply_changes,
    stream_apply_changes_oracle,
    stream_apply_changes_query,
)
from .bronze_stream import (
    stream_bronze_ingest,
    stream_events_to_table,
    stream_gold_aggregate,
    stream_gold_counts_table,
)
from .dedup_stream import stream_dedup_simhash
from .table_stream import (
    stream_table_cdf,
    stream_table_cdf_oracle,
    stream_table_source,
    stream_table_source_oracle,
)
from .windows import (
    stream_click_purchase_join,
    stream_expectations,
    stream_expectations_oracle,
    stream_dedup_events,
    stream_enriched_counts,
    stream_expanding_zscore,
    stream_hourly_tumbling,
    stream_session_windows,
    stream_sliding_windows,
    stream_user_running_counts,
)

__all__ = [
    "stream_apply_changes",
    "stream_apply_changes_oracle",
    "stream_apply_changes_query",
    "stream_bronze_ingest",
    "stream_copy_into",
    "stream_copy_into_oracle",
    "stream_copy_into_query",
    "stream_events_to_table",
    "stream_gold_aggregate",
    "stream_gold_counts_table",
    "stream_dedup_simhash",
    "stream_table_cdf",
    "stream_table_cdf_oracle",
    "stream_table_source",
    "stream_table_source_oracle",
    "stream_click_purchase_join",
    "stream_expectations",
    "stream_expectations_oracle",
    "stream_dedup_events",
    "stream_enriched_counts",
    "stream_expanding_zscore",
    "stream_hourly_tumbling",
    "stream_sliding_windows",
    "stream_session_windows",
    "stream_user_running_counts",
]
