"""In-stream deduplication for at-least-once upstream sources.

The reference has no event-time windowing; its "late data" is out-of-order
LSNs handled by cursor-ordered dedup (SURVEY.md §2.6 note).  When the
upstream transport itself can replay events (e.g. a Kafka topic written
at-least-once by a Debezium connector), duplicates share the same lsn —
this helper drops them inside the stream with bounded state:

  withWatermark(ts, horizon) + dropDuplicatesWithinWatermark(keys)

State is evicted once the watermark passes an event's ts, so memory is
bounded by (event rate × horizon), independent of total stream length.
NOTE: the merge path is already idempotent for same-lsn replays (max_by is
insensitive to duplicates of the winning row), so this stage is an
optimization that shrinks shuffle volume, not a correctness requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_within_watermark(
    stream_df: DataFrame,
    keys: tuple[str, ...] = ("lsn",),
    ts_col: str = "_ab_cdc_updated_at",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop exact replays (same ``keys``) arriving within ``horizon`` of
    each other, with watermark-bounded state."""
    out = stream_df.withWatermark(ts_col, horizon)
    if hasattr(out, "dropDuplicatesWithinWatermark"):
        return out.dropDuplicatesWithinWatermark(list(keys))
    return out.dropDuplicates(list(keys))


def event_time_stats(stream_df: DataFrame, ts_col: str = "_ab_cdc_updated_at"):
    """Tumbling-window event counts with late-data tolerance — the
    watermarked aggregation shape (monitoring side-channel, not part of the
    replication path)."""
    return (
        stream_df.withWatermark(ts_col, "10 minutes")
        .groupBy(F.window(F.col(ts_col), "1 minute"))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
        )
    )
