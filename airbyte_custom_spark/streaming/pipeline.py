"""The streaming CDC ingest job: binlog-segment tail → validate → reduce →
MERGE, checkpointed and exactly-once (SURVEY.md §3 "Our Spark lifecycle").

Replaces three reference layers at once:
  * source read loop + STATE checkpoints (`AbstractDbSource.java:349-464`,
    `DebeziumStateDecoratingIterator.java:126-172`) → Structured Streaming
    checkpoint (offsets/ + commits/ under checkpoint_dir);
  * destination buffered/async consumer (`BufferedStreamConsumer.java:
    185-328`, `AsyncStreamConsumer.java:104-155`) → foreachBatch;
  * typing+dedup transaction (`DefaultTyperDeduper.java:100-286`) →
    LakeTable.merge per micro-batch.

Exactly-once: Structured Streaming replays the last uncommitted batch_id
after a crash; LakeTable's per-query batch manifest turns the replay into a
no-op (the pending→flushed→committed watermark of
`GlobalAsyncStateManager.java:34-160`, collapsed into one atomic commit).

Bounded runs use ``availableNow`` — the analog of the reference's
target-position stop (`MySqlCdcTargetPosition.java:72-104`): capture what
exists at start, drain it, stop.  An explicit ``target_lsn`` additionally
filters events beyond a fixed LSN (`DebeziumRecordIterator.java:112-141`).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from airbyte_custom_spark.config import IngestConfig
from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.operators.dedupe import (
    latest_by_reduce,
    salted_latest,
    validate_primary_keys,
)
from airbyte_custom_spark.schema import CDC_EVENT_SCHEMA
from airbyte_custom_spark.streaming.metrics import (
    BatchMetrics,
    BatchMetricsLog,
    lineage_stats,
)


class CdcIngestJob:
    """Tail a directory of binlog-segment parquet files into a LakeTable.

    In production the source would be `spark.readStream.format("kafka")`
    over a Debezium topic; the file tail has identical semantics (ordered
    segments, offset tracking, replay on restart) and is what the sandbox
    can exercise.  Only the ``_source_stream`` method would change.
    """

    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        source_dir: str,
        checkpoint_dir: str,
        config: IngestConfig | None = None,
        target_lsn: int | None = None,
    ):
        self.spark = spark
        self.table_path = table_path
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.config = config or IngestConfig()
        self.target_lsn = target_lsn
        self.metrics = BatchMetricsLog(
            path=os.path.join(checkpoint_dir, "metrics", "batches.jsonl")
        )
        # test hook: raise after N batches to simulate a crash
        self.fail_after_batches: int | None = None
        self._batches_run = 0

    # ------------------------------------------------------------ source

    def _source_stream(self) -> DataFrame:
        reader = self.spark.readStream.schema(CDC_EVENT_SCHEMA)
        if self.config.max_files_per_trigger:
            # micro-batch size bound — the reference's 10k-event queue cap
            # (`AirbyteDebeziumHandler.java:41-45`) analog
            reader = reader.option(
                "maxFilesPerTrigger", str(self.config.max_files_per_trigger)
            )
        return reader.parquet(self.source_dir)

    # ------------------------------------------------------- batch apply

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        start = time.monotonic()
        self._batches_run += 1
        if self.fail_after_batches is not None and self._batches_run > self.fail_after_batches:
            raise RuntimeError(f"injected failure before batch {batch_id}")

        # reload: each batch merges against the latest committed snapshot
        table = LakeTable.load(self.spark, self.table_path)
        qid = self.config.query_id
        if batch_id <= table.last_committed_batch(qid):
            self.metrics.record(
                BatchMetrics(batch_id=batch_id, events=0, seconds=0.0, skipped=True)
            )
            return

        events = batch_df
        if self.target_lsn is not None:
            events = events.filter(F.col("lsn") <= F.lit(self.target_lsn))
        # validate + lineage + merge each trigger a job over the batch —
        # cache it so the source files are read once per micro-batch
        events = events.persist()
        try:
            if self.config.validate_pk:
                validate_primary_keys(events, table.primary_key)
            lineage = lineage_stats(events) if self.config.record_lineage else None
            if self.config.salt_buckets > 1:
                reduced = salted_latest(
                    events,
                    table.primary_key,
                    order_col="lsn",
                    salt_buckets=self.config.salt_buckets,
                )
            else:
                reduced = latest_by_reduce(events, table.primary_key, order_col="lsn")

            result = table.merge(
                reduced,
                batch_id=batch_id,
                query_id=qid,
                assume_reduced=True,
                lineage=lineage,
                validate_pk=False,  # already validated above on the raw batch
            )
        finally:
            events.unpersist()
        elapsed = time.monotonic() - start
        n = sum(p["events"] for p in lineage) if lineage else -1
        self.metrics.record(
            BatchMetrics(
                batch_id=batch_id,
                events=n,
                seconds=elapsed,
                skipped=result.skipped,
                version=result.version,
                touched_buckets=len(result.touched_buckets),
            )
        )

    # --------------------------------------------------------------- runs

    def run_available_now(self, timeout_sec: int = 600) -> BatchMetricsLog:
        """Bounded tail: drain everything present at start, then stop —
        the target-position bounded run (S7/C3)."""
        q = (
            self._source_stream()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
        # surface foreachBatch exceptions (awaitTermination(timeout) swallows)
        if q.exception() is not None:
            raise RuntimeError(str(q.exception()))
        return self.metrics

    def start(self, processing_time: str = "1 second"):
        """Continuous tail (unbounded); caller manages the query handle."""
        return (
            self._source_stream()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=processing_time)
            .start()
        )


def backfill(
    spark: SparkSession,
    table: LakeTable,
    snapshot_df: DataFrame,
    lsn: int = 0,
    mode: str = "overwrite",
) -> int:
    """Phase 1 of snapshot→tail composition (S8,
    `MySqlInitialReadUtil.java:87-169`): load the initial table state as
    synthetic insert events at a base LSN, so the subsequent CDC tail
    (all lsn > base) wins any overlap.  ``snapshot_df`` carries payload
    columns only."""
    events = (
        snapshot_df.withColumn("lsn", F.lit(lsn).cast("long"))
        .withColumn("op", F.lit("c"))
    )
    if mode == "overwrite":
        return table.overwrite(events)
    return table.merge(events, assume_reduced=False).version
