"""C10 liveness monitoring: a dead/silent source must stop the stream and
raise, not idle forever (`DebeziumRecordIterator.java:93-110` empty-poll
shutdown, FIXTURES.md stalled-source scenario)."""

import pytest

from airbyte_custom_spark.config import IngestConfig
from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.sources.generator import change_events, write_event_chunks
from airbyte_custom_spark.streaming.liveness import (
    LivenessWatchdog,
    StalledStreamError,
)
from airbyte_custom_spark.streaming.pipeline import CdcIngestJob


def test_stalled_source_raises(spark, tmp_path):
    """Source directory never receives a file → watchdog stops the query
    and raises within the stall budget (never the outer timeout)."""
    src = tmp_path / "src"
    src.mkdir()
    table = LakeTable.create(spark, str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, num_buckets=2)
    job = CdcIngestJob(
        spark, table.path, str(src), str(tmp_path / "ckpt"),
        IngestConfig(validate_pk=False),
    )
    with pytest.raises(StalledStreamError):
        job.run_continuous(
            timeout_sec=120,
            processing_time="100 milliseconds",
            max_empty_polls=3,
            stall_after_sec=20,
        )


def test_live_source_not_flagged_then_stalls_after_drain(spark, tmp_path):
    """A source that HAS data processes it fully (no stall during progress),
    then trips the watchdog once drained and silent — mirroring the
    reference's first-record/subsequent-record wait distinction."""
    events = change_events(spark, 500, n_convs=10, max_turns=4)
    src = str(tmp_path / "segments")
    write_event_chunks(events, src, n_chunks=2)
    table = LakeTable.create(spark, str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, num_buckets=2)
    job = CdcIngestJob(
        spark, table.path, src, str(tmp_path / "ckpt"),
        IngestConfig(validate_pk=False),
    )
    with pytest.raises(StalledStreamError):
        job.run_continuous(
            timeout_sec=180,
            processing_time="100 milliseconds",
            max_empty_polls=5,
            stall_after_sec=30,
        )
    # the data was fully applied before the stall fired
    t = LakeTable.load(spark, table.path)
    assert t.read().count() > 0
    assert job.metrics.total_events == 500


def test_watchdog_counts_and_resets():
    wd = LivenessWatchdog(max_empty_polls=3)

    class _Prog:
        def __init__(self, qid, rows):
            self.progress = type("P", (), {"id": qid, "numInputRows": rows})()

    wd._empty["q"] = 0
    wd.onQueryProgress(_Prog("q", 0))
    wd.onQueryProgress(_Prog("q", 0))
    assert not wd.is_stalled("q")
    wd.onQueryProgress(_Prog("q", 10))  # data resets the counter
    assert wd.empty_polls("q") == 0
    for _ in range(3):
        wd.onQueryProgress(_Prog("q", 0))
    assert wd.is_stalled("q")
