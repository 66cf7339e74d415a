"""GLOBAL-state CDC (`airbyte-protocol.md:485-506`): one WAL position /
one checkpoint feeding multiple stream tables, exactly-once per stream
even when a crash lands between per-stream merges of one batch."""

import pytest
from pyspark.sql import functions as F

from airbyte_custom_spark.config import IngestConfig
from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.sources.generator import change_events, write_event_chunks
from airbyte_custom_spark.streaming.pipeline import GlobalStateIngestJob

from tests.util import assert_matches_replay


@pytest.fixture()
def multi_env(spark, tmp_path):
    # one "binlog" carrying two tables' changes, discriminated by `stream`
    ev = change_events(spark, 4000, n_convs=60, max_turns=8, p_delete=0.1)
    tagged = ev.withColumn(
        "stream", F.when(F.col("lsn") % 2 == 0, "chats").otherwise("emails")
    )
    src = str(tmp_path / "wal")
    write_event_chunks(tagged, src, n_chunks=4)
    paths = {}
    for s in ("chats", "emails"):
        p = str(tmp_path / f"tbl_{s}")
        LakeTable.create(spark, p, TRANSCRIPT_SCHEMA, num_buckets=4)
        paths[s] = p
    return tagged, src, paths, str(tmp_path / "ckpt")


def test_two_streams_one_checkpoint(spark, multi_env):
    tagged, src, paths, ckpt = multi_env
    job = GlobalStateIngestJob(
        spark, paths, src, ckpt, IngestConfig(max_files_per_trigger=2)
    )
    job.run_available_now()
    for s, p in paths.items():
        expect = tagged.filter(F.col("stream") == s).drop("stream")
        assert_matches_replay(LakeTable.load(spark, p).read(), expect)


def test_global_apply_is_single_pass_and_counts_rows(spark, multi_env, monkeypatch):
    """Round-3 fix: N streams must NOT mean N scans of the micro-batch —
    the batch persists once (DISK_ONLY) and every per-stream slice reads
    the cached copy; BatchMetrics.events counts ROWS merged, not streams
    (the round-2 metric bug)."""
    from airbyte_custom_spark.plans.inspect import explain_str

    tagged, src, paths, ckpt = multi_env
    job = GlobalStateIngestJob(spark, paths, src, ckpt, IngestConfig())
    slice_plans = []
    orig = LakeTable.merge

    def spy(self, df, *a, **kw):
        slice_plans.append(explain_str(df, "simple"))
        return orig(self, df, *a, **kw)

    monkeypatch.setattr(LakeTable, "merge", spy)
    job.run_available_now()
    assert len(slice_plans) == 2
    for plan in slice_plans:
        assert "InMemoryTableScan" in plan, plan
    assert job.metrics.total_events == tagged.count()


def test_crash_between_stream_merges_is_exactly_once(spark, multi_env):
    tagged, src, paths, ckpt = multi_env
    job = GlobalStateIngestJob(
        spark, paths, src, ckpt, IngestConfig(max_files_per_trigger=1)
    )
    job.fail_after_batches = 2
    with pytest.raises(Exception, match="injected failure"):
        job.run_available_now()
    # restart from the same global checkpoint: replayed batches skip on the
    # streams that already committed, apply on the rest
    job2 = GlobalStateIngestJob(
        spark, paths, src, ckpt, IngestConfig(max_files_per_trigger=1)
    )
    job2.run_available_now()
    for s, p in paths.items():
        expect = tagged.filter(F.col("stream") == s).drop("stream")
        assert_matches_replay(LakeTable.load(spark, p).read(), expect)
