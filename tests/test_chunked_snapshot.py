"""S3/S4 resumable chunked snapshot: a crashed initial load resumes at the
last finished chunk — completed chunks are never re-read, and replayed
chunk merges skip via the batch manifest (reference:
`CtidStateIterator.java:1-107`, `MySqlInitialLoadRecordIterator.java:119-167`)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.sources.jdbc import chunk_predicates
from airbyte_custom_spark.sources.snapshot import (
    ChunkedSnapshotJob,
    ChunkPlanMismatchError,
)

N_ROWS = 400
CHUNK = 100


@pytest.fixture()
def snap_env(spark, tmp_path):
    # the source table being snapshot: payload rows + a numeric pk to chunk
    # on (the ctid / auto-increment pk analog)
    src = spark.range(N_ROWS).select(
        F.col("id").alias("row_id"),
        F.concat(F.lit("conv-"), (F.col("id") % 50).cast("string")).alias("conv_id"),
        (F.col("id") / 50).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )
    t = LakeTable.create(spark, str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, num_buckets=4)
    preds = chunk_predicates("row_id", 0, N_ROWS - 1, CHUNK)
    reads: list[str] = []

    def read_chunk(pred: str):
        reads.append(pred)
        return src.filter(pred).drop("row_id")

    return src, t, preds, reads, str(tmp_path / "snap_state")


def test_crash_and_resume_skips_completed_chunks(spark, snap_env):
    src, t, preds, reads, state = snap_env
    job = ChunkedSnapshotJob(
        t, lambda p: (reads.append(p), src.filter(p).drop("row_id"))[1], preds, state
    )
    job.fail_after_chunks = 2
    with pytest.raises(RuntimeError, match="injected failure"):
        job.run()
    assert reads == preds[:2]
    assert job.completed_chunks() == [0, 1]

    # resume with a FRESH job (new process analog): only incomplete chunks read
    t2 = LakeTable.load(spark, t.path)
    reads2: list[str] = []
    job2 = ChunkedSnapshotJob(
        t2, lambda p: (reads2.append(p), src.filter(p).drop("row_id"))[1], preds, state
    )
    stats = job2.run()
    assert reads2 == preds[2:]  # no re-read of completed chunks
    assert stats["chunks_completed"] == len(preds)

    final = LakeTable.load(spark, t.path).read()
    assert final.count() == N_ROWS
    got = {(r["conv_id"], r["turn_idx"], r["text"]) for r in final.collect()}
    want = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in src.drop("row_id").collect()
    }
    assert got == want


def test_lost_state_write_replays_as_manifest_skip(spark, snap_env):
    """Crash AFTER a chunk's table commit but BEFORE its state-file write:
    the chunk is re-read on resume but its merge skips via the batch
    manifest — no duplicate rows, no extra table version."""
    src, t, preds, reads, state = snap_env
    job = ChunkedSnapshotJob(
        t, lambda p: (reads.append(p), src.filter(p).drop("row_id"))[1], preds, state
    )
    job.run()
    v_done = LakeTable.load(spark, t.path).version
    # simulate the lost state write for the final chunk
    sp = os.path.join(state, "chunks.json")
    st = json.load(open(sp))
    st["completed"] = st["completed"][:-1]
    json.dump(st, open(sp, "w"))

    reads2: list[str] = []
    job2 = ChunkedSnapshotJob(
        LakeTable.load(spark, t.path),
        lambda p: (reads2.append(p), src.filter(p).drop("row_id"))[1],
        preds,
        state,
    )
    job2.run()
    assert reads2 == [preds[-1]]  # one redundant read, by design
    after = LakeTable.load(spark, t.path)
    assert after.version == v_done  # merge skipped — no new commit
    assert after.read().count() == N_ROWS


def test_changed_chunk_plan_refuses_resume(spark, snap_env):
    src, t, preds, reads, state = snap_env
    job = ChunkedSnapshotJob(
        t, lambda p: (reads.append(p), src.filter(p).drop("row_id"))[1], preds, state
    )
    job.fail_after_chunks = 1
    with pytest.raises(RuntimeError, match="injected failure"):
        job.run()
    other = chunk_predicates("row_id", 0, N_ROWS - 1, CHUNK * 2)
    job2 = ChunkedSnapshotJob(
        LakeTable.load(spark, t.path),
        lambda p: src.filter(p).drop("row_id"),
        other,
        state,
    )
    with pytest.raises(ChunkPlanMismatchError):
        job2.run()
