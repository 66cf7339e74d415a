"""Raw-JSON envelope ingest (`JsonCdcIngestJob`): Arrow-based per-batch
schema inference, mid-stream ADD-column evolution, typed extraction with
per-row cast-error capture — the reference's raw `_airbyte_data` →
typed+deduped flow (`typing-deduping.md:5-70`) as one streaming job."""

import pytest
from pyspark.sql import functions as F

from airbyte_custom_spark.config import IngestConfig
from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.sources.generator import (
    change_events,
    json_envelope,
    write_event_chunks,
)
from airbyte_custom_spark.streaming.pipeline import JsonCdcIngestJob

from tests.util import assert_matches_replay


def test_json_ingest_matches_typed_replay(spark, tmp_path):
    """The JSON roundtrip (typed → to_json → infer/extract/cast → merge)
    produces the exact final state the typed pipeline produces."""
    events = change_events(spark, 4000, n_convs=60, max_turns=8, p_delete=0.1)
    src = str(tmp_path / "wal")
    write_event_chunks(json_envelope(events), src, n_chunks=4)
    t = LakeTable.create(spark, str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, num_buckets=4)
    job = JsonCdcIngestJob(
        spark, t.path, src, str(tmp_path / "ckpt"), IngestConfig(max_files_per_trigger=2)
    )
    job.run_available_now()
    assert_matches_replay(LakeTable.load(spark, t.path).read(), events)


def test_json_ingest_evolves_new_column_mid_stream(spark, tmp_path):
    """A column that first appears in a later batch evolves the table in
    place (E1): earlier rows read NULL for it, later rows carry values —
    no restart, no manual DDL."""
    base = change_events(spark, 1500, n_convs=100, max_turns=10, p_delete=0.0)
    first = base.filter("lsn <= 700")
    second = base.filter("lsn > 700").withColumn(
        "sentiment", F.concat(F.lit("s"), (F.col("lsn") % 3).cast("string"))
    )
    src1, src2 = str(tmp_path / "wal1"), str(tmp_path / "wal2")
    write_event_chunks(json_envelope(first), src1, n_chunks=2)
    write_event_chunks(json_envelope(second), src2, n_chunks=2)
    t = LakeTable.create(spark, str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, num_buckets=4)
    for i, src in enumerate((src1, src2)):
        job = JsonCdcIngestJob(
            spark, t.path, src, str(tmp_path / f"ckpt{i}"), IngestConfig()
        )
        job.run_available_now()
    final = LakeTable.load(spark, t.path)
    assert "sentiment" in final.payload_columns
    rows = final.read().collect()
    old = [r for r in rows if r["sentiment"] is None]
    new = [r for r in rows if r["sentiment"] is not None]
    assert old and new
    for r in new:
        assert r["sentiment"].startswith("s")


def test_json_ingest_captures_cast_errors_per_row(spark, tmp_path):
    """A payload value that fails its cast lands as NULL with an entry in
    _meta.errors — the row is kept, the sync never fails (P3/P4,
    `typing-deduping.md:14-33`)."""
    rows = [
        (1, "c", '{"conv_id": "a", "turn_idx": 0, "role": "user", "text": "hi", "ts": "2024-01-01T00:00:00Z"}'),
        (2, "c", '{"conv_id": "a", "turn_idx": 1, "role": "user", "text": "bad ts", "ts": "not-a-date"}'),
    ]
    ev = spark.createDataFrame(rows, "lsn long, op string, payload string").select(
        "lsn", "op",
        F.lit(None).cast("timestamp").alias("_ab_cdc_updated_at"),
        F.lit(None).cast("timestamp").alias("_ab_cdc_deleted_at"),
        F.lit(0).alias("source_partition"),
        "payload",
    )
    src = str(tmp_path / "wal")
    ev.coalesce(1).write.parquet(src)
    t = LakeTable.create(spark, str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, num_buckets=2)
    job = JsonCdcIngestJob(spark, t.path, src, str(tmp_path / "ckpt"), IngestConfig())
    job.run_available_now()
    got = {
        r["turn_idx"]: r
        for r in LakeTable.load(spark, t.path)
        .read(include_meta=True)
        .collect()
    }
    assert got[0]["ts"] is not None and not (got[0]["_meta"]["errors"] or [])
    assert got[1]["ts"] is None
    assert any("ts" in e for e in got[1]["_meta"]["errors"])
