"""S10 file-format sources, C7 offset validity, A2 table stats."""

import pytest

from pyspark.sql import functions as F

from airbyte_custom_spark.config import IngestConfig
from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.sources.files import (
    infer_event_schema,
    read_events,
    write_events,
)
from airbyte_custom_spark.sources.generator import change_events, write_event_chunks
from airbyte_custom_spark.streaming.pipeline import CdcIngestJob, StaleOffsetError

from tests.util import ev, mk_events


@pytest.mark.parametrize("fmt", ["parquet", "jsonl", "csv"])
def test_event_roundtrip(spark, tmp_path, fmt):
    events = change_events(spark, 500, n_convs=20, max_turns=5, p_delete=0.1)
    path = str(tmp_path / f"events-{fmt}")
    write_events(events, path, fmt)
    back = read_events(spark, path, fmt)
    a = {tuple(r) for r in events.select("lsn", "op", "conv_id", "turn_idx", "text").collect()}
    b = {tuple(r) for r in back.select("lsn", "op", "conv_id", "turn_idx", "text").collect()}
    assert a == b
    if fmt != "parquet":
        # Spark forbids querying ONLY _corrupt_record from raw json/csv —
        # check via full-row collect instead
        assert all(r["_corrupt_record"] is None for r in back.collect())


def test_corrupt_jsonl_lands_in_corrupt_record(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"lsn": 1, "op": "c", "conv_id": "a", "turn_idx": 0, "text": "hi"}\n'
        "this is not json at all\n"
    )
    back = read_events(spark, str(p), "jsonl")
    rows = back.collect()
    assert len(rows) == 2
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and "not json" in corrupt[0]["_corrupt_record"]


def test_schema_inference_discovery(spark, tmp_path):
    events = change_events(spark, 100, n_convs=5)
    path = str(tmp_path / "disc")
    write_events(events, path, "jsonl")
    st = infer_event_schema(spark, path, "jsonl")
    assert "lsn" in st.fieldNames() and "conv_id" in st.fieldNames()


def test_stale_offset_detection(spark, tmp_path):
    """C7: source segments purged past the applied watermark → loud error."""
    table = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=2)
    src = str(tmp_path / "seg")
    events = change_events(spark, 1000, n_convs=20)
    write_event_chunks(events.filter("lsn <= 500"), src, n_chunks=2)
    job = CdcIngestJob(spark, table.path, src, str(tmp_path / "ck"), IngestConfig())
    job.run_available_now()

    # "purge" the early segments; new source starts at lsn 800 — gap!
    src2 = str(tmp_path / "seg2")
    write_event_chunks(events.filter("lsn > 800"), src2, n_chunks=1)
    job2 = CdcIngestJob(spark, table.path, src2, str(tmp_path / "ck2"), IngestConfig())
    with pytest.raises(StaleOffsetError, match="re-backfill"):
        job2.check_source_continuity()

    # contiguous source passes
    src3 = str(tmp_path / "seg3")
    write_event_chunks(events.filter("lsn > 400"), src3, n_chunks=1)
    job3 = CdcIngestJob(spark, table.path, src3, str(tmp_path / "ck3"), IngestConfig())
    job3.check_source_continuity()


def test_table_stats(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=4)
    t.merge(mk_events(spark, [ev(i, "c", f"c{i % 4}", i) for i in range(1, 21)]), batch_id=0)
    s = t.stats()
    assert s["rows"] == 20
    assert s["files"] >= 1 and s["bytes"] > 0
    assert s["max_files_per_bucket"] == 1


def test_avro_roundtrip_or_documented_gate(spark, tmp_path):
    """S10 Avro: real roundtrip when the spark-avro module jar is present
    (cluster case); without it, read/write fail with a clear actionable
    error naming the missing jar instead of an opaque ClassNotFound."""
    import pytest

    from airbyte_custom_spark.sources.files import (
        avro_available,
        read_events,
        write_events,
    )
    from airbyte_custom_spark.sources.generator import change_events

    ev = change_events(spark, 200, n_convs=10)
    path = str(tmp_path / "ev_avro")
    if avro_available(spark):
        write_events(ev, path, fmt="avro")
        back = read_events(spark, path, fmt="avro")
        assert back.count() == 200
        assert {f.name for f in back.schema.fields} >= {"conv_id", "turn_idx", "lsn", "op"}
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            write_events(ev, path, fmt="avro")
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_events(spark, path, fmt="avro")
