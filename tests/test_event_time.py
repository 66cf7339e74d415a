"""Watermarked event-time rollup (`streaming/dedup.py::event_time_stats`):
streaming (multi-batch, update mode) ≡ batch GROUP BY time-bucket; rows
later than the watermark horizon are dropped with bounded state."""

from datetime import datetime, timezone

from pyspark.sql import Window, functions as F

from airbyte_custom_spark.schema import CDC_EVENT_SCHEMA
from airbyte_custom_spark.sources.generator import change_events, write_event_chunks
from airbyte_custom_spark.streaming.dedup import event_time_stats


def _latest_per_key(df, keys):
    w = Window.partitionBy(*keys).orderBy(F.desc("events"))
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    )


def test_streaming_rollup_matches_batch_groupby(spark, tmp_path):
    """4 micro-batches of watermarked hourly rollup, latest update per
    (window, op) ≡ one batch GROUP BY."""
    ev = change_events(spark, 4000, n_convs=100, max_turns=10, p_delete=0.1)
    src = str(tmp_path / "wal")
    write_event_chunks(ev, src, n_chunks=4)
    stream = (
        spark.readStream.schema(CDC_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        event_time_stats(stream, window="1 hour", horizon="2 hours", by_op=True)
        .writeStream.format("memory")
        .queryName("rollup")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _latest_per_key(spark.table("rollup"), ["ws", "op"])
    want = event_time_stats(ev, window="1 hour", horizon="2 hours", by_op=True)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_late_rows_beyond_horizon_are_dropped(spark, tmp_path):
    """A row arriving more than `horizon` behind the watermark is excluded
    from its window (bounded-state semantics): batch 1 advances the
    watermark, batch 2's too-old row changes nothing."""
    import glob
    import os
    import shutil

    src = str(tmp_path / "wal")

    def seg(rows, name):
        df = spark.createDataFrame(
            rows, "lsn long, op string, ts string"
        ).select(
            "lsn", "op",
            F.to_timestamp("ts").alias("_ab_cdc_updated_at"),
            F.lit(None).cast("timestamp").alias("_ab_cdc_deleted_at"),
            F.lit("c1").alias("conv_id"), F.lit(0).alias("turn_idx"),
            F.lit("user").alias("role"), F.lit("t").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.to_timestamp("ts").alias("ts"),
            F.lit(0).alias("source_partition"),
        ).select(*[f.name for f in CDC_EVENT_SCHEMA.fields])
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(stage)
        os.makedirs(src, exist_ok=True)
        (part,) = glob.glob(stage + "/part-*.parquet")
        shutil.move(part, os.path.join(src, f"{name}.parquet"))

    out_dir = str(tmp_path / "out")

    def run(name):
        # memory sink can't recover a checkpoint across runs
        stream = spark.readStream.schema(CDC_EVENT_SCHEMA).parquet(src)
        q = (
            event_time_stats(stream, window="1 hour", horizon="10 minutes")
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    # batch 1: two rows at 12:00-13:00 → watermark advances to 12:50
    seg([(1, "c", "2024-06-01 12:00:00"), (2, "c", "2024-06-01 13:00:00")],
        "seg0")
    out1 = _latest_per_key(run("wm1"), ["ws"]).collect()
    noon = datetime(2024, 6, 1, 12, 0, tzinfo=timezone.utc)
    counts1 = {r["ws"].astimezone(timezone.utc): r["events"] for r in out1}
    assert counts1[noon] == 1

    # batch 2: a row at 11:30 — 80 min behind the 12:50 watermark → DROPPED
    # (a fresh on-time row rides along so the batch itself emits)
    seg([(3, "c", "2024-06-01 11:30:00"), (4, "c", "2024-06-01 13:10:00")],
        "seg1")
    out2 = _latest_per_key(run("wm2"), ["ws"]).collect()
    counts2 = {r["ws"].astimezone(timezone.utc): r["events"] for r in out2}
    eleven = datetime(2024, 6, 1, 11, 0, tzinfo=timezone.utc)
    assert eleven not in counts2          # late row never created its window
    assert counts2[noon] == 1             # and didn't inflate an existing one


def test_session_windows_merge_across_micro_batches(spark, tmp_path):
    """One conversation's session arrives split across micro-batches (one
    file per trigger); the complete-mode result must hold ONE merged
    session per gap-chain — identical to running session_stats in batch."""
    from datetime import datetime, timezone

    from airbyte_custom_spark.streaming.dedup import session_stats

    def t(h):
        return datetime(2026, 1, 1, h, tzinfo=timezone.utc)

    rows = [
        # conv A: hours 0,1,2 chain (gap 90 min) -> one session of 3
        (1, "u", "A", t(0)), (2, "u", "A", t(1)), (3, "u", "A", t(2)),
        # conv A: hour 9 -> second session (gap from 2h is 7h >= 90min)
        (4, "u", "A", t(9)),
        # conv B: single event
        (5, "c", "B", t(5)),
    ]
    df = spark.createDataFrame(
        [(lsn, op, c, ts) for lsn, op, c, ts in rows],
        "lsn long, op string, conv_id string, _ab_cdc_updated_at timestamp",
    )
    src = str(tmp_path / "wal")
    # one event per file => one event per micro-batch: sessions MUST merge
    # across triggers, not within one
    df.repartition(len(rows), "lsn").write.parquet(src)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        session_stats(stream, gap="90 minutes", horizon="30 days")
        .writeStream.format("memory")
        .queryName("sessmerge")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.conv_id, r.events, r.min_lsn, r.max_lsn)
        for r in spark.table("sessmerge").collect()
    )
    assert got == [("A", 1, 4, 4), ("A", 3, 1, 3), ("B", 1, 5, 5)]
    want = sorted(
        (r.conv_id, r.events, r.min_lsn, r.max_lsn)
        for r in session_stats(df, gap="90 minutes").collect()
    )
    assert got == want
