"""Watermark-bounded in-stream dedup + windowed event-time stats."""

from airbyte_custom_spark.sources.generator import change_events, write_event_chunks
from airbyte_custom_spark.streaming.dedup import dedup_within_watermark, event_time_stats


def _streamed(spark, tmp_path, df, fn, query_name, mode="append"):
    # NB: append-mode window aggs only emit windows the watermark has
    # passed — the final window never closes in a bounded run, so the
    # stats test uses complete mode.
    src = str(tmp_path / "src")
    write_event_chunks(df, src, n_chunks=2)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {query_name}")


def test_in_stream_dedup_drops_replays(spark, tmp_path):
    events = change_events(spark, 1000, n_convs=30)
    doubled = events.unionByName(events)  # at-least-once transport replay
    out = _streamed(spark, tmp_path, doubled, dedup_within_watermark, "dedup_out")
    assert out.count() == 1000
    assert out.select("lsn").distinct().count() == 1000


def test_event_time_window_stats(spark, tmp_path):
    events = change_events(spark, 600, n_convs=10)  # 1 event/sec → 10 windows
    out = _streamed(spark, tmp_path, events, event_time_stats, "win_out", mode="complete")
    rows = out.collect()
    assert sum(r["events"] for r in rows) == 600
    for r in rows:
        assert r["min_lsn"] <= r["max_lsn"]
