"""delete_where (predicate tombstones as CDC) and apply_changes (the
replica half of changes_since): ordering, idempotency, and propagation."""

from pyspark.sql import functions as F

from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.sources.generator import change_events


def _table(spark, tmp_path, name="t", **kw):
    return LakeTable.create(
        spark, str(tmp_path / name), TRANSCRIPT_SCHEMA, num_buckets=4, **kw
    )


def test_delete_where_purges_only_matching_live_rows(spark, tmp_path):
    t = _table(spark, tmp_path)
    ev = change_events(spark, 3000, n_convs=40, seed=21)
    t.merge(ev, batch_id=0)
    before = t.read()
    n_tool = before.filter("role = 'tool'").count()
    assert n_tool > 0
    r = t.delete_where("role = 'tool'", batch_id=1)
    assert not r.skipped
    after = t.read()
    assert after.filter("role = 'tool'").count() == 0
    assert after.count() == before.count() - n_tool
    # non-matching rows are untouched, byte for byte
    keep = before.filter("role IS DISTINCT FROM 'tool'")
    assert sorted(after.collect()) == sorted(keep.collect())


def test_delete_where_wins_over_stale_inflight_update(spark, tmp_path):
    """The purge tombstone sits one LSN above the table watermark, so a
    stale update (lsn at/below the watermark) arriving AFTER the purge
    must not resurrect the key — same delete-wins discipline as T5."""
    t = _table(spark, tmp_path)
    ev = change_events(spark, 2000, n_convs=30, seed=22)
    hi = ev.agg(F.max("lsn")).first()[0]
    t.merge(ev, batch_id=0)
    victim = t.read().filter("role = 'tool'").orderBy("conv_id", "turn_idx").first()
    t.delete_where("role = 'tool'", batch_id=1)
    stale = spark.createDataFrame(
        [(victim["conv_id"], victim["turn_idx"], "tool", "resurrected!", None, None)],
        TRANSCRIPT_SCHEMA,
    ).select("*", F.lit(int(hi)).alias("lsn"), F.lit("u").alias("op"))
    t.merge(stale, batch_id=2)
    assert (
        t.read()
        .filter(
            (F.col("conv_id") == victim["conv_id"])
            & (F.col("turn_idx") == victim["turn_idx"])
        )
        .count()
        == 0
    ), "stale update resurrected a purged key"


def test_delete_where_propagates_to_replica(spark, tmp_path):
    t = _table(spark, tmp_path, "primary")
    replica = _table(spark, tmp_path, "replica")
    ev = change_events(spark, 2000, n_convs=30, seed=23)
    v1 = t.merge(ev, batch_id=0).version
    replica.apply_changes(t.changes_since(0), batch_id=0)
    t.delete_where("role = 'tool'", batch_id=1)
    feed = t.changes_since(v1)
    assert feed.filter("change_op = 'd'").count() > 0
    replica.apply_changes(feed, batch_id=1)
    assert sorted(replica.read().collect()) == sorted(t.read().collect())


def test_apply_changes_is_idempotent_and_order_insensitive(spark, tmp_path):
    t = _table(spark, tmp_path, "primary")
    ev = change_events(spark, 2000, n_convs=30, seed=24)
    hi = ev.agg(F.max("lsn")).first()[0]
    v1 = t.merge(ev.filter(F.col("lsn") <= hi // 2), batch_id=0).version
    t.merge(ev.filter(F.col("lsn") > hi // 2), batch_id=1)
    full = t.changes_since(0)
    tail = t.changes_since(v1)
    # replica A: full feed, then the overlapping tail again; replica B:
    # tail first (out of order), then the full feed — both converge
    a = _table(spark, tmp_path, "a")
    a.apply_changes(full, batch_id=0)
    a.apply_changes(tail, batch_id=1)
    b = _table(spark, tmp_path, "b")
    b.apply_changes(tail, batch_id=0)
    b.apply_changes(full, batch_id=1)
    want = sorted(t.read().collect())
    assert sorted(a.read().collect()) == want
    assert sorted(b.read().collect()) == want


def test_delete_where_null_predicate_rows_stay(spark, tmp_path):
    t = _table(spark, tmp_path)
    ev = change_events(spark, 1500, n_convs=20, seed=25)
    t.merge(ev, batch_id=0)
    n_null_tool = t.read().filter("tool IS NULL").count()
    assert n_null_tool > 0
    t.delete_where("tool = 'tool_1'", batch_id=1)
    # NULL tool doesn't match the predicate (SQL semantics) — stays live
    assert t.read().filter("tool IS NULL").count() == n_null_tool
    assert t.read().filter("tool = 'tool_1'").count() == 0
