"""Bucket-layout evolution (`LakeTable.rebucket`) — the Iceberg
partition-evolution analog for this engine's hash-bucket layout.

Contract: rebucket is one atomic commit that rewrites the table into a
new (num_buckets, files_per_bucket) layout with NO change to what
readers see — rows, tombstones, delete-wins semantics, and the naive
replay all survive; outstanding merge-on-read deltas fold in the same
pass; old versions time-travel with the layout they were written under;
and merges after the rebucket pin their reduce exchange to the NEW
layout (the bucket is a pure function of the key, recomputed per
version, never stored).
"""

from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA

from tests.util import assert_matches_replay, ev, mk_events, table_state


def _table(spark, tmp_path, name="t", **kw):
    return LakeTable.create(
        spark,
        str(tmp_path / name),
        TRANSCRIPT_SCHEMA,
        num_buckets=kw.pop("num_buckets", 4),
        **kw,
    )


def _events(n=60):
    return [
        ev(i, "c" if i <= 20 else ("d" if i % 7 == 0 else "u"),
           f"conv-{i % 6}", (i % 5))
        for i in range(1, n + 1)
    ]


def test_rebucket_preserves_state(spark, tmp_path):
    """4 → 10 buckets: same rows, same replay, new layout in stats."""
    events = _events()
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, events), batch_id=0)
    before = table_state(t.read())
    v = t.rebucket(10)
    assert v == t.version
    assert t.num_buckets == 10
    assert table_state(t.read()) == before
    assert_matches_replay(t.read(), mk_events(spark, events))
    # fpb=1: the rewrite produced exactly one file per non-empty bucket
    s = t.stats()
    assert s["max_files_per_bucket"] == 1
    assert s["buckets"] <= 10


def test_rebucket_shrink(spark, tmp_path):
    """Shrinking (8 → 3) is the same rewrite in the other direction."""
    events = _events(40)
    t = _table(spark, tmp_path, num_buckets=8)
    t.merge(mk_events(spark, events), batch_id=0)
    before = table_state(t.read())
    t.rebucket(3)
    assert t.num_buckets == 3 and table_state(t.read()) == before
    assert t.stats()["buckets"] <= 3


def test_rebucket_folds_mor_deltas(spark, tmp_path):
    """Outstanding merge-on-read deltas fold into the new layout in the
    same pass — no separate compact_deltas needed."""
    events = _events()
    t = _table(spark, tmp_path, write_mode="mor")
    batches = [events[:30], events[30:]]
    for bid, b in enumerate(batches):
        t.merge(mk_events(spark, b), batch_id=bid)
    assert t.delta_refs
    before = table_state(t.read())
    t.rebucket(9)
    assert not t.delta_refs and t.stats()["delta_files"] == 0
    assert table_state(t.read()) == before


def test_rebucket_keeps_tombstones_physical(spark, tmp_path):
    """Tombstones survive the rewrite (gc watermark contract), and
    gc_tombstones still works against the new layout."""
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0), ev(2, "c", "b", 0),
                              ev(3, "d", "a", 0)]), batch_id=0)
    t.rebucket(7)
    dead = t.read(include_deleted=True, include_meta=True).filter("_deleted")
    assert dead.count() == 1
    # a stale update below the tombstone's lsn still loses after rebucket
    t.merge(mk_events(spark, [ev(2, "u", "a", 0, text="stale")]),
            batch_id=1, validate_pk=False)
    assert ("a", 0) not in table_state(t.read())
    t.gc_tombstones(lsn_watermark=10)
    empty = t.read(include_deleted=True, include_meta=True).filter("_deleted")
    assert empty.count() == 0


def test_merges_after_rebucket_align_to_new_layout(spark, tmp_path):
    """Post-rebucket merges keep exact replay semantics and write into
    the new bucket count (bucket recomputed per version)."""
    events = _events(80)
    t = _table(spark, tmp_path, num_buckets=2)
    t.merge(mk_events(spark, events[:40]), batch_id=0)
    t.rebucket(6)
    t.merge(mk_events(spark, events[40:]), batch_id=1)
    assert_matches_replay(t.read(), mk_events(spark, events))
    # every live file sits in a bucket valid for the new layout
    assert all(e["bucket"] < 6 for e in t.live_files())
    # bucket pruning agrees with the recomputed bucket expr
    for b in range(6):
        part = t.read(buckets=[b], include_meta=True)
        recomputed = part.withColumn("_b", t.bucket_expr(part))
        assert recomputed.filter(f"_b <> {b}").count() == 0


def test_rebucket_time_travel_reads_old_layout(spark, tmp_path):
    """The pre-rebucket version still loads and reads with ITS layout."""
    events = _events(30)
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, events), batch_id=0)
    v_old = t.version
    before = table_state(t.read())
    t.rebucket(12)
    old = LakeTable.load(spark, t.path, version=v_old)
    assert old.num_buckets == 4
    assert table_state(old.read()) == before


def test_rebucket_noop_same_layout(spark, tmp_path):
    """Same (num_buckets, files_per_bucket) → no new commit."""
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, _events(10)), batch_id=0)
    v = t.version
    assert t.rebucket(4) == v and t.version == v


def test_rebucket_files_per_bucket(spark, tmp_path):
    """files_per_bucket can evolve with the bucket count (hot-bucket
    smoothing knob); the layout rollups reflect it."""
    events = _events(200)
    t = _table(spark, tmp_path, num_buckets=2)
    t.merge(mk_events(spark, events), batch_id=0)
    t.rebucket(2, files_per_bucket=3)
    assert t.snapshot["files_per_bucket"] == 3
    assert_matches_replay(t.read(), mk_events(spark, events))
    assert t.stats()["max_files_per_bucket"] <= 3
