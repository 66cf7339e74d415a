"""changes_since at scale: the changed-key set broadcasts ONLY when the
manifest rollups bound it under the threshold; above it both joins fall
back to shuffled sort-merge (a replica catching up across a wide version
gap must not force-broadcast billions of keys).  Either way the
old-version liveness scan is pruned to the touched buckets, and the two
paths are value-identical.  Also: LSN monotonicity of delete_where after
gc_tombstones, and the snapshot-descriptor exclusive-create commit lock
(rollback racing a staged WAP merge)."""

import json
import os

from pyspark.sql import functions as F
import pytest

from airbyte_custom_spark.lake.table import ConcurrentCommitError, LakeTable
from airbyte_custom_spark.plans.inspect import explain_str
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.sources.generator import change_events


def _table(spark, tmp_path, name="t", **kw):
    kw.setdefault("num_buckets", 8)
    return LakeTable.create(spark, str(tmp_path / name), TRANSCRIPT_SCHEMA, **kw)


def _two_version_table(spark, tmp_path):
    """v1 = broad merge over many conversations; v2 = narrow merge over a
    few (so only a few buckets change between the versions — bucket by
    conv_id so a conversation is bucket-co-located)."""
    t = _table(spark, tmp_path, bucket_keys=("conv_id",))
    ev = change_events(spark, 4000, n_convs=60, seed=31)
    hi = ev.agg(F.max("lsn")).first()[0]
    v1 = t.merge(ev.filter(F.col("lsn") <= hi // 2), batch_id=0).version
    narrow = ev.filter(
        (F.col("lsn") > hi // 2) & F.col("conv_id").isin("conv-1", "conv-2")
    )
    assert narrow.count() > 0
    t.merge(narrow, batch_id=1)
    return t, v1


def test_wide_gap_falls_back_to_shuffled_join(spark, tmp_path):
    t, v1 = _two_version_table(spark, tmp_path)
    # threshold 0 forces the wide-gap path regardless of actual size
    big = t.changes_since(v1, broadcast_threshold_rows=0)
    plan = explain_str(big, "simple")
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastExchange" not in plan, plan
    # the frequent-sync path still broadcasts
    small = t.changes_since(v1)
    assert "BroadcastExchange" in explain_str(small, "simple")
    # and the two paths are value-identical
    assert sorted(big.collect()) == sorted(small.collect())


def test_wide_gap_feed_applies_identically(spark, tmp_path):
    t, v1 = _two_version_table(spark, tmp_path)
    a = _table(spark, tmp_path, "a")
    b = _table(spark, tmp_path, "b")
    a.apply_changes(t.changes_since(0), batch_id=0)
    b.apply_changes(t.changes_since(0, broadcast_threshold_rows=0), batch_id=0)
    a.apply_changes(t.changes_since(v1), batch_id=1)
    b.apply_changes(t.changes_since(v1, broadcast_threshold_rows=0), batch_id=1)
    want = sorted(t.read().collect())
    assert sorted(a.read().collect()) == want
    assert sorted(b.read().collect()) == want


def _relpaths(paths):
    # normalize to the table-relative data path (data/vN/bucket=K/part-...)
    # — part-file basenames are task indices, not bucket ids, and collide
    # across buckets within one commit
    out = set()
    for p in paths:
        p = str(p)
        i = p.find("/data/")
        out.add(p[i + 1 :] if i >= 0 else p)
    return out


def _basenames(paths):
    return {os.path.basename(p) for p in paths}


@pytest.mark.parametrize("threshold", [0, 10_000_000])
def test_old_version_scan_is_bucket_pruned(spark, tmp_path, threshold):
    t, v1 = _two_version_table(spark, tmp_path)
    old = LakeTable.load(spark, t.path, version=v1)
    cursor = max(e["lsn_max"] for e in old.live_files())
    kept = [e for e in t.live_files() if e["lsn_max"] > cursor]
    touched = {e["bucket"] for e in kept}
    assert len(touched) < t.num_buckets, "fixture must change only some buckets"
    allowed = _relpaths(e["path"] for e in kept) | _relpaths(
        e["path"] for e in old.live_files(touched)
    )
    pruned_away = (
        _relpaths(e["path"] for e in old.live_files()) - allowed
    )
    feed = t.changes_since(v1, broadcast_threshold_rows=threshold)
    scanned = _relpaths(feed.inputFiles())
    assert scanned, "changes_since scanned no files"
    assert scanned <= allowed, scanned - allowed
    assert pruned_away, "fixture must leave some old files prunable"
    assert not scanned & pruned_away


def test_rebucketed_old_version_skips_pruning_but_stays_correct(spark, tmp_path):
    """Bucket ids from the CURRENT manifests mean nothing against an old
    snapshot with a different layout — pruning must be skipped, values
    must still match."""
    t = _table(spark, tmp_path)
    ev = change_events(spark, 3000, n_convs=40, seed=32)
    hi = ev.agg(F.max("lsn")).first()[0]
    v1 = t.merge(ev.filter(F.col("lsn") <= hi // 2), batch_id=0).version
    t.rebucket(num_buckets=16)
    t.merge(ev.filter(F.col("lsn") > hi // 2), batch_id=1)
    feed = t.changes_since(v1)
    old_files = _relpaths(
        e["path"] for e in LakeTable.load(spark, t.path, version=v1).live_files()
    )
    # no pruning: every old live file is eligible (layouts differ)
    assert old_files <= _relpaths(feed.inputFiles())
    replica = _table(spark, tmp_path, "r")
    replica.apply_changes(t.changes_since(0), batch_id=0)
    replica.apply_changes(feed, batch_id=1)
    assert sorted(replica.read().collect()) == sorted(t.read().collect())


def test_delete_where_lsn_monotonic_after_tombstone_gc(spark, tmp_path):
    """gc_tombstones can physically drop the highest-LSN tombstones; a
    later delete_where must NOT re-issue those LSNs — a consumer whose
    cursor passed them would silently miss the new deletes."""
    t = _table(spark, tmp_path)
    ev = change_events(spark, 2000, n_convs=30, seed=33)
    t.merge(ev, batch_id=0)
    t.delete_where("role = 'tool'", batch_id=1)
    first_purge_lsn = (
        t.read(include_deleted=True, include_meta=True)
        .agg(F.max("_lsn"))
        .first()[0]
    )
    # the consumer has consumed through the first purge
    cursor = int(first_purge_lsn)
    t.gc_tombstones(cursor + 1)  # drops every tombstone, incl. the purge's
    file_high = max(e["lsn_max"] for e in t.live_files())
    assert file_high < first_purge_lsn, "fixture must regress the file highs"
    r = t.delete_where("role = 'user'", batch_id=2)
    assert not r.skipped
    new_deletes = t.read_since(cursor).filter(F.col("_deleted"))
    assert new_deletes.count() > 0, (
        "new purge re-used a GC'd LSN — invisible to a caught-up consumer"
    )


def test_delete_where_lsn_monotonic_after_rollback(spark, tmp_path):
    """rollback grafts the target snapshot's content onto a new head — but
    lsn_high_ever is table-lifetime-monotonic, NOT part of the restored
    state: the rolled-past commits' LSNs were already emitted to
    read_since/changes_since consumers, so a post-rollback delete_where
    must not mint them again."""
    t = _table(spark, tmp_path)
    ev = change_events(spark, 2000, n_convs=30, seed=35)
    hi = ev.agg(F.max("lsn")).first()[0]
    v1 = t.merge(ev.filter(F.col("lsn") <= hi // 2), batch_id=0).version
    t.merge(ev.filter(F.col("lsn") > hi // 2), batch_id=1)
    head_high = (
        t.read(include_deleted=True, include_meta=True)
        .agg(F.max("_lsn"))
        .first()[0]
    )
    cursor = int(head_high)  # a replica synced through the full head
    t.rollback(version=v1)
    assert (t.snapshot.get("lsn_high_ever") or 0) >= cursor, (
        "rollback regressed lsn_high_ever to the target's older watermark"
    )
    r = t.delete_where("role = 'user'", batch_id=2)
    assert not r.skipped
    new_deletes = t.read_since(cursor).filter(F.col("_deleted"))
    assert new_deletes.count() > 0, (
        "post-rollback purge re-used an already-consumed LSN — invisible "
        "to a caught-up consumer"
    )


def test_rollback_racing_staged_wap_raises_not_overwrites(spark, tmp_path):
    """Metadata-only commits go through the same version-slot lock as data
    commits: the snapshot descriptor is created exclusively, so a rollback
    racing a staged (unpublished) merge for the same slot fails loudly
    instead of silently destroying the staged snapshot."""
    t = _table(spark, tmp_path)
    ev = change_events(spark, 1500, n_convs=20, seed=34)
    hi = ev.agg(F.max("lsn")).first()[0]
    t.merge(ev.filter(F.col("lsn") <= hi // 2), batch_id=0)  # published v1
    stager = LakeTable.load(spark, t.path)
    staged = stager.merge(
        ev.filter(F.col("lsn") > hi // 2), batch_id=1, publish=False
    )
    snap_file = os.path.join(
        t.path, "_meta", f"snap-v{staged.version}.json"
    )
    with open(snap_file) as f:
        staged_descriptor = json.load(f)
    roller = LakeTable.load(spark, t.path)  # still sees v1 → next slot = v2
    with pytest.raises(ConcurrentCommitError):
        roller.rollback(version=0)
    # the staged descriptor is intact and still publishable
    with open(snap_file) as f:
        assert json.load(f) == staged_descriptor
    publisher = LakeTable.load(spark, t.path)
    publisher.publish(staged.version)
    want = _table(spark, tmp_path, "ref")
    want.merge(ev, batch_id=0)
    assert sorted(publisher.read().collect()) == sorted(want.read().collect())
