"""Rollback: restore table state to an earlier version/tag as a NEW head
commit (Iceberg rollback_to_snapshot semantics, linear history).  The move
is metadata-only — files carry by reference — and it rewinds the
applied-batch manifest, so post-target batches replay instead of being
skipped (the normal recovery sequence after a bad deploy)."""

import pytest

from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA

from tests.util import ev, mk_events, table_state


def _table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=2
    )


def test_rollback_restores_state_as_new_head(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="good")]), batch_id=0)
    good_v = t.version
    good_state = table_state(t.read())
    t.merge(mk_events(spark, [ev(2, "u", "a", 0, text="bad")]), batch_id=1)
    t.merge(mk_events(spark, [ev(3, "u", "a", 0, text="worse")]), batch_id=2)
    bad_head = t.version

    new_head = t.rollback(version=good_v)
    assert new_head == bad_head + 1  # linear history, no version reuse
    assert t.version == new_head
    assert table_state(t.read()) == good_state
    # the rolled-past versions stay readable for audit until expired
    audit = LakeTable.load(spark, t.path, version=bad_head)
    assert table_state(audit.read())[("a", 0)][1] == "worse"
    # a fresh load sees the rolled-back state
    assert table_state(LakeTable.load(spark, t.path).read()) == good_state


def test_rollback_rewinds_applied_batches_for_replay(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="base")]), batch_id=0)
    good_v = t.version
    t.merge(mk_events(spark, [ev(2, "u", "a", 0, text="bad")]), batch_id=1)
    t.rollback(version=good_v)
    # batch 1 landed after the target: after rollback it must REPLAY
    # (corrected data), not be skipped by the exactly-once manifest
    r = t.merge(mk_events(spark, [ev(2, "u", "a", 0, text="fixed")]),
                batch_id=1)
    assert not r.skipped
    assert table_state(t.read())[("a", 0)][1] == "fixed"
    # ... while the pre-target batch is still recognized as applied
    r0 = t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="base")]),
                 batch_id=0)
    assert r0.skipped


def test_rollback_by_tag_and_validation(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="rel")]), batch_id=0)
    t.tag("release-1")
    rel_state = table_state(t.read())
    t.merge(mk_events(spark, [ev(2, "u", "a", 0, text="post")]), batch_id=1)

    with pytest.raises(ValueError, match="exactly one"):
        t.rollback()
    with pytest.raises(ValueError, match="exactly one"):
        t.rollback(version=1, tag="release-1")
    with pytest.raises(ValueError, match="unknown tag"):
        t.rollback(tag="nope")
    with pytest.raises(ValueError, match="FORWARD"):
        t.rollback(version=t.version + 5)
    with pytest.raises(ValueError, match="does not exist"):
        LakeTable.load(spark, t.path, version=t.version).rollback(version=-1)

    new_head = t.rollback(tag="release-1")
    assert table_state(t.read()) == rel_state
    assert t.snapshot["rollback_of"] == t.tags()["release-1"]
    # rolling back to where we already are is a no-op
    assert t.rollback(version=new_head) == new_head


def test_rollback_survives_expiry_of_rolled_past_versions(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="keep")]), batch_id=0)
    good_v = t.version
    for i in range(2, 5):
        t.merge(mk_events(spark, [ev(i, "u", "a", 0, text=f"bad{i}")]),
                batch_id=i - 1)
    t.rollback(version=good_v)
    t.expire_snapshots(retain_last=1, remove_orphans=True,
                       orphan_min_age_sec=0)
    # the head references the target's data files; expiry must not
    # delete them even though every bad version (and the original
    # good snapshot file) is expired
    t2 = LakeTable.load(spark, t.path)
    assert table_state(t2.read())[("a", 0)][1] == "keep"
