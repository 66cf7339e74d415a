"""Snapshot tags (Iceberg tag analog): named version pins that survive
expire_snapshots until dropped — release/audit/rollback points for a
table whose routine expiry keeps only the last N versions."""

import pytest

from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA

from tests.util import ev, mk_events, table_state


def _table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=2
    )


def test_tag_pins_a_readable_version(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="v1")]), batch_id=0)
    t.tag("release-1")
    state_v1 = table_state(t.read())
    t.merge(mk_events(spark, [ev(2, "u", "a", 0, text="v2")]), batch_id=1)
    pinned = LakeTable.load(spark, t.path, tag="release-1")
    assert table_state(pinned.read()) == state_v1
    assert table_state(t.read()) != state_v1
    with pytest.raises(ValueError, match="unknown tag"):
        LakeTable.load(spark, t.path, tag="nope")
    with pytest.raises(ValueError, match="version OR tag"):
        LakeTable.load(spark, t.path, version=1, tag="release-1")


def test_tagged_version_survives_expiry(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="old")]), batch_id=0)
    tagged_v = t.tag("audit")
    for i in range(2, 6):
        t.merge(mk_events(spark, [ev(i, "u", "a", 0, text=f"r{i}")]),
                batch_id=i - 1)
    t.expire_snapshots(retain_last=1, remove_orphans=True,
                       orphan_min_age_sec=0)
    # the tagged snapshot still loads and reads its pinned state
    pinned = LakeTable.load(spark, t.path, tag="audit")
    assert pinned.version == tagged_v
    assert table_state(pinned.read())[("a", 0)][1] == "old"
    # after dropping the tag, expiry removes it
    t.drop_tag("audit")
    t.expire_snapshots(retain_last=1, remove_orphans=True,
                       orphan_min_age_sec=0)
    with pytest.raises(FileNotFoundError):
        LakeTable.load(spark, t.path, version=tagged_v)


def test_retag_moves_and_cannot_tag_missing_version(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0)]), batch_id=0)
    t.tag("latest")
    v1 = t.version
    t.merge(mk_events(spark, [ev(2, "u", "a", 0)]), batch_id=1)
    t.tag("latest")  # moves
    assert t.tags() == {"latest": t.version} and t.version != v1
    with pytest.raises(ValueError, match="does not exist"):
        t.tag("ghost", version=999)
