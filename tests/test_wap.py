"""Write-audit-publish (Iceberg ``spark.wap.id`` pattern): a merge with
``publish=False`` writes data + a durable snapshot descriptor but leaves
the table pointer on the parent; an audit reads the staged version; then
``publish()`` is one atomic pointer swing and ``abandon_staged()`` deletes
a failed stage's files without touching the published chain."""

import pytest

from airbyte_custom_spark.lake.table import ConcurrentCommitError, LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA

from tests.util import ev, mk_events, table_state


def _table(spark, tmp_path, **kw):
    return LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=2, **kw
    )


def test_stage_is_invisible_until_publish(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="live")]), batch_id=0)
    live = table_state(t.read())

    r = t.merge(mk_events(spark, [ev(2, "u", "a", 0, text="staged")]),
                batch_id=1, publish=False)
    assert not r.published and r.version == t.version + 1
    # readers (fresh load AND this handle) still see the parent
    assert table_state(LakeTable.load(spark, t.path).read()) == live
    assert table_state(t.read()) == live
    # the staged batch is NOT marked applied on the published chain
    assert t.last_committed_batch("default") == 0

    # the audit reads the staged version directly
    staged = LakeTable.load(spark, t.path, version=r.version)
    assert table_state(staged.read())[("a", 0)][1] == "staged"

    assert t.publish(r.version) == r.version
    assert table_state(LakeTable.load(spark, t.path).read())[("a", 0)][1] == "staged"
    # after publish, replaying the staged batch_id is skipped
    t2 = LakeTable.load(spark, t.path)
    assert t2.merge(mk_events(spark, [ev(2, "u", "a", 0)]), batch_id=1).skipped


def test_audit_reports_rows_dups_and_delta(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0), ev(2, "c", "a", 1)]),
            batch_id=0)
    r = t.merge(
        mk_events(spark, [ev(3, "c", "b", 0), ev(4, "d", "a", 1)]),
        batch_id=1, publish=False,
    )
    a = t.audit(version=r.version)
    # +1 insert, -1 delete vs the 2-row parent
    assert a == {
        "version": r.version, "rows": 2, "pk_dups": 0, "null_pk_rows": 0,
        "parent_rows": 2, "row_delta": 0,
    }


def test_abandon_staged_removes_files_keeps_chain(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="keep")]), batch_id=0)
    live = table_state(t.read())
    r = t.merge(mk_events(spark, [ev(2, "u", "a", 0, text="bad")]),
                batch_id=1, publish=False)
    out = t.abandon_staged(r.version)
    assert out["removed_files"] > 0 and out["removed_manifests"] > 0
    with pytest.raises(ValueError, match="no staged snapshot"):
        t.publish(r.version)
    assert table_state(LakeTable.load(spark, t.path).read()) == live
    # re-staging the corrected batch reuses the version number cleanly
    r2 = t.merge(mk_events(spark, [ev(2, "u", "a", 0, text="good")]),
                 batch_id=1, publish=False)
    assert r2.version == r.version
    t.publish(r2.version)
    assert table_state(t.read())[("a", 0)][1] == "good"


def test_stage_from_stale_handle_fails_fast(spark, tmp_path):
    # WAP inherits the single-writer optimistic rule: a stage cut from a
    # handle the table has moved past fails BEFORE writing any data, and
    # publish refuses anything already on the published chain.
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0)]), batch_id=0)
    stale = LakeTable.load(spark, t.path)
    t.merge(mk_events(spark, [ev(2, "u", "a", 0)]), batch_id=1)
    with pytest.raises(ConcurrentCommitError):
        stale.merge(mk_events(spark, [ev(3, "u", "a", 0)]),
                    batch_id=2, publish=False)
    with pytest.raises(ValueError, match="already published"):
        t.publish(t.version)
    with pytest.raises(ValueError, match="no staged snapshot"):
        t.abandon_staged(t.version + 7)


def test_wap_on_merge_on_read_table(spark, tmp_path):
    t = _table(spark, tmp_path, write_mode="mor")
    t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="base")]), batch_id=0)
    r = t.merge(mk_events(spark, [ev(2, "u", "a", 0, text="delta")]),
                batch_id=1, publish=False)
    assert not r.published
    assert table_state(LakeTable.load(spark, t.path).read())[("a", 0)][1] == "base"
    t.publish(r.version)
    assert table_state(LakeTable.load(spark, t.path).read())[("a", 0)][1] == "delta"
