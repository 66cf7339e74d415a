"""Golden CDC scenarios (FIXTURES.md §3) against the LakeTable merge.

Mirrors the reference test matrix:
  BaseTypingDedupingTest (incrementalDedup, incrementalAppend, overwrite),
  BaseSqlGeneratorIntegrationTest (cdcImmediateDeletion:545, cdcIdempotent:579,
  testCdcOrdering_updateAfterDelete:648, testCdcOrdering_insertAfterDelete:680),
  validatePrimaryKeys (`BigQuerySqlGenerator.java:391-416`).
"""

import pytest

from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.operators.dedupe import (
    NullPrimaryKeyError,
    validate_primary_keys,
)
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.sources.generator import change_events

from tests.util import assert_matches_replay, ev, mk_events, table_state


def fresh_table(spark, tmp_path, **kw):
    return LakeTable.create(
        spark, str(tmp_path / "tbl"), TRANSCRIPT_SCHEMA, num_buckets=kw.pop("num_buckets", 4), **kw
    )


def test_insert_only(spark, tmp_path):
    t = fresh_table(spark, tmp_path)
    events = mk_events(spark, [ev(i, "c", f"conv-{i % 3}", i // 3) for i in range(1, 10)])
    t.merge(events, batch_id=0)
    assert_matches_replay(t.read(), events)
    assert t.read().count() == 9


def test_upsert_latest_wins(spark, tmp_path):
    t = fresh_table(spark, tmp_path)
    events = mk_events(
        spark,
        [
            ev(1, "c", "a", 0, text="v1"),
            ev(2, "u", "a", 0, text="v2"),
            ev(5, "u", "a", 0, text="v5"),
            ev(3, "u", "a", 0, text="v3"),
        ],
    )
    t.merge(events, batch_id=0)
    state = table_state(t.read())
    assert state[("a", 0)][1] == "v5"
    assert_matches_replay(t.read(), events)


def test_delete_simple(spark, tmp_path):
    t = fresh_table(spark, tmp_path)
    events = mk_events(spark, [ev(1, "c", "a", 0), ev(2, "c", "a", 1), ev(3, "d", "a", 0)])
    t.merge(events, batch_id=0)
    state = table_state(t.read())
    assert ("a", 0) not in state and ("a", 1) in state


def test_update_after_delete_cross_batch(spark, tmp_path):
    """Stale update (lower lsn) arriving in a LATER batch must not
    resurrect a deleted key (`testCdcOrdering_updateAfterDelete:648`)."""
    t = fresh_table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="v1"), ev(9, "d", "a", 0)]), batch_id=0)
    t.merge(mk_events(spark, [ev(5, "u", "a", 0, text="stale")]), batch_id=1)
    assert table_state(t.read()) == {}
    # tombstone retained internally with the delete's lsn
    internal = t.read(include_deleted=True, include_meta=True).collect()
    assert len(internal) == 1 and internal[0]["_deleted"] and internal[0]["_lsn"] == 9


def test_insert_after_delete(spark, tmp_path):
    """A true re-insert with lsn above the tombstone revives the key
    (`testCdcOrdering_insertAfterDelete:680`)."""
    t = fresh_table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="v1"), ev(2, "d", "a", 0)]), batch_id=0)
    t.merge(mk_events(spark, [ev(3, "c", "a", 0, text="reborn")]), batch_id=1)
    assert table_state(t.read())[("a", 0)][1] == "reborn"


def test_delete_wins_tie_at_equal_lsn(spark, tmp_path):
    """Equal-cursor delete vs upsert resolves to the delete — the T5
    delete-wins rule (`BigQuerySqlGenerator.java:514-548`)."""
    t = fresh_table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0), ev(1, "d", "a", 0)]), batch_id=0)
    assert table_state(t.read()) == {}


def test_delete_wins_tie_delete_listed_first(spark, tmp_path):
    """Same T5 tie with the delete FIRST in arrival order — must still
    resolve to the delete (regression: the round-1 pre-reduce tie-broke by
    arrival order when delete_col wasn't threaded through)."""
    t = fresh_table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "d", "a", 0), ev(1, "c", "a", 0)]), batch_id=0)
    assert table_state(t.read()) == {}


def test_watermark_survives_maintenance_commits(spark, tmp_path):
    """applied_lsn_high is cumulative: a compact (or any maintenance
    commit) between merges must not blind the C7 stale-offset guard."""
    t = fresh_table(spark, tmp_path, num_buckets=2)
    lineage = [{"source_partition": 0, "events": 3, "min_lsn": 1, "max_lsn": 7}]
    t.merge(
        mk_events(spark, [ev(1, "c", "a", 0), ev(7, "c", "b", 0)]),
        batch_id=0,
        lineage=lineage,
    )
    assert t.applied_lsn_high_watermark() == 7
    # fragment then compact — a non-merge commit in between
    t.append(mk_events(spark, [ev(8, "c", "c", 0)]))
    t.compact(min_files_per_bucket=1)
    assert t.applied_lsn_high_watermark() == 7
    # a later merge only raises it
    t.merge(
        mk_events(spark, [ev(9, "u", "a", 0)]),
        batch_id=1,
        lineage=[{"source_partition": 0, "events": 1, "min_lsn": 9, "max_lsn": 9}],
    )
    assert t.applied_lsn_high_watermark() == 9


def test_duplicate_replay_idempotent(spark, tmp_path):
    """Same batch applied twice with the same batch_id is a no-op
    (`cdcIdempotent:579`; manifest per `GlobalAsyncStateManager.java:34-52`)."""
    t = fresh_table(spark, tmp_path)
    events = mk_events(spark, [ev(i, "c", "a", i) for i in range(1, 6)])
    r1 = t.merge(events, batch_id=0, query_id="q")
    r2 = t.merge(events, batch_id=0, query_id="q")
    assert not r1.skipped and r2.skipped
    assert t.version == r1.version
    assert t.read().count() == 5


def test_two_sequential_runs_compose(spark, tmp_path):
    """Run 1, then run 2 with only-new events; final equals full replay
    (CAT `test_incremental.py:108-153`)."""
    t = fresh_table(spark, tmp_path)
    all_events = change_events(spark, 3000, n_convs=50, max_turns=8)
    first = all_events.filter("lsn <= 2000")
    second = all_events.filter("lsn > 2000")
    t.merge(first, batch_id=0)
    mid = t.read().count()
    t.merge(second, batch_id=1)
    assert_matches_replay(t.read(), all_events)
    assert t.read().count() != 0 and mid != 0


def test_null_pk_rejected(spark, tmp_path):
    events = mk_events(spark, [ev(1, "c", "a", 0), ev(2, "c", None, 1)])
    with pytest.raises(NullPrimaryKeyError):
        validate_primary_keys(events, ("conv_id", "turn_idx"))


def test_append_mode_keeps_duplicates(spark, tmp_path):
    t = fresh_table(spark, tmp_path)
    events = mk_events(spark, [ev(1, "c", "a", 0, text="v1"), ev(2, "u", "a", 0, text="v2")])
    t.append(events)
    assert t.read().count() == 2  # no dedup in append mode


def test_overwrite_mode(spark, tmp_path):
    t = fresh_table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0)]), batch_id=0)
    t.overwrite(mk_events(spark, [ev(10, "c", "b", 0), ev(11, "c", "b", 1)]))
    state = table_state(t.read())
    assert set(state) == {("b", 0), ("b", 1)}


def test_bucket_pruning_carries_untouched_files(spark, tmp_path):
    t = fresh_table(spark, tmp_path, num_buckets=16)
    big = change_events(spark, 5000, n_convs=300, max_turns=8)
    t.merge(big, batch_id=0)
    files_before = t.stats()["files"]
    res = t.merge(mk_events(spark, [ev(999999, "u", "conv-1", 0, text="touch")]), batch_id=1)
    assert len(res.touched_buckets) == 1
    assert res.carried_files == files_before - 1
    assert res.written_files >= 1


def test_time_travel_and_history(spark, tmp_path):
    t = fresh_table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0)]), batch_id=0)
    v1 = t.version
    t.merge(mk_events(spark, [ev(2, "d", "a", 0)]), batch_id=1)
    old = LakeTable.load(spark, t.path, version=v1)
    assert old.read().count() == 1 and t.read().count() == 0
    ops = [h["operation"] for h in t.history()]
    assert ops == ["create", "merge", "merge"]


def test_compaction_preserves_state(spark, tmp_path):
    t = fresh_table(spark, tmp_path, num_buckets=2)
    # appends fragment buckets (merge is copy-on-write and never does)
    for i in range(4):
        t.append(mk_events(spark, [ev(10 * i + 1, "c", f"c{i}", 0)]))
    before = table_state(t.read())
    v = t.compact(min_files_per_bucket=1)
    assert v is not None
    assert table_state(t.read()) == before
    by_bucket = {}
    for f in t.live_files():
        by_bucket.setdefault(f["bucket"], 0)
        by_bucket[f["bucket"]] += 1
    assert all(n == 1 for n in by_bucket.values())
    # compaction also collapsed the manifest refs for rewritten buckets
    assert t.stats()["max_files_per_bucket"] == 1


def test_gc_tombstones(spark, tmp_path):
    t = fresh_table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0), ev(2, "d", "a", 0), ev(3, "c", "b", 0)]), batch_id=0)
    assert t.read(include_deleted=True).count() == 2
    t.gc_tombstones(lsn_watermark=100)
    assert t.read(include_deleted=True, include_meta=True).filter("_deleted").count() == 0
    assert table_state(t.read()) == {("b", 0): table_state(t.read())[("b", 0)]}


def test_expire_snapshots_reclaims_dead_files(spark, tmp_path):
    """expire_snapshots: old versions' superseded files are physically
    deleted, retained versions still read (time travel inside the window),
    orphans from uncommitted writes are swept."""
    import os

    t = fresh_table(spark, tmp_path, num_buckets=2)
    for i in range(4):
        t.merge(mk_events(spark, [ev(i + 1, "u", "a", 0, text=f"v{i}")]), batch_id=i)
    data_files_before = sum(
        len(fs) for _, _, fs in os.walk(str(tmp_path / "tbl" / "data"))
    )
    # plant an orphan (a failed commit's leftover)
    orphan_dir = tmp_path / "tbl" / "data" / "v99" / "bucket=0"
    orphan_dir.mkdir(parents=True)
    (orphan_dir / "junk.parquet").write_bytes(b"not really parquet")

    # a FRESH unreferenced file is an in-flight writer's staged output:
    # the default (Iceberg older_than-style) age guard must leave it alone
    guarded = t.expire_snapshots(retain_last=4, remove_orphans=True)
    assert guarded["removed_orphans"] == 0
    assert (orphan_dir / "junk.parquet").exists()

    stats = t.expire_snapshots(
        retain_last=2, remove_orphans=True, orphan_min_age_sec=0
    )
    assert stats["expired_snapshots"] >= 2
    assert stats["removed_files"] + stats["removed_orphans"] > 0
    assert stats["removed_orphans"] >= 1
    data_files_after = sum(
        len(fs) for _, _, fs in os.walk(str(tmp_path / "tbl" / "data"))
    )
    assert data_files_after < data_files_before
    # current state intact; previous retained version still loadable
    assert table_state(t.read())[("a", 0)][1] == "v3"
    prev = LakeTable.load(spark, t.path, version=t.version - 1)
    assert table_state(prev.read())[("a", 0)][1] == "v2"


def test_generator_replay_end_to_end(spark, tmp_path):
    """Scale-generator stream, multi-batch, vs the naive oracle."""
    t = fresh_table(spark, tmp_path, num_buckets=8)
    events = change_events(spark, 8000, n_convs=100, max_turns=10, hot_fraction=0.3, p_delete=0.1)
    for i, (lo, hi) in enumerate([(0, 3000), (3000, 6000), (6000, 9000)]):
        t.merge(events.filter(f"lsn > {lo} and lsn <= {hi}"), batch_id=i)
    assert_matches_replay(t.read(), events)


def test_legacy_flat_files_snapshot_refuses_to_load(spark, tmp_path):
    """Pre-manifest snapshots (flat 'files' list) fail at LOAD with a clear
    message instead of KeyError on first read/write."""
    import json

    t = fresh_table(spark, tmp_path, num_buckets=2)
    snap_path = tmp_path / "tbl" / "_meta" / f"snap-v{t.version}.json"
    snap = json.loads(snap_path.read_text())
    snap["files"] = []
    del snap["manifests"]
    snap_path.write_text(json.dumps(snap))
    with pytest.raises(ValueError, match="legacy flat-'files'"):
        LakeTable.load(spark, str(tmp_path / "tbl"))
