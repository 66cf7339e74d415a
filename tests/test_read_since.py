"""Incremental export (`LakeTable.read_since`) with manifest-level file
skipping on per-file _lsn min/max (Iceberg lower/upper-bounds pruning).

Contract: read_since(cursor) returns exactly the keys whose CURRENT
winning version has _lsn > cursor — upserts and tombstones both, with
`_deleted` distinguishing them — and does so without opening any file
whose manifest lsn_max ≤ cursor (a pruned file cannot contain a
qualifying winner: winners carry their key's max lsn).
"""

from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA

from tests.util import ev, mk_events


def _table(spark, tmp_path, name="t", **kw):
    return LakeTable.create(
        spark, str(tmp_path / name), TRANSCRIPT_SCHEMA,
        num_buckets=kw.pop("num_buckets", 4), **kw,
    )


def _export(t, cursor):
    return {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["_lsn"], r["_deleted"])
        for r in t.read_since(cursor).collect()
    }


def test_read_since_winners_only(spark, tmp_path):
    """Only keys whose WINNER is past the cursor export; a key whose last
    change predates the cursor stays out even if an older version of
    another key shares its file."""
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0), ev(2, "c", "b", 0),
                              ev(3, "c", "c", 0)]), batch_id=0)
    t.merge(mk_events(spark, [ev(10, "u", "a", 0, text="new-a"),
                              ev(11, "d", "b", 0)]), batch_id=1)
    got = _export(t, 5)
    assert got == {
        ("a", 0): ("new-a", 10, False),
        ("b", 0): (None, 11, True),
    }
    # cursor at the head → empty feed
    assert _export(t, 11) == {}
    # cursor before everything → full state incl. tombstone
    assert set(_export(t, 0)) == {("a", 0), ("b", 0), ("c", 0)}


def test_read_since_skips_files_by_manifest(spark, tmp_path):
    """Every live file carries lsn_min/lsn_max, and the cursor prunes the
    old commit's files without opening them."""
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(i, "c", f"k{i}", 0) for i in range(1, 9)]),
            batch_id=0)
    v1_files = {e["path"] for e in t.live_files()}
    assert all(e["lsn_max"] is not None for e in t.live_files())
    # second commit touches ONE key → rewrites one bucket
    t.merge(mk_events(spark, [ev(100, "u", "k1", 0, text="hot")]), batch_id=1)
    cursor = 50
    kept = [e for e in t.live_files() if e["lsn_max"] > cursor]
    pruned = [e for e in t.live_files() if e["lsn_max"] <= cursor]
    assert pruned, "untouched buckets' files must be prunable"
    assert all(e["path"] in v1_files for e in pruned)
    # the export is correct AND only scans kept files (spy on _read_files)
    calls = []
    orig = t._read_files
    t._read_files = lambda fs: (calls.append(len(fs)), orig(fs))[1]
    got = _export(t, cursor)
    t._read_files = orig
    assert got == {("k1", 0): ("hot", 100, False)}
    assert sum(calls) == len(kept)


def test_read_since_folds_mor_deltas(spark, tmp_path):
    """With outstanding MoR deltas the export folds base ∪ surviving
    deltas — a delta upsert past the cursor exports, a base winner
    superseded by a pruned-delta row never resurfaces."""
    t = _table(spark, tmp_path, write_mode="mor")
    t.merge(mk_events(spark, [ev(1, "c", "a", 0), ev(2, "c", "b", 0)]),
            batch_id=0)
    t.merge(mk_events(spark, [ev(20, "u", "b", 0, text="late-b")]),
            batch_id=1)
    assert t.delta_refs
    assert _export(t, 10) == {("b", 0): ("late-b", 20, False)}
    # after folding, same answer from the compacted base
    t.compact_deltas()
    assert _export(t, 10) == {("b", 0): ("late-b", 20, False)}


def test_read_since_after_compact_and_rebucket(spark, tmp_path):
    """Maintenance rewrites (compact, rebucket) preserve lsn stats and the
    export stays exact (pruning may coarsen — never wrong)."""
    t = _table(spark, tmp_path, num_buckets=2)
    t.merge(mk_events(spark, [ev(i, "c", f"k{i}", 0) for i in range(1, 6)]),
            batch_id=0)
    t.merge(mk_events(spark, [ev(30, "u", "k2", 0, text="x"),
                              ev(31, "d", "k3", 0)]), batch_id=1)
    expected = {("k2", 0): ("x", 30, False), ("k3", 0): (None, 31, True)}
    assert _export(t, 10) == expected
    t.compact(min_files_per_bucket=1)
    assert _export(t, 10) == expected
    t.rebucket(5)
    assert _export(t, 10) == expected
    assert all(e["lsn_max"] is not None for e in t.live_files())


def _changes(t, v):
    return {
        (r["conv_id"], r["turn_idx"]): (r["text"], r["change_op"])
        for r in t.changes_since(v).collect()
    }


def test_changes_since_classification(spark, tmp_path):
    """i/u/d classification plus the created-then-deleted net-zero case."""
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(1, "c", "a", 0), ev(2, "c", "b", 0)]),
            batch_id=0)
    v = t.version
    t.merge(mk_events(spark, [
        ev(10, "u", "a", 0, text="upd-a"),   # live before → u
        ev(11, "d", "b", 0),                 # live before, deleted → d
        ev(12, "c", "c", 0, text="new-c"),   # not live before → i
        ev(13, "c", "e", 0), ev(14, "d", "e", 0),  # net zero → absent
    ]), batch_id=1)
    assert _changes(t, v) == {
        ("a", 0): ("upd-a", "u"),
        ("b", 0): (None, "d"),
        ("c", 0): ("new-c", "i"),
    }
    # no changes since the current version
    assert _changes(t, t.version) == {}


def test_changes_since_mor_and_rebucket(spark, tmp_path):
    """The changelog is write-mode- and layout-independent: MoR deltas
    and a rebucket between the versions don't change the feed."""
    t = _table(spark, tmp_path, write_mode="mor")
    t.merge(mk_events(spark, [ev(1, "c", "a", 0), ev(2, "c", "b", 0)]),
            batch_id=0)
    v = t.version
    t.merge(mk_events(spark, [ev(10, "u", "a", 0, text="x"),
                              ev(11, "d", "b", 0)]), batch_id=1)
    expected = {("a", 0): ("x", "u"), ("b", 0): (None, "d")}
    assert _changes(t, v) == expected
    t.rebucket(6)  # folds deltas, rewrites layout — feed must not change
    assert _changes(t, v) == expected


def test_changes_since_plan_broadcasts_small_side(spark, tmp_path):
    """The old snapshot (big side) is never shuffled: both joins resolve
    as broadcast exchanges in the physical plan."""
    t = _table(spark, tmp_path)
    t.merge(mk_events(spark, [ev(i, "c", f"k{i}", 0) for i in range(1, 20)]),
            batch_id=0)
    v = t.version
    t.merge(mk_events(spark, [ev(100, "u", "k1", 0)]), batch_id=1)
    plan = t.changes_since(v)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
