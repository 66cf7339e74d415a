"""Guards hardened after the round-5 core review: reserved payload names,
underscore-payload schema evolution, compact convergence with
files_per_bucket > 1, dangling tags after abandon_staged, and
expire_snapshots(retain_last=0)."""

import pytest
from pyspark.sql import functions as F, types as T

from airbyte_custom_spark.lake.table import LakeTable, SchemaEvolutionError
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA

from tests.util import ev, mk_events


def _payload(*fields):
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


def test_create_rejects_engine_reserved_payload_names(spark, tmp_path):
    """A payload column named 'bucket' would be overwritten by the write
    path, stripped by partitionBy, and read back as NULLs — silent data
    loss.  Same for the write salt and the meta columns."""
    for i, bad in enumerate(("bucket", "_wsalt", "_lsn", "_meta")):
        schema = _payload(("conv_id", T.StringType()), (bad, T.LongType()))
        with pytest.raises(ValueError, match="reserved"):
            LakeTable.create(
                spark, str(tmp_path / f"t{i}"), schema,
                primary_key=("conv_id",), num_buckets=2,
            )


def test_evolve_rejects_reserved_and_checks_underscore_payload(spark, tmp_path):
    """evolve_schema must (a) reject reserved names in the NEW payload and
    (b) apply the drop/narrow checks to underscore-prefixed PAYLOAD
    columns (e.g. Mongo `_id`) — only the engine meta columns are exempt."""
    payload = _payload(("conv_id", T.StringType()), ("_id", T.LongType()))
    t = LakeTable.create(
        spark, str(tmp_path / "t"), payload,
        primary_key=("conv_id",), num_buckets=2,
    )
    with pytest.raises(ValueError, match="reserved"):
        t.evolve_schema(_payload(
            ("conv_id", T.StringType()), ("_id", T.LongType()),
            ("bucket", T.StringType()),
        ))
    # dropping `_id` must raise, not commit silently
    with pytest.raises(SchemaEvolutionError, match="_id"):
        t.evolve_schema(_payload(("conv_id", T.StringType())))
    # narrowing `_id` long -> int must raise too
    with pytest.raises(SchemaEvolutionError, match="_id"):
        t.evolve_schema(_payload(
            ("conv_id", T.StringType()), ("_id", T.IntegerType()),
        ))
    # a genuine widening of `_id` still evolves
    v = t.evolve_schema(_payload(
        ("conv_id", T.StringType()), ("_id", T.DoubleType()),
    ))
    assert v == t.version


def test_compact_converges_with_files_per_bucket(spark, tmp_path):
    """compact()'s trigger must sit above the table's files_per_bucket:
    a rewrite lands fpb files per bucket, so with fpb > min_files the old
    `n > min_files` trigger re-selected every bucket on every call — a
    full-table rewrite per maintenance cycle, forever."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        num_buckets=2, files_per_bucket=2,
    )
    rows = [ev(i + 1, "c", f"c{i % 8}", i // 8, text=f"t{i}") for i in range(64)]
    # appends accrue files (a CoW merge rewrites its buckets whole)
    for lo in range(0, 64, 16):
        t.append(mk_events(spark, rows[lo:lo + 16]))
    assert t.stats()["max_files_per_bucket"] > 2
    v1 = t.compact()  # two appends' files per bucket → one folding rewrite
    assert v1 is not None
    v2 = t.compact()  # now at ≤ fpb files per bucket → MUST converge
    assert v2 is None, "compact did not converge at files_per_bucket files"
    assert t.read().count() == len(rows)


def test_abandon_staged_drops_dangling_tag(spark, tmp_path):
    """A tag pinned to a staged version must not outlive abandon_staged —
    a dangling tag makes expire_snapshots (which retains tagged versions
    and opens their descriptors) crash on every later run."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=2,
    )
    t.merge(mk_events(spark, [ev(1, "c", "a", 0, text="x")]), batch_id=0)
    staged = t.merge(
        mk_events(spark, [ev(2, "u", "a", 0, text="y")]),
        batch_id=1, publish=False,
    )
    t.tag("audit", staged.version)
    t.abandon_staged(staged.version)
    assert "audit" not in t.tags()
    # expire_snapshots runs clean afterwards
    stats = t.expire_snapshots(retain_last=1)
    assert stats["expired_snapshots"] >= 0
    with pytest.raises(ValueError, match="unknown tag"):
        LakeTable.load(spark, t.path, tag="audit")


def test_expire_retain_last_zero_keeps_only_pointer(spark, tmp_path):
    """retain_last=0 means 'keep only the live pointer (+tags)' — the old
    versions[-0:] slice silently retained everything."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=2,
    )
    for i in range(3):
        t.merge(
            mk_events(spark, [ev(i + 1, "c", "a", i, text=f"t{i}")]),
            batch_id=i,
        )
    stats = t.expire_snapshots(retain_last=0)
    assert stats["expired_snapshots"] == 3  # v0..v2 gone, v3 (head) kept
    assert [h["version"] for h in t.history()] == [t.version]
    assert t.read().count() == 3


def test_reserved_names_checked_case_insensitively(spark, tmp_path):
    """Spark column resolution is case-insensitive by default, so 'Bucket'
    collides with the injected 'bucket' exactly like the lowercase name —
    the guard must match casefolded, not exact."""
    for i, bad in enumerate(("Bucket", "_LSN", "_Wsalt")):
        schema = _payload(("conv_id", T.StringType()), (bad, T.LongType()))
        with pytest.raises(ValueError, match="reserved"):
            LakeTable.create(
                spark, str(tmp_path / f"t{i}"), schema,
                primary_key=("conv_id",), num_buckets=2,
            )


def test_operator_scratch_and_envelope_names_are_reserved(spark, tmp_path):
    """The merge/dedupe/changelog operators inject scratch columns mid-plan
    (_rn, _acs_gk, _salt, _row, _ord, _was_live) and every merge source
    carries the lsn/op envelope (delete_where overwrites 'op' outright) —
    a payload column with any of these names would be silently replaced or
    made ambiguous, so creation rejects them like the layout names."""
    for i, bad in enumerate(("_rn", "op", "lsn", "_was_live", "_acs_gk")):
        schema = _payload(("conv_id", T.StringType()), (bad, T.StringType()))
        with pytest.raises(ValueError, match="reserved"):
            LakeTable.create(
                spark, str(tmp_path / f"t{i}"), schema,
                primary_key=("conv_id",), num_buckets=2,
            )


def test_evolve_grandfathers_preexisting_reserved_column(spark, tmp_path, monkeypatch):
    """A legacy table created before a name became reserved must keep
    evolving: the drop check forces the old column to stay in new_payload,
    so rejecting it would wedge automated streaming evolution in a
    crash-loop.  Only NEWLY-ADDED reserved names are rejected."""
    import airbyte_custom_spark.lake.table as table_mod

    legacy = _payload(("conv_id", T.StringType()), ("_rn", T.LongType()))
    # simulate the pre-guard build that accepted the name
    monkeypatch.setattr(table_mod, "_RESERVED_CASEFOLD", frozenset())
    t = LakeTable.create(
        spark, str(tmp_path / "t"), legacy,
        primary_key=("conv_id",), num_buckets=2,
    )
    monkeypatch.undo()
    # adding an unrelated column keeps working (grandfathered '_rn' stays)
    v = t.evolve_schema(_payload(
        ("conv_id", T.StringType()), ("_rn", T.LongType()),
        ("note", T.StringType()),
    ))
    assert v == t.version
    # but a NEW reserved name is still rejected
    with pytest.raises(ValueError, match="reserved"):
        t.evolve_schema(_payload(
            ("conv_id", T.StringType()), ("_rn", T.LongType()),
            ("note", T.StringType()), ("bucket", T.StringType()),
        ))


def test_expire_snapshots_retains_staged_wap_snapshot(spark, tmp_path):
    """A staged (unpublished) snapshot lives ABOVE the head pointer; a
    maintenance expire_snapshots racing the audit must not delete its
    descriptor or fresh data files — staged snapshots are only removed
    via abandon_staged()."""
    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=2)
    for i in range(2):
        t.merge(mk_events(spark, [ev(i + 1, "c", "a", i, text=f"t{i}")]), batch_id=i)
    staged = t.merge(
        mk_events(spark, [ev(9, "u", "a", 0, text="audited")]),
        batch_id=2, publish=False,
    )
    t.expire_snapshots(retain_last=0)  # most aggressive setting
    v = t.publish(staged.version)      # must still be publishable
    assert v == staged.version
    got = {r["turn_idx"]: r["text"] for r in t.read().collect()}
    assert got[0] == "audited" and got[1] == "t1"


def test_expire_snapshots_self_heals_dangling_tag(spark, tmp_path):
    """A tag whose descriptor is gone (older-build crash window) must not
    crash every future expiry run — expire prunes it from TAGS.json; and
    load(tag=...) names the dangling tag instead of FileNotFoundError."""
    import os

    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=2)
    for i in range(3):
        t.merge(mk_events(spark, [ev(i + 1, "c", "a", i, text=f"t{i}")]), batch_id=i)
    t.tag("rel", 1)
    os.remove(os.path.join(t.path, "_meta", "snap-v1.json"))  # simulate
    with pytest.raises(ValueError, match="dangling"):
        LakeTable.load(spark, t.path, tag="rel")
    stats = t.expire_snapshots(retain_last=1)  # must not raise
    assert stats["expired_snapshots"] >= 0
    assert "rel" not in t.tags()
    assert t.read().count() == 3


def test_expire_keeps_tag_whose_descriptor_exists_despite_stale_listing(
    spark, tmp_path, monkeypatch
):
    """Race guard: a tag is judged dangling by DESCRIPTOR EXISTENCE at
    prune time, never by membership in the version listing taken at
    function start — a commit+tag landing between the two must not be
    unpinned (the next expiry run would physically delete the snapshot
    the tag was supposed to pin)."""
    import os as _os

    import airbyte_custom_spark.lake.table as table_mod

    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=2)
    for i in range(3):
        t.merge(mk_events(spark, [ev(i + 1, "c", "a", i, text=f"t{i}")]), batch_id=i)
    t.tag("rel", t.version)
    newest = f"snap-v{t.version}.json"
    real_listdir = _os.listdir

    def stale_listdir(p):
        out = real_listdir(p)
        if str(p).endswith("_meta"):
            # simulate the newest snapshot landing AFTER the listing
            return [n for n in out if n != newest]
        return out

    monkeypatch.setattr(table_mod.os, "listdir", stale_listdir)
    t.expire_snapshots(retain_last=1)
    monkeypatch.undo()
    assert "rel" in t.tags(), "tag with live descriptor must never be pruned"
    # and the pin holds through a later, un-raced aggressive expiry
    t.expire_snapshots(retain_last=0)
    assert LakeTable.load(spark, t.path, tag="rel").read().count() == 3


def test_soft_reset_grandfathers_preexisting_reserved_column(
    spark, tmp_path, monkeypatch
):
    """soft_reset is the documented recovery path, so it applies the same
    grandfathering as evolve_schema: a legacy payload column whose name
    is reserved today may be KEPT through the rebuild; only newly-added
    reserved names are rejected."""
    import airbyte_custom_spark.lake.table as table_mod

    legacy = _payload(("conv_id", T.StringType()), ("_rn", T.LongType()))
    monkeypatch.setattr(table_mod, "_RESERVED_CASEFOLD", frozenset())
    t = LakeTable.create(
        spark, str(tmp_path / "t"), legacy,
        primary_key=("conv_id",), num_buckets=2,
    )
    monkeypatch.undo()
    # rebuild keeping the grandfathered column (plus a widened one)
    v = t.soft_reset(_payload(
        ("conv_id", T.StringType()), ("_rn", T.LongType()),
        ("note", T.StringType()),
    ))
    assert v == t.version
    # but a NEW reserved name is still rejected before any work
    with pytest.raises(ValueError, match="reserved"):
        t.soft_reset(_payload(
            ("conv_id", T.StringType()), ("_rn", T.LongType()),
            ("bucket", T.StringType()),
        ))
