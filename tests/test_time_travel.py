"""Snapshot-isolation time travel: LakeTable.load(version=N).

A version, once committed, is an immutable view — later merges, schema
evolution, and compaction must never change what it reads; only
expire_snapshots (age-guarded GC) may retire it.
"""

import pytest
from pyspark.sql import functions as F, types as T

from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.sources.generator import change_events


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tt") / "table")
    t = LakeTable.create(spark, d, TRANSCRIPT_SCHEMA, num_buckets=4)
    versions = []
    for i in range(3):
        ev = change_events(spark, 5_000, seed=500 + i)
        versions.append(t.merge(ev, batch_id=i).version)
    return t, versions


def _state(df):
    return {
        (r["conv_id"], r["turn_idx"], r["text"]) for r in df.collect()
    }


def test_past_version_is_prefix_replay(spark, table):
    t, versions = table
    past = LakeTable.load(spark, t.path, version=versions[1])
    # replay batches 0..1 into a fresh table — must equal the past view
    fresh = LakeTable.create(
        spark, t.path + "-replay", TRANSCRIPT_SCHEMA, num_buckets=4
    )
    for i in range(2):
        fresh.merge(change_events(spark, 5_000, seed=500 + i), batch_id=i)
    assert _state(past.read()) == _state(fresh.read())


def test_later_commits_do_not_disturb_past_version(spark, table):
    t, versions = table
    before = _state(LakeTable.load(spark, t.path, version=versions[1]).read())
    t.merge(change_events(spark, 5_000, seed=900), batch_id=10)
    after = _state(LakeTable.load(spark, t.path, version=versions[1]).read())
    assert before == after


def test_compaction_preserves_time_travel(spark, table):
    """Compaction rewrites live files into a NEW snapshot; the files an
    old version references stay on disk until expire_snapshots."""
    t, versions = table
    before = _state(LakeTable.load(spark, t.path, version=versions[1]).read())
    t.compact(min_files_per_bucket=1)
    assert _state(LakeTable.load(spark, t.path, version=versions[1]).read()) == before
    # and the current view is unchanged by compaction too
    cur = LakeTable.load(spark, t.path)
    assert cur.version > versions[-1]


def test_schema_evolution_preserves_past_schema(spark, table):
    """A past version reads with the schema it was written under — an ADD
    column after the fact must not appear in the time-travel view."""
    t, versions = table
    past_cols = set(LakeTable.load(spark, t.path, version=versions[1]).read().columns)
    wider = T.StructType(
        list(TRANSCRIPT_SCHEMA.fields)
        + [T.StructField("annotation", T.StringType(), True)]
    )
    t.evolve_schema(wider)
    now_cols = set(LakeTable.load(spark, t.path).read().columns)
    then_cols = set(
        LakeTable.load(spark, t.path, version=versions[1]).read().columns
    )
    assert "annotation" in now_cols
    assert then_cols == past_cols and "annotation" not in then_cols
