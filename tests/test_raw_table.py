"""T4 dedupRawTable over the raw/final two-table composition."""

from pyspark.sql import functions as F

from airbyte_custom_spark.lake.raw import dedup_raw_table
from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA

from tests.util import ev, mk_events


def _raw(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "raw"), TRANSCRIPT_SCHEMA, num_buckets=2
    )


def test_dedup_raw_keeps_latest_per_key(spark, tmp_path):
    raw = _raw(spark, tmp_path)
    raw.append(mk_events(spark, [
        ev(1, "c", "a", 0, text="v1"),
        ev(2, "u", "a", 0, text="v2"),
        ev(3, "u", "a", 0, text="v3"),
        ev(4, "c", "b", 0, text="w1"),
    ]))
    assert raw.read().count() == 4  # append keeps every version
    dedup_raw_table(raw)  # no watermark → plain latest-per-key
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in raw.read().collect()}
    assert got == {("a", 0): "v3", ("b", 0): "w1"}


def test_dedup_raw_watermark_preserves_untyped_history(spark, tmp_path):
    raw = _raw(spark, tmp_path)
    raw.append(mk_events(spark, [
        ev(1, "c", "a", 0, text="v1"),
        ev(2, "u", "a", 0, text="v2"),   # ≤ wm: superseded by lsn 2? kept (latest ≤ wm)
        ev(5, "u", "a", 0, text="v5"),   # > wm: untyped — must survive
        ev(6, "u", "a", 0, text="v6"),   # > wm: untyped — must survive too
    ]))
    dedup_raw_table(raw, applied_lsn_watermark=3)
    lsns = sorted(
        r["_lsn"] for r in raw.read(include_meta=True).collect()
    )
    # typed region (≤3) collapses to its latest (lsn 2); both untyped rows stay
    assert lsns == [2, 5, 6]


def test_dedup_raw_delete_wins_in_typed_region(spark, tmp_path):
    raw = _raw(spark, tmp_path)
    raw.append(mk_events(spark, [
        ev(1, "c", "a", 0, text="v1"),
        ev(2, "d", "a", 0),
    ]))
    dedup_raw_table(raw)
    rows = raw.read(include_deleted=True, include_meta=True).collect()
    assert len(rows) == 1 and rows[0]["_deleted"] and rows[0]["_lsn"] == 2
    # user view: key absent
    assert raw.read().count() == 0
