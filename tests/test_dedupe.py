"""Equivalence of the three latest-per-key implementations and pk checks."""

from pyspark.sql import functions as F

from airbyte_custom_spark.operators.dedupe import (
    latest_by_maxby,
    latest_by_reduce,
    latest_by_window,
    salted_latest,
)
from airbyte_custom_spark.sources.generator import change_events

from tests.util import ev, mk_events

KEYS = ("conv_id", "turn_idx")


def _as_set(df):
    return {tuple(r) for r in df.select("conv_id", "turn_idx", "lsn", "op", "text").collect()}


def test_reduce_window_salted_agree(spark):
    events = change_events(spark, 5000, n_convs=40, max_turns=6, hot_fraction=0.4)
    a = _as_set(latest_by_reduce(events, KEYS))
    b = _as_set(latest_by_window(events, KEYS))
    c = _as_set(salted_latest(events, KEYS, salt_buckets=8))
    d = _as_set(latest_by_maxby(events, KEYS))
    assert a == b == c == d
    assert len(a) == events.select(*KEYS).distinct().count()


def test_reduce_keeps_highest_lsn(spark):
    events = mk_events(
        spark,
        [ev(1, "c", "a", 0, text="v1"), ev(7, "u", "a", 0, text="v7"), ev(3, "u", "a", 0, text="v3")],
    )
    out = latest_by_reduce(events, KEYS).collect()
    assert len(out) == 1 and out[0]["text"] == "v7"


def test_delete_wins_tie(spark):
    events = mk_events(spark, [ev(5, "c", "a", 0, text="up"), ev(5, "d", "a", 0)])
    events = events.withColumn("_is_del", F.col("op") == "d")
    out = latest_by_reduce(events, KEYS, delete_col="_is_del").collect()
    assert len(out) == 1 and out[0]["op"] == "d"


def test_window_null_cursor_sorts_oldest(spark):
    """E4: NULL cursor loses to any non-null cursor (desc_nulls_last)."""
    events = mk_events(spark, [ev(1, "c", "a", 0, text="real")])
    nulled = events.withColumn("lsn", F.lit(None).cast("long")).withColumn(
        "text", F.lit("null-cursor")
    )
    both = events.unionByName(nulled)
    out = latest_by_window(both, KEYS).collect()
    assert len(out) == 1 and out[0]["text"] == "real"
