"""Context-window packing (functions/packing.py): hand-computed window
assignments, the straddling-turn rule, sparse ids for over-budget turns,
pass-through columns, and the one-exchange plan shape."""

import pytest

from airbyte_custom_spark.functions.packing import pack_context_windows
from airbyte_custom_spark.plans.inspect import exchange_count, explain_str


def _pack(spark, rows, max_tokens):
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "tok"])
    out = pack_context_windows(df, ["conv_id"], "turn_idx", "tok", max_tokens)
    return {
        (r["conv_id"], r["turn_idx"]): r["window_id"] for r in out.collect()
    }


def test_hand_computed_assignment(spark):
    # cum_before: t0=0, t1=10, t2=30, t3=70 with budget 32
    rows = [("c", 0, 10), ("c", 1, 20), ("c", 2, 40), ("c", 3, 5)]
    got = _pack(spark, rows, 32)
    assert got == {
        ("c", 0): 0,   # starts at offset 0
        ("c", 1): 0,   # starts at offset 10
        ("c", 2): 0,   # starts at offset 30 — straddles, stays in window 0
        ("c", 3): 2,   # starts at offset 70 -> floor(70/32) = 2
    }


def test_window_ids_sparse_when_one_turn_exceeds_budget(spark):
    """A single turn longer than the budget consumes several window ids;
    the ids after it skip — callers see the gap instead of a silently
    overfull next window."""
    rows = [("c", 0, 100), ("c", 1, 1)]
    got = _pack(spark, rows, 32)
    assert got[("c", 0)] == 0
    assert got[("c", 1)] == 3  # floor(100/32)


def test_keys_pack_independently(spark):
    rows = [("a", 0, 30), ("a", 1, 30), ("b", 0, 30), ("b", 1, 30)]
    got = _pack(spark, rows, 32)
    assert got[("a", 1)] == 0 and got[("b", 1)] == 0  # each key restarts


def test_every_window_within_budget_plus_one_turn(spark):
    import pyspark.sql.functions as F

    rows = [("c", i, 7 + (i * 13) % 23) for i in range(200)]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "tok"])
    out = pack_context_windows(df, ["conv_id"], "turn_idx", "tok", 64)
    per_window = (
        out.groupBy("conv_id", "window_id")
        .agg(F.sum("tok").alias("total"), F.max("tok").alias("biggest"))
        .collect()
    )
    for r in per_window:
        assert r["total"] <= 64 + r["biggest"]  # greedy-append bound


def test_columns_pass_through_and_custom_name(spark):
    rows = [("c", 0, 5, "x")]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "tok", "extra"])
    out = pack_context_windows(
        df, ["conv_id"], "turn_idx", "tok", 10, window_col="ctx"
    )
    assert set(out.columns) == {"conv_id", "turn_idx", "tok", "extra", "ctx"}


def test_nonpositive_budget_raises(spark):
    df = spark.createDataFrame([("c", 0, 5)], ["conv_id", "turn_idx", "tok"])
    with pytest.raises(ValueError):
        pack_context_windows(df, ["conv_id"], "turn_idx", "tok", 0)


def test_plan_one_exchange_no_python(spark):
    rows = [("c%d" % (i % 7), i, 5) for i in range(100)]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "tok"])
    out = pack_context_windows(df, ["conv_id"], "turn_idx", "tok", 16)
    plan = explain_str(out, "simple")
    assert exchange_count(out) == 1, plan
    assert "rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_registry_query_shares_the_aggregation_exchange(spark, sf_dir):
    """The full context_window_pack query (cum-sum window + per-window
    aggregation) must reuse the conv_id partitioning: exactly the
    latest-per-key reduce exchange plus the conv_id window exchange, no
    third shuffle for the groupBy and no global sort."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["context_window_pack"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert exchange_count(df) == 2, plan
    assert "rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan
