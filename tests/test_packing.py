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


def _pack_multi(spark, rows, max_tokens, stride):
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "tok"])
    out = pack_context_windows(
        df, ["conv_id"], "turn_idx", "tok", max_tokens, stride=stride
    )
    got = {}
    for r in out.collect():
        got.setdefault((r["conv_id"], r["turn_idx"]), []).append(r["window_id"])
    return {k: sorted(v) for k, v in got.items()}


def test_slide_hand_computed_overlap(spark):
    # offsets: t0=0, t1=10, t2=40, t3=80; windows of 64 sliding by 32
    rows = [("c", 0, 10), ("c", 1, 30), ("c", 2, 40), ("c", 3, 5)]
    got = _pack_multi(spark, rows, 64, 32)
    assert got == {
        ("c", 0): [0],       # offset 0: only window 0 covers it
        ("c", 1): [0],       # offset 10: only window 0
        ("c", 2): [0, 1],    # offset 40: windows [0,64) and [32,96)
        ("c", 3): [1, 2],    # offset 80: windows [32,96) and [64,128)
    }


def test_slide_with_stride_equal_max_matches_default(spark):
    rows = [("c", i, 7 + (i * 5) % 11) for i in range(50)]
    plain = _pack_multi(spark, rows, 16, 16)
    default = {
        k: [v] for k, v in _pack(spark, rows, 16).items()
    }
    assert plain == default


def test_slide_membership_matches_independent_rule(spark):
    """Every turn must land in EXACTLY the windows whose span covers its
    starting offset — recomputed independently in Python."""
    rows = [("c", i, 3 + (i * 7) % 9) for i in range(80)]
    max_tokens, stride = 24, 8
    got = _pack_multi(spark, rows, max_tokens, stride)
    offset = 0
    for cid, idx, tok in rows:
        want = [
            w
            for w in range(0, offset // stride + 1)
            if w * stride <= offset < w * stride + max_tokens
        ]
        assert got[(cid, idx)] == want, (idx, offset, got[(cid, idx)], want)
        offset += tok


def test_slide_invalid_stride_raises(spark):
    df = spark.createDataFrame([("c", 0, 5)], ["conv_id", "turn_idx", "tok"])
    with pytest.raises(ValueError):
        pack_context_windows(df, ["conv_id"], "turn_idx", "tok", 16, stride=0)
    with pytest.raises(ValueError):
        pack_context_windows(df, ["conv_id"], "turn_idx", "tok", 16, stride=17)


def test_slide_plan_one_exchange_fanout_mapside(spark):
    """The explode fan-out must run AFTER the keyed exchange (a map-side
    Generate), never add a shuffle of its own, and stay JVM-only."""
    rows = [("c%d" % (i % 7), i, 5) for i in range(100)]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "tok"])
    out = pack_context_windows(
        df, ["conv_id"], "turn_idx", "tok", 16, stride=8
    )
    plan = explain_str(out, "simple")
    assert exchange_count(out) == 1, plan
    assert "Generate explode" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan
    # the internal offset column must not leak into the output
    assert "__pack_cum_before" not in out.columns


def test_slide_registry_query_two_exchanges(spark, sf_dir):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["context_window_slide"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert exchange_count(df) == 2, plan
    assert "rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan
