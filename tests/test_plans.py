"""Plan-shape assertions: pushdown reaches the scan, projections prune
columns, the merge path avoids per-row Python (SURVEY.md §4)."""

import os

from pyspark.sql import functions as F

from airbyte_custom_spark.plans.inspect import (
    assert_pushed_filters,
    explain_str,
    scan_read_schema,
    wholestage_spans,
)


def test_cursor_filter_pushed_to_parquet(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    q = ev.filter(F.col("event_id") > 500).select("event_id", "user_id")
    assert_pushed_filters(q, "event_id")


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    q = li.select("l_orderkey", "l_quantity")
    cols = scan_read_schema(q)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_merge_plan_has_no_python_eval(spark, tmp_path):
    """The CDC merge pipeline must be pure JVM: no BatchEvalPython /
    ArrowEvalPython operators anywhere in the physical plan."""
    from airbyte_custom_spark.lake.table import LakeTable
    from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
    from airbyte_custom_spark.sources.generator import change_events

    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=4)
    t.merge(change_events(spark, 2000, n_convs=50), batch_id=0)
    plan = explain_str(t.read(), "simple")
    assert "EvalPython" not in plan
    assert wholestage_spans(t.read()) >= 1


def test_generator_is_whole_stage_codegen(spark):
    from airbyte_custom_spark.sources.generator import change_events

    ev = change_events(spark, 1000)
    plan = explain_str(ev, "simple")
    assert "EvalPython" not in plan
    assert wholestage_spans(ev) >= 1


def test_merge_reduce_is_single_shuffle(spark, tmp_path):
    """The merge dataflow (union + latest-per-key reduce) must contain
    exactly ONE shuffle exchange, and the reduce must collapse map-side
    (WindowGroupLimit Partial BEFORE the exchange — at most one row per key
    ships, the hot-key defense); with pk bucket keys the write then adds no
    exchange (layout-aligned, `lake/table.py` module docstring) — this is
    the round-2 scaling-gate fix."""
    from airbyte_custom_spark.lake.table import LakeTable
    from airbyte_custom_spark.plans.inspect import exchange_count
    from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
    from airbyte_custom_spark.sources.generator import change_events

    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=4)
    t.merge(change_events(spark, 2000, n_convs=50), batch_id=0)
    rows = t._finalize_rows(change_events(spark, 500, n_convs=50), None, defer_ids=True)
    tgt = t._read_files(t.live_files())
    merged = t._fill_ids_cols(t._merged_frame(rows, tgt), None)
    with_bucket = merged.withColumn("bucket", t.bucket_expr(merged))
    plan = explain_str(with_bucket, "simple")
    assert exchange_count(with_bucket) == 1, plan
    # map-side top-1 per key runs before the exchange
    partial_pos = plan.find("WindowGroupLimit", plan.find("Exchange"))
    assert "Partial" in plan and partial_pos != -1, plan


def test_broadcast_join_for_small_queries(spark, sf_dir):
    """brute_force_topk must broadcast the query side (no shuffle of the
    big scan side)."""
    from airbyte_custom_spark.functions.embeddings import brute_force_topk

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = e.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = explain_str(brute_force_topk(e, q, k=3), "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_unpinned_merge_keeps_mapside_partial(spark, tmp_path):
    """round-4 `pin_exchange=False` (concurrent-merge mode): the reduce
    must STILL collapse map-side — WindowGroupLimit Partial below the
    reduce exchange — with the layout repartition as a second, separate
    exchange of already-reduced rows.  (An explicit repartition before
    the window would silently DROP the partial — measured; that is why
    the unpinned form keeps the reduce at session shuffle count and
    repartitions after.)"""
    from airbyte_custom_spark.lake.table import LakeTable
    from airbyte_custom_spark.plans.inspect import exchange_count
    from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
    from airbyte_custom_spark.sources.generator import change_events

    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, num_buckets=4)
    t.merge(change_events(spark, 2000, n_convs=50), batch_id=0)
    rows = t._finalize_rows(change_events(spark, 500, n_convs=50), None, defer_ids=True)
    tgt = t._read_files(t.live_files())
    merged = t._fill_ids_cols(t._merged_frame(rows, tgt), None)
    # the unpinned write path: explicit layout repartition AFTER the reduce
    laid_out = merged.withColumn("bucket", t.bucket_expr(merged)).repartition(
        4, "bucket"
    )
    plan = explain_str(laid_out, "simple")
    assert exchange_count(laid_out) == 2, plan
    first_ex = plan.find("Exchange")
    second_ex = plan.find("Exchange", first_ex + 1)
    partial_pos = plan.find("WindowGroupLimit", second_ex)
    assert partial_pos != -1 and "Partial" in plan, plan
