"""Plan-shape assertions for the transcript-analytics layer: the shuffle
discipline COVERAGE.md claims (one conv_id exchange for the windowed ops,
broadcast semi-join for the incremental refresh, no global sorts, no
Python in any plan) is enforced here, not just stated."""

import __spark_entry__ as entry_mod
from airbyte_custom_spark.plans.inspect import exchange_count, explain_str


def _plan(name, spark, sf_dir):
    df = entry_mod.queries()[name](spark, sf_dir)
    return df, explain_str(df, "simple")


def test_sessionization_two_exchanges_no_global_sort(spark, sf_dir):
    """latest-per-key reduce (1) + conv_id repartition shared by both
    windows AND the final per-session aggregation (2).  No third exchange:
    hashpartitioning(conv_id) satisfies the (conv_id, session_id) group.
    No rangepartitioning anywhere — sessionizing never globally sorts."""
    df, plan = _plan("conversation_sessions", spark, sf_dir)
    assert exchange_count(df) == 2, plan
    assert "rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan


def test_sft_pairs_two_exchanges_no_global_sort(spark, sf_dir):
    df, plan = _plan("sft_pairs", spark, sf_dir)
    assert exchange_count(df) == 2, plan
    assert "rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan


def test_corpus_export_two_exchanges_pure_jvm(spark, sf_dir):
    """reduce (1) + assembly aggregation (2); the PII regex chain and the
    token gate are map-side JVM — no extra exchange, no Python."""
    df, plan = _plan("corpus_export", spark, sf_dir)
    assert exchange_count(df) == 2, plan
    assert "rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan


def test_incremental_refresh_touched_set_is_broadcast(spark, sf_dir):
    """The touched-conversation filter must be a broadcast semi-join —
    the full final state never shuffles to learn which convs changed."""
    df, plan = _plan("incremental_corpus_refresh", spark, sf_dir)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "EvalPython" not in plan
