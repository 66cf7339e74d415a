"""functions/corpus.py: the shared export/refresh assembly — the refresh
path MUST be the base export restricted to touched conversations (same PII
scrub, same quality gate, same schema), because its output is unioned into
the same training corpus the base export feeds."""

from pyspark.sql import functions as F

from airbyte_custom_spark.functions.corpus import assemble_corpus, refresh_corpus
from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.sources.generator import change_events


def _table(spark, tmp_path, name="t"):
    return LakeTable.create(
        spark, str(tmp_path / name), TRANSCRIPT_SCHEMA,
        num_buckets=4, bucket_keys=("conv_id",),
    )


def test_refresh_redacts_gates_and_matches_export_schema(spark, tmp_path):
    t = _table(spark, tmp_path)
    ev = change_events(spark, 2000, n_convs=30, seed=77)
    hi = ev.agg(F.max("lsn")).first()[0]
    # plant PII into the SECOND half so it arrives post-cursor
    planted = ev.withColumn(
        "text",
        F.when(
            F.col("lsn") > hi // 2,
            F.concat(F.col("text"), F.lit(" reach me at leak@example.com")),
        ).otherwise(F.col("text")),
    )
    t.merge(planted.filter(F.col("lsn") <= hi // 2), batch_id=0)
    t.merge(planted.filter(F.col("lsn") > hi // 2), batch_id=1)
    cursor = int(hi) // 2

    base = assemble_corpus(t.read())
    refreshed = refresh_corpus(t, cursor)

    # identical schema → refresh parquet unions cleanly with the export
    assert refreshed.schema == base.schema

    rows = refreshed.collect()
    assert rows, "fixture must touch at least one gated-in conversation"
    # the planted email must never survive into refreshed documents
    leaked = [r for r in rows if "leak@example.com" in r["document"]]
    assert not leaked, leaked[:2]

    # refresh == base export restricted to the touched conversations
    touched = {
        r[0] for r in t.read_since(cursor).select("conv_id").distinct().collect()
    }
    want = sorted(
        base.filter(F.col("conv_id").isin(*touched)).collect()
    )
    assert sorted(rows) == want

    # the gate is live on the refresh path: every emitted doc clears it
    for r in rows:
        assert 2 <= r["n_turns"] <= 30 and r["total_tokens"] >= 5


def test_refresh_wide_gap_falls_back_to_shuffled_semi_join(spark, tmp_path):
    """Same strategy gate as LakeTable.changes_since: under the threshold
    the conv_id set broadcasts; above it (a catch-up across a wide gap,
    where a forced broadcast OOMs the driver) the semi-join falls back to
    shuffled sort-merge — value-identically."""
    from airbyte_custom_spark.plans.inspect import explain_str

    t = _table(spark, tmp_path)
    ev = change_events(spark, 2000, n_convs=30, seed=78)
    hi = int(ev.agg(F.max("lsn")).first()[0])
    t.merge(ev.filter(F.col("lsn") <= hi // 2), batch_id=0)
    t.merge(ev.filter(F.col("lsn") > hi // 2), batch_id=1)
    cursor = hi // 2

    broad = refresh_corpus(t, cursor)
    wide = refresh_corpus(t, cursor, broadcast_threshold_rows=0)
    assert "BroadcastExchange" in explain_str(broad, "simple")
    plan = explain_str(wide, "simple")
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastExchange" not in plan, plan
    assert sorted(broad.collect()) == sorted(wide.collect())


def test_decontaminate_corpus_drops_only_overlapping(spark):
    """Planted-overlap semantics + broadcast discipline of the export
    gate's decontamination stage."""
    from airbyte_custom_spark.functions.corpus import decontaminate_corpus
    from airbyte_custom_spark.plans.inspect import explain_str

    docs = spark.createDataFrame(
        [
            ("c1", "user: alpha beta gamma delta"),
            ("c2", "user: zeta eta theta iota"),
        ],
        "conv_id string, document string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma epsilon",)], "text string"
    )
    out = decontaminate_corpus(docs, bench)
    assert [r["conv_id"] for r in out.collect()] == ["c2"]
    plan = explain_str(out, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan


def test_packed_export_partitions_the_gated_corpus(spark, tmp_path):
    """`pack_max_tokens` must CHUNK the same corpus, not change it: the
    packed export covers exactly the conversations the base export gates
    in, every turn lands in exactly one window, and re-joining a
    conversation's windows in window order reconstructs its base
    document byte for byte."""
    t = _table(spark, tmp_path, "packed")
    t.merge(change_events(spark, 3000, n_convs=40, seed=5), batch_id=0)

    base = {r["conv_id"]: r for r in assemble_corpus(t.read()).collect()}
    packed = assemble_corpus(t.read(), pack_max_tokens=32).collect()
    assert packed and any(r["window_id"] > 0 for r in packed)

    by_conv = {}
    for r in packed:
        by_conv.setdefault(r["conv_id"], []).append(r)
    assert set(by_conv) == set(base)
    for cid, wins in by_conv.items():
        wins.sort(key=lambda r: r["window_id"])
        assert sum(r["n_turns"] for r in wins) == base[cid]["n_turns"]
        assert sum(r["total_tokens"] for r in wins) == base[cid]["total_tokens"]
        assert "\n".join(r["document"] for r in wins) == base[cid]["document"]


def test_sampled_export_is_the_deterministic_subset(spark, tmp_path):
    """`sample_rate` must keep exactly the conversations the md5 rule
    selects (recomputed independently with hashlib) — and the refresh
    path under the same rate can only ever emit sampled-in
    conversations."""
    import hashlib

    t = _table(spark, tmp_path, "sampled")
    ev = change_events(spark, 3000, n_convs=40, seed=9)
    hi = ev.agg(F.max("lsn")).first()[0]
    t.merge(ev.filter(F.col("lsn") <= hi // 2), batch_id=0)
    t.merge(ev.filter(F.col("lsn") > hi // 2), batch_id=1)

    base = {r["conv_id"] for r in assemble_corpus(t.read()).collect()}
    rate = 0.5
    sampled = {
        r["conv_id"]
        for r in assemble_corpus(t.read(), sample_rate=rate).collect()
    }
    expected = {
        cid for cid in base
        if int(hashlib.md5(cid.encode()).hexdigest()[:8], 16)
        < int(rate * 16 ** 8)
    }
    assert sampled == expected
    assert 0 < len(sampled) < len(base)

    refreshed = {
        r["conv_id"]
        for r in refresh_corpus(t, int(hi) // 2, sample_rate=rate).collect()
    }
    assert refreshed <= sampled  # refresh never resamples the world


def test_packed_refresh_unions_with_packed_export(spark, tmp_path):
    t = _table(spark, tmp_path, "packedref")
    ev = change_events(spark, 2000, n_convs=30, seed=11)
    hi = ev.agg(F.max("lsn")).first()[0]
    t.merge(ev.filter(F.col("lsn") <= hi // 2), batch_id=0)
    t.merge(ev.filter(F.col("lsn") > hi // 2), batch_id=1)
    base = assemble_corpus(t.read(), pack_max_tokens=32)
    ref = refresh_corpus(t, int(hi) // 2, pack_max_tokens=32)
    assert ref.schema == base.schema
    assert ref.count() > 0


def test_dedup_corpus_keeps_one_per_cluster(spark, tmp_path):
    """Near-duplicate conversations (identical text under another id)
    collapse to ONE kept member per cluster; unique conversations all
    survive; the corpus-side join is a broadcast anti against the drop
    set (the duplicates, not the corpus)."""
    from airbyte_custom_spark.functions.corpus import (
        corpus_dup_ids,
        dedup_corpus,
    )
    from airbyte_custom_spark.plans.inspect import explain_str

    t = _table(spark, tmp_path, "dup")
    ev = change_events(spark, 2000, n_convs=25, seed=13)
    clones = ev.withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("-dup"))
    ).withColumn("lsn", F.col("lsn") + F.lit(10_000_000))
    t.merge(ev.unionByName(clones), batch_id=0)

    docs = assemble_corpus(t.read())
    base = {r["conv_id"] for r in docs.select("conv_id").collect()}
    originals = {c for c in base if not c.endswith("-dup")}
    assert {c + "-dup" for c in originals} <= base  # clones gated in too

    kept_df = dedup_corpus(docs, threshold=0.9)
    kept = {r["conv_id"] for r in kept_df.select("conv_id").collect()}
    for c in originals:
        assert (c in kept) != (c + "-dup" in kept), c  # exactly one survives
    assert len(kept) == len(originals)
    drop = corpus_dup_ids(docs, threshold=0.9)
    assert drop.count() == len(originals)
    plan = explain_str(
        docs.join(F.broadcast(drop), "conv_id", "left_anti"), "simple"
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan

    # large-drop-set fallback: with the broadcast budget forced to zero
    # the anti join must NOT be a forced broadcast (the changes_since
    # rule — never force-broadcast a set bounded only by the dup rate),
    # and the kept set is identical either way
    kept_big = dedup_corpus(docs, threshold=0.9, broadcast_threshold_rows=0)
    assert {r["conv_id"] for r in kept_big.select("conv_id").collect()} == kept
    # the final anti join must NOT be force-broadcast above the budget
    # (AQE picking broadcast from measured sizes is allowed; the hint is
    # not): the small-set variant carries exactly one more broadcast
    # hint than the over-budget variant — the gated one
    kept_small = dedup_corpus(docs, threshold=0.9)
    hints_small = explain_str(kept_small, "extended").split(
        "== Optimized"
    )[0].count("ResolvedHint")
    hints_big = explain_str(kept_big, "extended").split(
        "== Optimized"
    )[0].count("ResolvedHint")
    assert hints_big == 0 and hints_small > 0, (hints_small, hints_big)
