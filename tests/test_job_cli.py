"""spark-submit CLI (`airbyte_custom_spark/job.py`): the full lifecycle —
gen → init → tail → maintenance (compact / expire / gc-tombstones) and the
resumable snapshot command — driven through main(argv) in-process."""

import json

from pyspark.sql import functions as F

from airbyte_custom_spark.job import main
from airbyte_custom_spark.lake.table import LakeTable


def run(capsys, *argv):
    rc = main(list(argv), stop_session=False)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1]) if out and out[-1].startswith("{") else None


def test_cli_lifecycle(spark, tmp_path, capsys):
    seg = str(tmp_path / "seg")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    g = run(capsys, "gen", "--out", seg, "--events", "2000", "--chunks", "2")
    assert g["events"] == 2000
    i = run(capsys, "init", "--table", tbl, "--buckets", "4")
    assert i["version"] == 0
    t = run(capsys, "tail", "--table", tbl, "--source", seg, "--checkpoint", ckpt)
    assert t["events"] == 2000 and t["batches"] >= 1
    assert LakeTable.load(spark, tbl).read().count() > 0

    run(capsys, "compact", "--table", tbl, "--min-files", "1")
    e = run(capsys, "expire", "--table", tbl, "--retain-last", "1",
            "--remove-orphans", "--orphan-min-age-sec", "0")
    assert e["expired_snapshots"] >= 1
    gc = run(capsys, "gc-tombstones", "--table", tbl, "--watermark", "1")
    assert gc["version"] >= 1
    # table still reads after the full maintenance pass
    assert LakeTable.load(spark, tbl).read().count() > 0


def test_cli_resumable_snapshot(spark, tmp_path, capsys):
    tbl = str(tmp_path / "tbl2")
    run(capsys, "init", "--table", tbl, "--buckets", "2")
    src = str(tmp_path / "snap_src")
    spark.range(300).select(
        F.col("id").alias("row_id"),
        F.concat(F.lit("conv-"), (F.col("id") % 20).cast("string")).alias("conv_id"),
        (F.col("id") / 20).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(1700000000)).alias("ts"),
    ).write.parquet(src)
    s = run(
        capsys, "snapshot", "--table", tbl, "--source", src,
        "--state", str(tmp_path / "snapstate"),
        "--pk-col", "row_id", "--chunk-size", "100",
    )
    assert s["chunks_total"] == 3 and s["chunks_completed"] == 3
    assert LakeTable.load(spark, tbl).read().count() == 300
    # re-run: all chunks already complete — nothing applied
    s2 = run(
        capsys, "snapshot", "--table", tbl, "--source", src,
        "--state", str(tmp_path / "snapstate"),
        "--pk-col", "row_id", "--chunk-size", "100",
    )
    assert s2["chunks_applied_this_run"] == 0


def test_cli_monitor(spark, tmp_path, capsys):
    """monitor subcommand: stateful sequence monitor over a WAL →
    parquet of update rows + summary JSON."""
    seg = str(tmp_path / "seg")
    run(capsys, "gen", "--out", seg, "--events", "1500", "--chunks", "2")
    out = str(tmp_path / "mon")
    m = run(
        capsys, "monitor", "--source", seg,
        "--checkpoint", str(tmp_path / "mck"), "--out", out,
        "--max-files", "1",
    )
    assert m["update_rows"] >= m["conversations"] > 0
    rows = spark.read.parquet(out)
    assert {"conv_id", "events", "gaps", "regressions", "deletes"} <= set(
        rows.columns
    )


def test_cli_mor_lifecycle(spark, tmp_path, capsys):
    """init --write-mode mor → tail appends delta manifests (no bucket
    rewrites) → compact-deltas folds them; final rows identical to a CoW
    run of the same WAL."""
    seg = str(tmp_path / "seg_m")
    run(capsys, "gen", "--out", seg, "--events", "2000", "--chunks", "2")

    mor = str(tmp_path / "tbl_mor")
    run(capsys, "init", "--table", mor, "--buckets", "4",
        "--write-mode", "mor")
    run(capsys, "tail", "--table", mor, "--source", seg,
        "--checkpoint", str(tmp_path / "ck_m"))
    t_m = LakeTable.load(spark, mor)
    assert t_m.stats()["delta_files"] > 0

    cd = run(capsys, "compact-deltas", "--table", mor)
    assert cd["compacted_to_version"] is not None
    assert cd["stats"]["delta_files"] == 0

    cow = str(tmp_path / "tbl_cow")
    run(capsys, "init", "--table", cow, "--buckets", "4")
    run(capsys, "tail", "--table", cow, "--source", seg,
        "--checkpoint", str(tmp_path / "ck_c"))
    a = LakeTable.load(spark, mor).read().orderBy("conv_id", "turn_idx")
    b = LakeTable.load(spark, cow).read().orderBy("conv_id", "turn_idx")
    assert a.collect() == b.collect()


def test_cli_changes_feed(spark, tmp_path, capsys):
    """changes subcommand: i/u/d feed between versions → parquet.  From
    the empty v0 everything live is an insert and every net-deleted key
    is absent (classification itself is covered in test_read_since)."""
    seg = str(tmp_path / "seg_ch")
    tbl = str(tmp_path / "tbl_ch")
    run(capsys, "gen", "--out", seg, "--events", "1000", "--chunks", "2")
    run(capsys, "init", "--table", tbl, "--buckets", "2")
    run(capsys, "tail", "--table", tbl, "--source", seg,
        "--checkpoint", str(tmp_path / "ck1"))
    out = str(tmp_path / "feed")
    r = run(capsys, "changes", "--table", tbl, "--since-version", "0",
            "--out", out)
    feed = spark.read.parquet(out)
    n_live = LakeTable.load(spark, tbl).read().count()
    assert r["rows"] == feed.count() == n_live > 0
    assert set(
        feed.select("change_op").distinct().toPandas()["change_op"]
    ) == {"i"}


def test_cli_lookup(spark, tmp_path, capsys):
    """lookup subcommand: point lookup through the CLI — composite pk
    values parsed as col1:col2 and coerced to the table's column types."""
    seg = str(tmp_path / "seg_lk")
    tbl = str(tmp_path / "tbl_lk")
    run(capsys, "gen", "--out", seg, "--events", "1000", "--chunks", "1")
    run(capsys, "init", "--table", tbl, "--buckets", "2")
    run(capsys, "tail", "--table", tbl, "--source", seg,
        "--checkpoint", str(tmp_path / "ck_lk"))
    row = LakeTable.load(spark, tbl).read().orderBy("conv_id", "turn_idx").first()
    rc = main(
        ["lookup", "--table", tbl, "--keys", f"{row['conv_id']}:{row['turn_idx']}"],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert row["conv_id"] in out and str(row["turn_idx"]) in out


def test_cli_delete_where_and_sync(spark, tmp_path, capsys):
    """delete-where + sync subcommands: purge on the primary, replica
    catches up from the changelog and converges."""
    seg = str(tmp_path / "seg_dw")
    pri = str(tmp_path / "tbl_dw")
    rep = str(tmp_path / "tbl_dw_r")
    run(capsys, "gen", "--out", seg, "--events", "1500", "--chunks", "1")
    run(capsys, "init", "--table", pri, "--buckets", "2")
    run(capsys, "init", "--table", rep, "--buckets", "2")
    run(capsys, "tail", "--table", pri, "--source", seg,
        "--checkpoint", str(tmp_path / "ck_dw"))
    s0 = run(capsys, "sync", "--table", rep, "--from", pri,
             "--since-version", "0", "--batch-id", "0")
    assert not s0["skipped"]
    pv = s0["primary_version"]
    d = run(capsys, "delete-where", "--table", pri,
            "--where", "role = 'tool'", "--batch-id", "99")
    assert d["deleted_rows"] > 0 and not d["skipped"]
    # replay of the same purge batch skips
    d2 = run(capsys, "delete-where", "--table", pri,
             "--where", "role = 'tool'", "--batch-id", "99")
    assert d2["skipped"]
    run(capsys, "sync", "--table", rep, "--from", pri,
        "--since-version", str(pv), "--batch-id", "1")
    p = LakeTable.load(spark, pri).read()
    r = LakeTable.load(spark, rep).read()
    assert sorted(p.collect()) == sorted(r.collect())
    assert r.filter("role = 'tool'").count() == 0


def test_cli_corpus_export_and_refresh(spark, tmp_path, capsys):
    """The operable training-export path: `corpus-export` writes a parquet
    dir whose contents equal the shared assemble_corpus transform (the
    same function the oracle-checked corpus_export query certifies), and
    `refresh-corpus` re-exports exactly the post-cursor conversations."""
    from airbyte_custom_spark.functions.corpus import assemble_corpus, refresh_corpus

    seg = str(tmp_path / "seg")
    tbl = str(tmp_path / "tbl")
    run(capsys, "gen", "--out", seg, "--events", "3000", "--chunks", "1")
    run(capsys, "init", "--table", tbl, "--buckets", "4")
    run(capsys, "tail", "--table", tbl, "--source", seg,
        "--checkpoint", str(tmp_path / "ck"))

    out = str(tmp_path / "corpus")
    ce = run(capsys, "corpus-export", "--table", tbl, "--out", out)
    assert ce["documents"] > 0
    t = LakeTable.load(spark, tbl)
    want = assemble_corpus(t.read())
    got = spark.read.parquet(out)
    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(got.columns)
    assert sorted(got.select(*cols).collect()) == sorted(
        want.select(*cols).collect()
    )
    assert ce["documents"] == want.count()

    # incremental refresh from a mid-stream cursor: only conversations
    # with a post-cursor winner are re-exported
    hi = t.read(include_meta=True).agg(F.max("_lsn")).first()[0]
    cursor = int(hi) // 2
    rout = str(tmp_path / "refresh")
    rc = run(capsys, "refresh-corpus", "--table", tbl, "--out", rout,
             "--cursor", str(cursor))
    want_r = refresh_corpus(t, cursor)
    got_r = spark.read.parquet(rout)
    rcols = sorted(got_r.columns)
    assert sorted(got_r.select(*rcols).collect()) == sorted(
        want_r.select(*rcols).collect()
    )
    assert rc["documents"] == want_r.count()
    # refresh output unions cleanly with the base export (same schema,
    # same scrub+gate — refresh_corpus routes through assemble_corpus)
    assert sorted(got_r.columns) == sorted(got.columns)
    # the refreshed set is the touched conversations, minus any that no
    # longer clear the quality gate
    touched = {
        r[0] for r in t.read_since(cursor).select("conv_id").distinct().collect()
    }
    exported = {r["conv_id"] for r in got_r.select("conv_id").collect()}
    live = {r[0] for r in t.read().select("conv_id").distinct().collect()}
    assert exported <= touched & live
    gated_out = (touched & live) - exported
    if gated_out:
        # every dropped conversation must actually fail the gate
        regated = assemble_corpus(
            t.read().filter(F.col("conv_id").isin(*gated_out))
        )
        assert regated.count() == 0


def test_cli_corpus_export_decontaminate(spark, tmp_path, capsys):
    """`corpus-export --decontaminate` drops exactly the documents sharing
    a word n-gram with the benchmark parquet — a planted benchmark doc
    copying one exported document's first turn removes that conversation
    and no other; the JSON line accounts for the drop."""
    from airbyte_custom_spark.functions.corpus import decontaminate_corpus

    seg = str(tmp_path / "seg")
    tbl = str(tmp_path / "tbl")
    run(capsys, "gen", "--out", seg, "--events", "3000", "--chunks", "1")
    run(capsys, "init", "--table", tbl, "--buckets", "4")
    run(capsys, "tail", "--table", tbl, "--source", seg,
        "--checkpoint", str(tmp_path / "ck"))

    base = str(tmp_path / "base")
    run(capsys, "corpus-export", "--table", tbl, "--out", base)
    docs = spark.read.parquet(base)
    victim = docs.orderBy("conv_id").first()

    bench_path = str(tmp_path / "bench.parquet")
    spark.createDataFrame(
        [(victim["document"],)], "text string"
    ).write.parquet(bench_path)

    out = str(tmp_path / "clean")
    ce = run(capsys, "corpus-export", "--table", tbl, "--out", out,
             "--decontaminate", bench_path)
    got = spark.read.parquet(out)
    want = decontaminate_corpus(docs, spark.read.parquet(bench_path))
    assert ce["decontaminated"] == docs.count() - want.count() >= 1
    assert got.filter(F.col("conv_id") == victim["conv_id"]).count() == 0
    cols = sorted(got.columns)
    assert sorted(got.select(*cols).collect()) == sorted(
        want.select(*cols).collect()
    )


def test_cli_corpus_export_packed_and_sampled(spark, tmp_path, capsys):
    """`corpus-export --sample-rate --pack-max-tokens` ships exactly the
    library semantics: the written parquet equals assemble_corpus under
    the same knobs, and the sampled set is the deterministic md5 subset
    (so a rerun or refresh reproduces it)."""
    from airbyte_custom_spark.functions.corpus import assemble_corpus

    seg = str(tmp_path / "seg")
    tbl = str(tmp_path / "tbl")
    run(capsys, "gen", "--out", seg, "--events", "3000", "--chunks", "1")
    run(capsys, "init", "--table", tbl, "--buckets", "4")
    run(capsys, "tail", "--table", tbl, "--source", seg,
        "--checkpoint", str(tmp_path / "ck"))

    out = str(tmp_path / "packed_corpus")
    ce = run(capsys, "corpus-export", "--table", tbl, "--out", out,
             "--sample-rate", "0.5", "--pack-max-tokens", "32")
    t = LakeTable.load(spark, tbl)
    want = assemble_corpus(t.read(), sample_rate=0.5, pack_max_tokens=32)
    got = spark.read.parquet(out)
    assert "window_id" in got.columns
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    assert sorted(got.select(*cols).collect()) == sorted(
        want.select(*cols).collect()
    )
    assert ce["documents"] == want.count()
    # sampled CLI export is a strict subset of the unsampled one
    full = run(capsys, "corpus-export", "--table", tbl,
               "--out", str(tmp_path / "full_corpus"))
    assert 0 < ce["documents"] and full["documents"] > 0
    sampled_convs = {r["conv_id"] for r in got.select("conv_id").collect()}
    full_convs = {
        r["conv_id"]
        for r in spark.read.parquet(str(tmp_path / "full_corpus"))
        .select("conv_id").collect()
    }
    assert sampled_convs < full_convs


def test_cli_corpus_export_dedup(spark, tmp_path, capsys):
    """`corpus-export --dedup-threshold` drops one member of every planted
    near-dup pair (and reports the count), composing with --pack-max-tokens
    where the drop decision still comes from whole-conversation documents."""
    seg = str(tmp_path / "seg")
    tbl = str(tmp_path / "tbl")
    run(capsys, "gen", "--out", seg, "--events", "1500", "--chunks", "1")
    run(capsys, "init", "--table", tbl, "--buckets", "4")
    run(capsys, "tail", "--table", tbl, "--source", seg,
        "--checkpoint", str(tmp_path / "ck"))
    # plant exact-duplicate conversations under new ids
    t = LakeTable.load(spark, tbl)
    clones = (
        t.read()
        .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("-dup")))
        .withColumn("op", F.lit("c"))
        .withColumn("lsn", F.lit(10_000_000).cast("long") + F.col("turn_idx"))
    )
    t.merge(clones, batch_id=77)

    out = str(tmp_path / "deduped")
    ce = run(capsys, "corpus-export", "--table", tbl, "--out", out,
             "--dedup-threshold", "0.9")
    got = spark.read.parquet(out)
    kept = {r["conv_id"] for r in got.select("conv_id").collect()}
    originals = {c for c in kept | set() if not c.endswith("-dup")}
    assert ce["deduped"] > 0
    for c in {k.removesuffix("-dup") for k in kept}:
        assert (c in kept) != (c + "-dup" in kept), c

    # packed + deduped: window docs survive only for kept conversations
    pout = str(tmp_path / "deduped_packed")
    pe = run(capsys, "corpus-export", "--table", tbl, "--out", pout,
             "--dedup-threshold", "0.9", "--pack-max-tokens", "16")
    pgot = spark.read.parquet(pout)
    assert "window_id" in pgot.columns
    pkept = {r["conv_id"] for r in pgot.select("conv_id").distinct().collect()}
    assert pkept == kept
    assert pe["deduped"] == ce["deduped"]
