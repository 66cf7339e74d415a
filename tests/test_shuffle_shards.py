"""Deterministic corpus shuffle + sharding (`functions/shuffle.py` and
the `corpus-export --shuffle-shards` CLI): shard assignment and
within-shard order must be pure functions of the example id — stable
across input partitionings and re-exports — and the written shard files
must actually carry the shuffle order."""

import json

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from airbyte_custom_spark.functions.shuffle import (
    shard_assign,
    shuffled_shards,
)
from airbyte_custom_spark.job import main
from airbyte_custom_spark.plans.inspect import exchange_count, explain_str


def run(capsys, *argv):
    rc = main(list(argv), stop_session=False)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1]) if out and out[-1].startswith("{") else None


def _docs(spark, n=500):
    return spark.range(n).select(
        F.concat(F.lit("conv-"), F.col("id").cast("string")).alias("conv_id"),
        (F.col("id") % 7).cast("int").alias("n_turns"),
    )


def test_assignment_is_partitioning_independent(spark):
    """shard and shuffle_key depend only on the id: the same rows through
    a different input partitioning (and a different row order) get the
    identical assignment — the property that makes an incremental
    refresh land its rows exactly where a full re-export would."""
    a = shuffled_shards(_docs(spark), ["conv_id"], 8)
    b = shuffled_shards(
        _docs(spark).repartition(13).sortWithinPartitions("n_turns"),
        ["conv_id"],
        8,
    )
    rows_a = {r["conv_id"]: (r["shard"], r["shuffle_key"]) for r in a.collect()}
    rows_b = {r["conv_id"]: (r["shard"], r["shuffle_key"]) for r in b.collect()}
    assert rows_a == rows_b
    assert all(0 <= s < 8 for s, _ in rows_a.values())
    # not all in one shard, and shard ⊥ shuffle_key (different hashes):
    # every shard is hit at n=500
    assert len({s for s, _ in rows_a.values()}) == 8


def test_shard_assign_rejects_nonpositive(spark):
    import pytest

    with pytest.raises(ValueError):
        shard_assign(["conv_id"], 0)


def test_write_shape_one_exchange_no_global_sort(spark):
    """The production write plan: exactly ONE hash exchange (on shard)
    and an in-task sort — rangepartitioning (a global sort) never
    appears, and the assignment columns add no exchange of their own."""
    out = (
        shuffled_shards(_docs(spark), ["conv_id"], 4)
        .repartition(4, "shard")
        .sortWithinPartitions("shard", "shuffle_key")
    )
    plan = explain_str(out, "simple")
    assert exchange_count(out) == 1, plan
    assert "rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_cli_sharded_export_roundtrip(spark, tmp_path, capsys):
    """`corpus-export --shuffle-shards N` writes shard=K directories
    whose union equals the unsharded export, with every written file
    internally ordered by shuffle_key (the read order IS the shuffle),
    and a re-export reproduces byte-identical assignments."""
    seg = str(tmp_path / "seg")
    tbl = str(tmp_path / "tbl")
    run(capsys, "gen", "--out", seg, "--events", "3000", "--chunks", "1")
    run(capsys, "init", "--table", tbl, "--buckets", "4")
    run(capsys, "tail", "--table", tbl, "--source", seg,
        "--checkpoint", str(tmp_path / "ck"))

    flat = str(tmp_path / "flat")
    run(capsys, "corpus-export", "--table", tbl, "--out", flat)
    shr = str(tmp_path / "sharded")
    ce = run(capsys, "corpus-export", "--table", tbl, "--out", shr,
             "--shuffle-shards", "4")
    assert ce["shards"] == 4

    got = spark.read.parquet(shr)
    want = spark.read.parquet(flat)
    assert set(got.columns) == set(want.columns) | {"shard", "shuffle_key"}
    cols = sorted(want.columns)
    assert sorted(got.select(*cols).collect()) == sorted(
        want.select(*cols).collect()
    )
    # shard dirs present and within-file order == shuffle_key order
    import pathlib

    files = sorted(pathlib.Path(shr).glob("shard=*/*.parquet"))
    assert {p.parent.name for p in files} == {f"shard={i}" for i in range(4)}
    for p in files:
        keys = pq.read_table(p, columns=["shuffle_key"])["shuffle_key"]
        keys = keys.to_pylist()
        assert keys == sorted(keys), p

    # determinism across re-exports: same (id → shard, key) everywhere
    shr2 = str(tmp_path / "sharded2")
    run(capsys, "corpus-export", "--table", tbl, "--out", shr2,
        "--shuffle-shards", "4")
    a = {
        r["conv_id"]: (r["shard"], r["shuffle_key"])
        for r in got.select("conv_id", "shard", "shuffle_key").collect()
    }
    b = {
        r["conv_id"]: (r["shard"], r["shuffle_key"])
        for r in spark.read.parquet(shr2)
        .select("conv_id", "shard", "shuffle_key")
        .collect()
    }
    assert a == b


def test_cli_sharded_refresh_matches_base_placement(spark, tmp_path, capsys):
    """`refresh-corpus --shuffle-shards N`: every refreshed example gets
    the IDENTICAL shard + shuffle_key the base sharded export gave it —
    the property that lets a consumer merge a refresh into an existing
    sharded corpus without re-shuffling anything."""
    from airbyte_custom_spark.lake.table import LakeTable

    seg = str(tmp_path / "seg")
    tbl = str(tmp_path / "tbl")
    run(capsys, "gen", "--out", seg, "--events", "3000", "--chunks", "1")
    run(capsys, "init", "--table", tbl, "--buckets", "4")
    run(capsys, "tail", "--table", tbl, "--source", seg,
        "--checkpoint", str(tmp_path / "ck"))

    base = str(tmp_path / "base")
    run(capsys, "corpus-export", "--table", tbl, "--out", base,
        "--shuffle-shards", "4")
    t = LakeTable.load(spark, tbl)
    hi = t.read(include_meta=True).agg(F.max("_lsn")).first()[0]
    rout = str(tmp_path / "refresh")
    rj = run(capsys, "refresh-corpus", "--table", tbl, "--out", rout,
             "--cursor", str(int(hi) // 2), "--shuffle-shards", "4")
    assert rj["shards"] == 4
    got_r = spark.read.parquet(rout)
    assert got_r.count() > 0
    placement = {
        r["conv_id"]: (r["shard"], r["shuffle_key"])
        for r in spark.read.parquet(base)
        .select("conv_id", "shard", "shuffle_key")
        .collect()
    }
    for r in got_r.select("conv_id", "shard", "shuffle_key").collect():
        assert placement[r["conv_id"]] == (r["shard"], r["shuffle_key"])


def test_cli_merge_shards_equals_full_reexport(spark, tmp_path, capsys):
    """`merge-shards` folds a sharded refresh into the base corpus in
    place: after the merge, the base dir equals a full re-export at the
    new table version — same rows, same shard, same within-file order —
    and only the touched shard dirs were rewritten (untouched shard
    files keep their mtime: a real O(touched shards) merge, not a
    disguised full rewrite)."""
    import pathlib

    from airbyte_custom_spark.lake.table import LakeTable

    seg = str(tmp_path / "seg")
    tbl = str(tmp_path / "tbl")
    # two contiguous-LSN binlog segments; phase 1 tails only the first
    run(capsys, "gen", "--out", seg, "--events", "4000", "--chunks", "2")
    run(capsys, "init", "--table", tbl, "--buckets", "4")
    run(capsys, "tail", "--table", tbl, "--source", f"{seg}/chunk=0",
        "--checkpoint", str(tmp_path / "ck1"), "--query-id", "q1")

    base = str(tmp_path / "base")
    run(capsys, "corpus-export", "--table", tbl, "--out", base,
        "--shuffle-shards", "8")
    t = LakeTable.load(spark, tbl)
    cursor = int(t.read(include_meta=True).agg(F.max("_lsn")).first()[0])

    # phase 2: the second segment arrives
    run(capsys, "tail", "--table", tbl, "--source", f"{seg}/chunk=1",
        "--checkpoint", str(tmp_path / "ck2"), "--query-id", "q2")
    delta = str(tmp_path / "delta")
    run(capsys, "refresh-corpus", "--table", tbl, "--out", delta,
        "--cursor", str(cursor), "--shuffle-shards", "8")

    pre = {
        p.parent.name: (str(p), p.stat().st_mtime_ns)
        for p in pathlib.Path(base).glob("shard=*/*.parquet")
    }
    conv_shard = {
        r["conv_id"]: r["shard"]
        for r in spark.read.parquet(base).select("conv_id", "shard")
        .collect()
    }
    mj = run(capsys, "merge-shards", "--base", base, "--delta", delta,
             "--table", tbl, "--cursor", str(cursor))
    assert 0 < mj["rewritten_shards"] <= 8

    full = str(tmp_path / "full")
    run(capsys, "corpus-export", "--table", tbl, "--out", full,
        "--shuffle-shards", "8")

    def by_shard(path):
        out = {}
        for p in sorted(pathlib.Path(path).glob("shard=*/*.parquet")):
            tb = pq.read_table(p, columns=["conv_id", "shuffle_key",
                                           "document"])
            out.setdefault(p.parent.name, []).extend(
                zip(*(tb[c].to_pylist() for c in tb.column_names))
            )
        return out

    got, want = by_shard(base), by_shard(full)
    assert got == want  # rows, shard placement, AND order all equal

    # the expected rewrite set, derived independently: shards holding a
    # touched conv before the merge ∪ shards the delta landed in
    touched = {
        r[0] for r in t.read_since(cursor).select("conv_id").distinct()
        .collect()
    }
    expect = {
        f"shard={s}" for c, s in conv_shard.items() if c in touched
    } | {
        p.parent.name
        for p in pathlib.Path(delta).glob("shard=*/*.parquet")
    }
    assert mj["rewritten_shards"] == len(expect)
    untouched = set(pre) - expect
    for name in untouched:  # untouched shard files were never rewritten
        path, mtime = pre[name]
        assert pathlib.Path(path).stat().st_mtime_ns == mtime, name

    # --- crash-safety of the swap (round-6 ADVICE fix): simulate both
    # interrupted states the aside-move protocol can leave behind, then
    # re-run merge-shards — it must recover and converge to the same
    # full re-export (idempotent re-apply of an already-applied delta).
    shard_dirs = sorted(pathlib.Path(base).glob("shard=*"))
    # state A: aside renamed, staged dir never landed (crash mid-swap)
    a = shard_dirs[0]
    a.rename(str(a) + ".old")
    # state B: staged dir landed, aside left behind (crash before cleanup)
    b = shard_dirs[1]
    import shutil as _sh

    _sh.copytree(b, str(b) + ".old")
    mj2 = run(capsys, "merge-shards", "--base", base, "--delta", delta,
              "--table", tbl, "--cursor", str(cursor))
    assert mj2["rewritten_shards"] == mj["rewritten_shards"]
    assert not list(pathlib.Path(base).glob("*.old"))
    assert by_shard(base) == want  # recovered AND converged

    # non-local base paths must be rejected loudly, not silently no-op
    import pytest as _pytest

    with _pytest.raises(ValueError, match="local"):
        run(capsys, "merge-shards", "--base", "s3a://bucket/corpus",
            "--delta", delta, "--table", tbl, "--cursor", str(cursor))

    # a MISSING delta path must abort loudly — only the legitimate
    # empty-partitioned-dir (just _SUCCESS) case substitutes an empty
    # delta; swallowing a typo'd path would silently delete every
    # touched conversation while reporting success
    with _pytest.raises(Exception, match="PATH_NOT_FOUND|Path does not exist"):
        run(capsys, "merge-shards", "--base", base,
            "--delta", str(tmp_path / "no-such-delta"),
            "--table", tbl, "--cursor", str(cursor))
    assert by_shard(base) == want  # base untouched by the failed run


def test_cli_sharded_packed_export_keys_windows(spark, tmp_path, capsys):
    """Packed exports shard by (conv_id, window_id): two windows of one
    conversation may land in DIFFERENT shards — the shuffle treats each
    context window as an independent example."""
    seg = str(tmp_path / "seg")
    tbl = str(tmp_path / "tbl")
    run(capsys, "gen", "--out", seg, "--events", "3000", "--chunks", "1")
    run(capsys, "init", "--table", tbl, "--buckets", "4")
    run(capsys, "tail", "--table", tbl, "--source", seg,
        "--checkpoint", str(tmp_path / "ck"))

    shr = str(tmp_path / "packed")
    run(capsys, "corpus-export", "--table", tbl, "--out", shr,
        "--pack-max-tokens", "20", "--shuffle-shards", "4")
    got = spark.read.parquet(shr)
    assert "window_id" in got.columns
    multi = (
        got.groupBy("conv_id")
        .agg(
            F.countDistinct("window_id").alias("w"),
            F.countDistinct("shard").alias("s"),
        )
        .filter("w > 1 AND s > 1")
        .count()
    )
    assert multi > 0  # windows really scatter across shards
