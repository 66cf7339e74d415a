"""Multi-writer optimistic concurrency (`merge_with_retry`): the Iceberg
commit-retry loop.  The data-dir `errorifexists` write is the per-version
commit lock — at most one writer owns a version slot — and a loser retries
by reloading the head and re-running the merge, which is safe because the
lsn-max reduce makes merge application order-independent."""

import threading

from pyspark.sql import functions as F

from airbyte_custom_spark.lake.table import ConcurrentCommitError, LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.sources.generator import change_events


def _setup(spark, tmp_path, n_events=3000):
    path = str(tmp_path / "t")
    LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, num_buckets=8)
    ev = change_events(spark, n_events, n_convs=50, seed=13)
    hi = ev.agg(F.max("lsn")).first()[0]
    cuts = [0, hi // 3, 2 * hi // 3, hi]
    batches = [
        ev.filter((F.col("lsn") > cuts[i]) & (F.col("lsn") <= cuts[i + 1]))
        .persist()
        for i in range(3)
    ]
    for b in batches:
        b.count()  # materialize so threads don't re-derive lsn cuts
    return path, ev, batches


def test_concurrent_merges_all_land_order_independent(spark, tmp_path):
    path, ev, batches = _setup(spark, tmp_path)
    results, errors = {}, []

    def writer(i):
        try:
            t = LakeTable.load(spark, path)  # each writer: own handle
            # own query_id: the applied manifest is a per-query MONOTONIC
            # watermark (streaming epoch semantics), so independent writers
            # are independent queries — sharing one query_id across racing
            # writers would let a later batch's commit mark earlier ones
            # applied
            results[i] = t.merge_with_retry(
                batches[i],
                batch_id=0,
                query_id=f"writer-{i}",
                retries=8,
                pin_exchange=False,
            )
        except Exception as e:  # noqa: BLE001 - recorded for the assert
            errors.append((i, e))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert all(not r.skipped for r in results.values())

    final = LakeTable.load(spark, path)
    assert final.version == 3  # one commit per writer, whatever the order
    # value parity vs the single-writer application of the same WAL
    ref_path = str(tmp_path / "ref")
    ref = LakeTable.create(spark, ref_path, TRANSCRIPT_SCHEMA, num_buckets=8)
    ref.merge(ev, batch_id=0)
    assert sorted(final.read().collect()) == sorted(ref.read().collect())
    # every writer's batch is recorded applied under its own query
    for i in range(3):
        assert final.last_committed_batch(f"writer-{i}") == 0
    for b in batches:
        b.unpersist()


def test_same_batch_race_applies_exactly_once(spark, tmp_path):
    path, ev, batches = _setup(spark, tmp_path, n_events=2000)
    outcomes = []

    def writer():
        t = LakeTable.load(spark, path)
        outcomes.append(
            t.merge_with_retry(batches[0], batch_id=0, retries=8, pin_exchange=False)
        )

    threads = [threading.Thread(target=writer) for _ in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert len(outcomes) == 2
    assert sorted(r.skipped for r in outcomes) == [False, True], outcomes
    final = LakeTable.load(spark, path)
    assert final.version == 1  # the duplicate never produced a commit
    for b in batches:
        b.unpersist()


def test_plain_merge_conflict_raises_and_retry_recovers(spark, tmp_path):
    path, ev, batches = _setup(spark, tmp_path, n_events=2000)
    a = LakeTable.load(spark, path)
    b = LakeTable.load(spark, path)
    a.merge(batches[0], batch_id=0, pin_exchange=False)
    # b's snapshot is stale: plain merge must refuse, retry must recover
    try:
        b.merge(batches[1], batch_id=1, pin_exchange=False)
        raised = False
    except ConcurrentCommitError:
        raised = True
    assert raised
    r = b.merge_with_retry(batches[1], batch_id=1, pin_exchange=False)
    assert not r.skipped
    assert LakeTable.load(spark, path).version == 2
    for batch in batches:
        batch.unpersist()
