"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes each implemented operator from SURVEY.md §2 as a
callable (spark, sf_dir) → DataFrame; ``oracle_sql()`` gives the DuckDB
equivalent over the same parquet views.  The CDC queries all share one
SQL-expressible event derivation (``DERIVATION_SQL``) so the engine's
pipelines — including the full LakeTable merge and the Structured-Streaming
tail — are checked against plain window-SQL replay semantics.

Timestamps are emitted as epoch-microsecond BIGINTs (Spark ``unix_micros``
/ DuckDB ``epoch_us``) so value hashes are tz-representation-proof.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airbyte_custom_spark.config import IngestConfig
from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.operators.dedupe import latest_by_reduce
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.sources.generator import (
    DERIVATION_SQL,
    events_from_table,
    write_event_chunks,
)
from airbyte_custom_spark.streaming.pipeline import CdcIngestJob

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_PAYLOAD_OUT = [
    "conv_id",
    "turn_idx",
    "role",
    "text",
    "tool",
]


def _us(col: str) -> F.Column:
    """epoch micros; parquet columns arrive as TIMESTAMP_NTZ, which
    unix_micros rejects — cast first (value-preserving: UTC session)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def _final_payload(df: DataFrame) -> DataFrame:
    """Project the comparison payload: ts → epoch micros (tz-proof)."""
    return df.select(
        *_PAYLOAD_OUT, F.unix_micros(F.col("ts")).alias("ts_us")
    )


_ORACLE_FINAL = f"""
WITH ev AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev
)
SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us
FROM ranked WHERE rn = 1 AND op <> 'd'
"""


def _fresh_dir(tag: str) -> str:
    d = tempfile.mkdtemp(prefix=f"acs-{tag}-")
    shutil.rmtree(d, ignore_errors=True)
    return d


# ---------------------------------------------------------------------------
# CDC queries (SURVEY.md §2.1/§2.4/§2.6)
# ---------------------------------------------------------------------------


def q_cdc_flatten_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/P5: binlog-shaped flattened change events with _ab_cdc_* metadata."""
    ev = events_from_table(spark, sf_dir)
    return ev.select(
        "lsn",
        "op",
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        _us("ts").alias("ts_us"),
        _us("_ab_cdc_updated_at").alias("cdc_updated_at_us"),
        _us("_ab_cdc_deleted_at").alias("cdc_deleted_at_us"),
        "source_partition",
    )


def q_cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 dedup: one row per (conv_id, turn_idx), greatest lsn — via the
    map-side-combining reduce (not the window), checked against window SQL."""
    ev = events_from_table(spark, sf_dir)
    latest = latest_by_reduce(ev, ("conv_id", "turn_idx"), order_col="lsn")
    return latest.select("conv_id", "turn_idx", "lsn", "op", "text")


def q_cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full engine replay — derive events → single MERGE into a
    fresh LakeTable → read final state (T2+T3+T5+K1)."""
    ev = events_from_table(spark, sf_dir)
    t = LakeTable.create(spark, _fresh_dir("final"), TRANSCRIPT_SCHEMA, num_buckets=16)
    t.merge(ev, batch_id=0)
    return _final_payload(t.read())


def q_cdc_final_state_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same replay applied as 3 sequential incremental merges (two-
    sequential-reads composition, CAT `test_incremental.py:108-153`)."""
    ev = events_from_table(spark, sf_dir)
    hi = ev.agg(F.max("lsn")).first()[0] or 0
    t = LakeTable.create(spark, _fresh_dir("incr"), TRANSCRIPT_SCHEMA, num_buckets=16)
    cuts = [0, hi // 3, 2 * hi // 3, hi]
    for i in range(3):
        batch = ev.filter((F.col("lsn") > cuts[i]) & (F.col("lsn") <= cuts[i + 1]))
        t.merge(batch, batch_id=i)
    return _final_payload(t.read())


def q_rebucket_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-layout evolution under load: ingest into a 16-bucket table,
    rebucket to 10 mid-stream (folding is part of the same commit), apply
    one more batch into the NEW layout, read — must equal the plain
    replay (Iceberg partition-evolution analog; bucket is a pure function
    of the key, recomputed per version)."""
    ev = events_from_table(spark, sf_dir)
    hi = ev.agg(F.max("lsn")).first()[0] or 0
    t = LakeTable.create(
        spark, _fresh_dir("rebucket"), TRANSCRIPT_SCHEMA, num_buckets=16
    )
    cut = 2 * hi // 3
    t.merge(ev.filter(F.col("lsn") <= cut), batch_id=0)
    t.rebucket(10)
    t.merge(ev.filter(F.col("lsn") > cut), batch_id=1)
    return _final_payload(t.read())


def q_changelog_between_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog scan (`changes_since`): the net i/u/d feed between two
    snapshot versions — what a downstream replica applies to catch up
    (Iceberg changelog-scan analog).  Keys created-and-deleted between
    the versions net to nothing."""
    ev = events_from_table(spark, sf_dir)
    hi = ev.agg(F.max("lsn")).first()[0] or 0
    t = LakeTable.create(
        spark, _fresh_dir("changelog"), TRANSCRIPT_SCHEMA, num_buckets=16
    )
    cut = 2 * hi // 3
    t.merge(ev.filter(F.col("lsn") <= cut), batch_id=0)
    v_from = t.version
    t.merge(ev.filter(F.col("lsn") > cut), batch_id=1)
    out = t.changes_since(v_from)
    return out.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("_lsn").alias("lsn"),
        "change_op",
    )


def q_changes_since_wide_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`changes_since` across a WIDE version gap (a replica catching up
    after a long outage): `broadcast_threshold_rows=0` forces the
    scale path — the changed-key set is NOT broadcast (a real wide gap is
    billions of keys; a forced broadcast OOMs the driver), both liveness
    joins run as shuffled sort-merge, and the old-version scan stays
    bucket-pruned.  Values must be identical to the broadcast path —
    the oracle is the same net-changes SQL, cut at 1/3 of the WAL
    (changelog_between_versions cuts at 2/3, so the two queries check
    different change sets)."""
    ev = events_from_table(spark, sf_dir)
    hi = ev.agg(F.max("lsn")).first()[0] or 0
    t = LakeTable.create(
        spark, _fresh_dir("widegap"), TRANSCRIPT_SCHEMA, num_buckets=16
    )
    cut = hi // 3
    t.merge(ev.filter(F.col("lsn") <= cut), batch_id=0)
    v_from = t.version
    t.merge(ev.filter(F.col("lsn") > cut), batch_id=1)
    out = t.changes_since(v_from, broadcast_threshold_rows=0)
    return out.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("_lsn").alias("lsn"),
        "change_op",
    )


def q_incremental_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downstream incremental export (`read_since`): keys whose CURRENT
    winning version landed after a cursor — upserts AND tombstones, the
    feed a downstream cursor-based sync consumes (S2 cursor semantics
    turned outward at the sink; Iceberg incremental-scan analog).  Files
    whose manifest lsn_max ≤ cursor are skipped without opening them —
    O(changed data), not O(table)."""
    ev = events_from_table(spark, sf_dir)
    hi = ev.agg(F.max("lsn")).first()[0] or 0
    t = LakeTable.create(
        spark, _fresh_dir("export"), TRANSCRIPT_SCHEMA, num_buckets=16
    )
    cuts = [0, hi // 3, 2 * hi // 3, hi]
    for i in range(3):
        batch = ev.filter((F.col("lsn") > cuts[i]) & (F.col("lsn") <= cuts[i + 1]))
        t.merge(batch, batch_id=i)
    cursor = 2 * hi // 3
    out = t.read_since(cursor)
    return out.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("_lsn").alias("lsn"),
        F.col("_deleted").alias("deleted"),
    )


def q_mor_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental replay in merge-on-read mode (Iceberg v2
    ``write.merge.mode=merge-on-read``; `IcebergConsumer.java:140-224` is
    the CoW-equivalent reference sink): each merge appends a bucket-
    aligned delta manifest with NO target read, ``compact_deltas`` folds
    the first two, and read() reduces base ∪ the still-outstanding third
    delta per key — exercising both the physical fold and the read-time
    fold against the same SQL oracle as the CoW paths (the two write
    modes are read-equivalent by construction)."""
    ev = events_from_table(spark, sf_dir)
    hi = ev.agg(F.max("lsn")).first()[0] or 0
    t = LakeTable.create(
        spark, _fresh_dir("mor"), TRANSCRIPT_SCHEMA, num_buckets=16,
        write_mode="mor",
    )
    cuts = [0, hi // 3, 2 * hi // 3, hi]
    for i in range(3):
        batch = ev.filter((F.col("lsn") > cuts[i]) & (F.col("lsn") <= cuts[i + 1]))
        t.merge(batch, batch_id=i)
        if i == 1:
            t.compact_deltas()
    return _final_payload(t.read())


def q_time_travel_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolation time travel (C6 schema/commit history; Iceberg
    `VERSION AS OF` analog, `IcebergConsumer.java` snapshot chain): ingest
    the WAL as 3 incremental merges, then read the table AS OF the version
    committed by the SECOND merge — must equal the SQL replay of the lsn
    prefix (lsn ≤ 2·max/3).  Later commits touch only new snapshot
    descriptors; an earlier version's manifest refs stay readable until
    expire_snapshots, so the past read is byte-stable, not best-effort."""
    ev = events_from_table(spark, sf_dir)
    hi = ev.agg(F.max("lsn")).first()[0] or 0
    t = LakeTable.create(
        spark, _fresh_dir("ttravel"), TRANSCRIPT_SCHEMA, num_buckets=16
    )
    cuts = [0, hi // 3, 2 * hi // 3, hi]
    versions = []
    for i in range(3):
        batch = ev.filter((F.col("lsn") > cuts[i]) & (F.col("lsn") <= cuts[i + 1]))
        versions.append(t.merge(batch, batch_id=i).version)
    past = LakeTable.load(spark, t.path, version=versions[1])
    return _final_payload(past.read())


def q_rollback_excise_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollback + selective replay (the bad-deploy recovery sequence;
    Iceberg rollback_to_snapshot analog): ingest the WAL as 3 incremental
    merges, tag the version committed by the FIRST, roll back to the tag
    (a NEW metadata-only head — linear history, applied-batch manifest
    rewound), then replay ONLY the third batch.  The excised middle batch
    must leave no trace and the replayed batch must NOT be skipped by the
    exactly-once manifest: final state ≡ the SQL replay of events with
    lsn ≤ max/3 OR lsn > 2·max/3."""
    ev = events_from_table(spark, sf_dir)
    hi = ev.agg(F.max("lsn")).first()[0] or 0
    t = LakeTable.create(
        spark, _fresh_dir("rollbk"), TRANSCRIPT_SCHEMA, num_buckets=16
    )
    cuts = [0, hi // 3, 2 * hi // 3, hi]
    batches = [
        ev.filter((F.col("lsn") > cuts[i]) & (F.col("lsn") <= cuts[i + 1]))
        for i in range(3)
    ]
    t.merge(batches[0], batch_id=0)
    t.tag("good")
    t.merge(batches[1], batch_id=1)
    t.merge(batches[2], batch_id=2)
    t.rollback(tag="good")
    r = t.merge(batches[2], batch_id=2)  # replays: manifest rewound to 0
    assert not r.skipped
    return _final_payload(t.read())


def q_wap_publish_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish gate (Iceberg ``spark.wap.id`` + cherrypick
    analog; reference's commitRawTable/overwrite discipline): batch 1
    merges normally; the WRONG batch (the lsn tail) is STAGED with
    ``merge(publish=False)`` — durable but invisible: the head version and
    the exactly-once manifest are untouched — audited, and ABANDONED (its
    files and snapshot deleted, published chain intact); then the correct
    middle batch is staged against the same parent, its audit passes
    (0 pk dups, 0 NULL pks), and ``publish`` swings the pointer in one
    atomic rename.  Final state ≡ the SQL replay of the lsn prefix
    (lsn ≤ 2·max/3) — the abandoned stage must leave no trace."""
    ev = events_from_table(spark, sf_dir)
    hi = ev.agg(F.max("lsn")).first()[0] or 0
    t = LakeTable.create(spark, _fresh_dir("wap"), TRANSCRIPT_SCHEMA, num_buckets=16)
    cuts = [0, hi // 3, 2 * hi // 3, hi]
    batches = [
        ev.filter((F.col("lsn") > cuts[i]) & (F.col("lsn") <= cuts[i + 1]))
        for i in range(3)
    ]
    v1 = t.merge(batches[0], batch_id=0).version
    bad = t.merge(batches[2], batch_id=1, publish=False)  # wrong cut staged
    assert t.version == v1 and t.last_committed_batch("default") == 0, (
        "staged merge must stay invisible until publish"
    )
    t.audit(bad.version)  # the audit read IS the WAP gate
    t.abandon_staged(bad.version)
    good = t.merge(batches[1], batch_id=1, publish=False)  # re-stage, same slot
    a = t.audit(good.version)
    assert a["pk_dups"] == 0 and a["null_pk_rows"] == 0, a
    t.publish(good.version)
    return _final_payload(t.read())


def q_point_lookup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup / serving read (`LakeTable.lookup` — the Iceberg
    bucket-transform predicate-pushdown analog): ingest the WAL into a
    conversation-co-located layout (bucket_keys=("conv_id",)), then fetch
    the CURRENT state of the 5 lexicographically-smallest live
    conversations.  The lookup recomputes bucket ids from the key
    literals and prunes manifest+files to O(|keys|) buckets before Spark
    lists anything — O(touched buckets), never O(table) (pruning is
    plan-asserted in tests/test_lookup.py; value parity is checked
    here)."""
    ev = events_from_table(spark, sf_dir)
    t = LakeTable.create(
        spark,
        _fresh_dir("lookup"),
        TRANSCRIPT_SCHEMA,
        num_buckets=16,
        bucket_keys=("conv_id",),
    )
    t.merge(ev, batch_id=0)
    ids = [
        r[0]
        for r in t.read()
        .select("conv_id")
        .distinct()
        .orderBy("conv_id")
        .limit(5)
        .collect()
    ]
    return _final_payload(t.lookup(ids))


def q_replica_sync_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascading CDC — changelog out of one table, into another: the
    PRIMARY ingests the WAL as 3 merges; a REPLICA catches up in two
    incremental `changes_since` → `apply_changes` rounds (after v2, then
    v2→v3), each reading only O(changed data) off the primary.  The
    replica's final state must value-equal the full replay — proving the
    changelog emits exactly the net changes (inserts/updates/deletes with
    the winning lsn) and that applying it is idempotent merge, not a
    copy."""
    ev = events_from_table(spark, sf_dir)
    hi = ev.agg(F.max("lsn")).first()[0] or 0
    primary = LakeTable.create(
        spark, _fresh_dir("repl-p"), TRANSCRIPT_SCHEMA, num_buckets=16
    )
    replica = LakeTable.create(
        spark, _fresh_dir("repl-r"), TRANSCRIPT_SCHEMA, num_buckets=16
    )
    cuts = [0, hi // 3, 2 * hi // 3, hi]
    versions = []
    for i in range(3):
        batch = ev.filter((F.col("lsn") > cuts[i]) & (F.col("lsn") <= cuts[i + 1]))
        versions.append(primary.merge(batch, batch_id=i).version)
    # catch-up 1: everything up to v2; catch-up 2: just the v2→v3 delta
    mid = LakeTable.load(spark, primary.path, version=versions[1])
    replica.apply_changes(mid.changes_since(0), batch_id=0)
    replica.apply_changes(primary.changes_since(versions[1]), batch_id=1)
    return _final_payload(replica.read())


def q_delete_where_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate delete as CDC (`LakeTable.delete_where` — the Iceberg
    `DELETE FROM` / GDPR-purge analog): ingest the WAL, then purge every
    live tool turn.  The purge is a tombstone batch one LSN above the
    table's watermark driven through the normal merge, so it replays
    idempotently and replicas see it as ordinary deletes.  Final state ≡
    the SQL replay minus role='tool' winners."""
    ev = events_from_table(spark, sf_dir)
    t = LakeTable.create(
        spark, _fresh_dir("purge"), TRANSCRIPT_SCHEMA, num_buckets=16
    )
    t.merge(ev, batch_id=0)
    r = t.delete_where("role = 'tool'", batch_id=1)
    assert not r.skipped
    # idempotent: replaying the purge batch is a no-op
    assert t.delete_where("role = 'tool'", batch_id=1).skipped
    return _final_payload(t.read())


def q_conversation_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript assembly — the step that turns the CDC final table into
    a training corpus: per conversation, the turns in stable turn order
    collapsed into one document (role-prefixed lines), with turn count and
    a tool-usage flag.  One hash-partitioned aggregation over the final
    state; `array_sort(collect_list(struct(...)))` keeps ordering inside
    the group so no global sort is ever needed — at 100 TB this is one
    shuffle keyed on conv_id, the same key the table is already bucketed
    by when bucket_keys=("conv_id",)."""
    ev = events_from_table(spark, sf_dir)
    t = LakeTable.create(
        spark,
        _fresh_dir("assemble"),
        TRANSCRIPT_SCHEMA,
        num_buckets=16,
        bucket_keys=("conv_id",),
    )
    t.merge(ev, batch_id=0)
    turns = F.array_sort(
        F.collect_list(F.struct("turn_idx", "role", "text"))
    )
    return (
        t.read()
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.array_join(
                F.transform(
                    turns,
                    lambda s: F.concat_ws(": ", s["role"], s["text"]),
                ),
                "\n",
            ).alias("document"),
            F.max((F.col("tool").isNotNull()).cast("int")).alias("uses_tools"),
        )
    )


_ORACLE_ASSEMBLY = f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, turn_idx, role, text, tool
  FROM ranked WHERE rn = 1 AND op <> 'd'
)
SELECT
  conv_id,
  count(*) AS n_turns,
  string_agg(concat_ws(': ', role, text), chr(10) ORDER BY turn_idx)
    AS document,
  max(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS uses_tools
FROM final
GROUP BY conv_id
"""


def _final_state_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final transcript state via the map-side top-1 reduce + delete-wins —
    the cheap derivation for the analytics-layer queries below (the sink
    path itself is oracle-covered by cdc_final_state and friends)."""
    ev = events_from_table(spark, sf_dir)
    latest = latest_by_reduce(ev, ("conv_id", "turn_idx"), order_col="lsn")
    return latest.filter(F.col("op") != "d")


_SESSION_GAP_US = 86_400 * 1_000_000  # 1 day


def q_conversation_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time sessionization of the final transcript state: within a
    conversation (turn order), a gap of more than one day between turns
    starts a new session — lag + cumulative-sum-of-flags, both windowed
    over conv_id only, so the whole operator is ONE shuffle keyed on
    conv_id and no global sort exists anywhere (at 100 TB each
    conversation's turns sort within their hash partition; a
    conv-bucketed table layout makes even that shuffle collapse)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    is_new = F.when(gap.isNull() | (gap > F.lit(_SESSION_GAP_US)), 1).otherwise(0)
    cum = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        _final_state_events(spark, sf_dir)
        .select("conv_id", "turn_idx", _us("ts").alias("ts_us"))
        .withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(cum))
        .groupBy("conv_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
        )
    )


_ORACLE_SESSIONS = f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, turn_idx, ts
  FROM ranked WHERE rn = 1 AND op <> 'd'
),
lagged AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS prev_us
  FROM final
),
flagged AS (
  SELECT conv_id, turn_idx, ts_us,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM lagged
),
sess AS (
  SELECT conv_id, ts_us,
         CAST(sum(is_new) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT conv_id, session_id,
       count(*) AS n_turns,
       min(ts_us) AS session_start_us,
       max(ts_us) AS session_end_us
FROM sess
GROUP BY conv_id, session_id
"""


def q_transcript_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub before training export: turns congruent to 3 mod 7 get a
    deterministic planted contact line (email + phone + IP), then every
    turn runs through `redact_pii` — a chain of JVM regexp_replace calls,
    pure map-side codegen, no shuffle beyond the final-state reduce.  The
    oracle replicates the plant and the exact pattern chain
    (`redact_pii_sql`), so placeholders and untouched text are both
    value-checked."""
    from airbyte_custom_spark.functions.text import redact_pii

    planted = F.when(
        F.col("turn_idx") % 7 == 3,
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("turn_idx").cast("string"),
            F.lit("@example.com or +1 555 123 4567, ip 10.0.0."),
            F.col("turn_idx").cast("string"),
        ),
    ).otherwise(F.col("text"))
    return (
        _final_state_events(spark, sf_dir)
        .select("conv_id", "turn_idx", planted.alias("text"))
        .select(
            "conv_id", "turn_idx", redact_pii("text").alias("clean_text")
        )
    )


def _oracle_redaction() -> str:
    from airbyte_custom_spark.functions.text import redact_pii_sql

    planted = (
        "CASE WHEN turn_idx % 7 = 3 THEN text || ' contact u' || "
        "CAST(turn_idx AS VARCHAR) || '@example.com or +1 555 123 4567, "
        "ip 10.0.0.' || CAST(turn_idx AS VARCHAR) ELSE text END"
    )
    return f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, turn_idx, {planted} AS text
  FROM ranked WHERE rn = 1 AND op <> 'd'
)
SELECT conv_id, turn_idx, {redact_pii_sql('text')} AS clean_text
FROM final
"""


def q_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT prompt/response extraction: each user turn paired with the
    immediately following assistant turn (turn order) — one `lead` window
    partitioned by conv_id only, then a map-side filter; the single
    exchange is the conv_id repartition the final-state reduce already
    pays for on a conv-bucketed layout."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        _final_state_events(spark, sf_dir)
        .select("conv_id", "turn_idx", "role", "text")
        .withColumn("next_role", F.lead("role").over(w))
        .withColumn("next_text", F.lead("text").over(w))
        .filter((F.col("role") == "user") & (F.col("next_role") == "assistant"))
        .select(
            "conv_id",
            F.col("turn_idx").alias("prompt_turn_idx"),
            F.col("text").alias("prompt"),
            F.col("next_text").alias("response"),
        )
    )


_ORACLE_SFT_PAIRS = f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, turn_idx, role, text
  FROM ranked WHERE rn = 1 AND op <> 'd'
),
led AS (
  SELECT conv_id, turn_idx, role, text,
         lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS next_role,
         lead(text) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS next_text
  FROM final
)
SELECT conv_id,
       turn_idx AS prompt_turn_idx,
       text AS prompt,
       next_text AS response
FROM led
WHERE role = 'user' AND next_role = 'assistant'
"""


def q_incremental_corpus_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus refresh — the daily-export composition: after
    three merged batches, `read_since(cursor)` yields the keys whose
    winner landed after the cursor (file-skipping by per-file lsn bounds),
    their DISTINCT conv_ids become the touched-conversation set, and ONLY
    those conversations are re-assembled from the full final state
    (broadcast semi-join: the big side never shuffles for the filter, and
    the assembly aggregation shuffles O(touched convs), not O(table)).  A
    conversation whose only post-cursor change is a tombstone re-assembles
    without the deleted turn — or drops out entirely when nothing is left.
    At 100 TB with a daily cursor this touches the recent commits plus the
    touched conversations' buckets — never the whole corpus.  The
    transform is the SHARED `functions/corpus.py::refresh_corpus` — the
    same code the `job.py refresh-corpus` CLI ships — which routes the
    touched subset through `assemble_corpus` itself, so the refresh
    applies the SAME PII scrub, quality gate, and output schema as the
    base export (a refresh parquet unions cleanly with corpus-export
    output)."""
    from airbyte_custom_spark.functions.corpus import refresh_corpus

    ev = events_from_table(spark, sf_dir)
    hi = ev.agg(F.max("lsn")).first()[0] or 0
    t = LakeTable.create(
        spark, _fresh_dir("refresh"), TRANSCRIPT_SCHEMA,
        num_buckets=16, bucket_keys=("conv_id",),
    )
    cuts = [0, hi // 3, 2 * hi // 3, hi]
    for i in range(3):
        batch = ev.filter((F.col("lsn") > cuts[i]) & (F.col("lsn") <= cuts[i + 1]))
        t.merge(batch, batch_id=i)
    cursor = 2 * hi // 3
    return refresh_corpus(t, cursor)


def _oracle_corpus_refresh() -> str:
    # mirrors _oracle_corpus_export exactly (same redaction chain, same
    # gate, same output schema) restricted to the post-cursor-touched
    # conversations — because refresh_corpus IS assemble_corpus over the
    # touched subset
    from airbyte_custom_spark.functions.text import redact_pii_sql

    return f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, turn_idx, role, text
  FROM ranked WHERE rn = 1 AND op <> 'd'
),
changed AS (
  SELECT DISTINCT conv_id FROM ev0
  WHERE lsn > (2 * (SELECT max(lsn) FROM ev0)) // 3
),
docs AS (
  SELECT f.conv_id,
         count(*) AS n_turns,
         string_agg(concat_ws(': ', f.role, {redact_pii_sql('f.text')}),
                    chr(10) ORDER BY f.turn_idx) AS document
  FROM final f
  JOIN changed c ON c.conv_id = f.conv_id
  GROUP BY f.conv_id
),
scored AS (
  SELECT conv_id, n_turns, document,
         len(list_filter(regexp_split_to_array(document, '\\s+'),
                         x -> x <> '')) AS total_tokens
  FROM docs
)
SELECT conv_id, n_turns, total_tokens, document
FROM scored
WHERE n_turns BETWEEN 2 AND 30 AND total_tokens >= 5
"""


def q_session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows over the live CDC envelope
    (`streaming/dedup.py::session_stats`, `F.session_window`): per
    conversation, change events chain into a session while consecutive
    gaps stay under 1 day — run as a REAL multi-batch streaming query
    (sessions merge across micro-batches; complete output mode so the
    memory sink holds the final merged result, which for session windows
    equals the batch run by definition — production uses update/append +
    watermark eviction, pytest-covered).  The DuckDB oracle derives the
    identical sessions with the lag + cumulative-flag-sum formulation, so
    Spark's window-merge semantics are value-checked end to end."""
    import uuid

    from airbyte_custom_spark.schema import CDC_EVENT_SCHEMA
    from airbyte_custom_spark.streaming.dedup import session_stats

    ev = events_from_table(spark, sf_dir)
    src = _fresh_dir("sesswal")
    write_event_chunks(ev, src, n_chunks=4)
    name = "sess_" + uuid.uuid4().hex[:12]
    stream = (
        spark.readStream.schema(CDC_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    q = (
        session_stats(stream, gap="1 day", horizon="365 days")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", _fresh_dir("sessckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.table(name).select(
        "conv_id",
        F.unix_micros(F.col("session_start").cast("timestamp"))
            .alias("session_start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp"))
            .alias("session_end_us"),
        "events",
        "min_lsn",
        "max_lsn",
    )


_ORACLE_SESSION_WINDOWS = f"""
WITH ev0 AS ({DERIVATION_SQL}),
lagged AS (
  SELECT conv_id, lsn, _ab_cdc_updated_at AS ts,
         lag(_ab_cdc_updated_at) OVER (
           PARTITION BY conv_id ORDER BY _ab_cdc_updated_at, lsn) AS prev
  FROM ev0
),
flagged AS (
  SELECT conv_id, lsn, ts,
         CASE WHEN prev IS NULL
                   OR epoch_us(ts) - epoch_us(prev) >= {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM lagged
),
sess AS (
  SELECT conv_id, lsn, ts,
         sum(is_new) OVER (PARTITION BY conv_id ORDER BY ts, lsn
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT conv_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) + {_SESSION_GAP_US} AS session_end_us,
       count(*) AS events,
       min(lsn) AS min_lsn,
       max(lsn) AS max_lsn
FROM sess
GROUP BY conv_id, sid
"""


def q_conversation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-budget accounting over the final state: per conversation,
    whitespace-token totals, the user/assistant split, and tool-turn count
    — all integers, so oracle parity is exact.  Map-side token counting
    (pure JVM split/filter/size) then one aggregation keyed on conv_id."""
    from airbyte_custom_spark.functions.text import token_count

    tok = token_count("text")
    return (
        _final_state_events(spark, sf_dir)
        .select("conv_id", "role", "tool", tok.alias("tok"))
        .groupBy("conv_id")
        .agg(
            F.sum("tok").alias("total_tokens"),
            F.sum(F.when(F.col("role") == "user", F.col("tok")).otherwise(0))
                .alias("user_tokens"),
            F.sum(F.when(F.col("role") == "assistant", F.col("tok")).otherwise(0))
                .alias("assistant_tokens"),
            F.sum(F.col("tool").isNotNull().cast("long")).alias("n_tool_turns"),
        )
    )


_ORACLE_TOKEN_BUDGET = f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, role, text, tool
  FROM ranked WHERE rn = 1 AND op <> 'd'
),
tokd AS (
  SELECT conv_id, role, tool,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
           AS tok
  FROM final
)
SELECT conv_id,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN role = 'user' THEN tok ELSE 0 END) AS BIGINT)
         AS user_tokens,
       CAST(sum(CASE WHEN role = 'assistant' THEN tok ELSE 0 END) AS BIGINT)
         AS assistant_tokens,
       CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tool_turns
FROM tokd
GROUP BY conv_id
"""


def q_conversation_bpe_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-budget accounting under the pinned BPE merge table
    (`functions/text.py BPE_MERGES`): per conversation, exact subword
    token totals and the user/assistant split.  Unlike the whitespace
    budget, these counts mean something for a subword-tokenized training
    run — and the encode is still pure JVM map work (char split + a
    literal-replace merge chain inside a higher-order transform), no
    Python, no extra shuffle beyond the one conv_id aggregation."""
    from airbyte_custom_spark.functions.text import bpe_vocab_token_count

    tok = bpe_vocab_token_count("text")
    return (
        _final_state_events(spark, sf_dir)
        .select("conv_id", "role", tok.alias("tok"))
        .groupBy("conv_id")
        .agg(
            F.sum("tok").alias("bpe_tokens"),
            F.sum(F.when(F.col("role") == "user", F.col("tok")).otherwise(0))
                .alias("user_bpe_tokens"),
            F.sum(F.when(F.col("role") == "assistant", F.col("tok")).otherwise(0))
                .alias("assistant_bpe_tokens"),
        )
    )


def _oracle_bpe_budget() -> str:
    from airbyte_custom_spark.functions.text import bpe_vocab_token_count_sql

    tok = bpe_vocab_token_count_sql("text")
    return f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, role, text
  FROM ranked WHERE rn = 1 AND op <> 'd'
),
tokd AS (
  SELECT conv_id, role, {tok} AS tok
  FROM final
)
SELECT conv_id,
       CAST(sum(tok) AS BIGINT) AS bpe_tokens,
       CAST(sum(CASE WHEN role = 'user' THEN tok ELSE 0 END) AS BIGINT)
         AS user_bpe_tokens,
       CAST(sum(CASE WHEN role = 'assistant' THEN tok ELSE 0 END) AS BIGINT)
         AS assistant_bpe_tokens
FROM tokd
GROUP BY conv_id
"""


def q_corpus_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-export pipeline in one plan: CDC final state →
    planted-PII scrub (`redact_pii`, map-side regex chain) → per-
    conversation assembly (one conv_id-keyed aggregation, in-group
    array_sort — no global sort) → quality gate (turn-count band + token
    floor on the assembled document).  One shuffle end to end after the
    final-state reduce; everything else is whole-stage-codegen map work.
    The oracle rebuilds the identical corpus in SQL, so the composition —
    not just each stage — is value-checked.  The transform is the SHARED
    `functions/corpus.py::assemble_corpus` — the same code the
    `job.py corpus-export` CLI ships, so the oracle certifies the operable
    path, not a test-only twin."""
    from airbyte_custom_spark.functions.corpus import assemble_corpus

    planted = F.when(
        F.col("turn_idx") % 7 == 3,
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("turn_idx").cast("string"),
            F.lit("@example.com or +1 555 123 4567, ip 10.0.0."),
            F.col("turn_idx").cast("string"),
        ),
    ).otherwise(F.col("text"))
    return assemble_corpus(
        _final_state_events(spark, sf_dir)
        .select("conv_id", "turn_idx", "role", planted.alias("text"))
    )


def _oracle_corpus_export() -> str:
    from airbyte_custom_spark.functions.text import redact_pii_sql

    planted = (
        "CASE WHEN turn_idx % 7 = 3 THEN text || ' contact u' || "
        "CAST(turn_idx AS VARCHAR) || '@example.com or +1 555 123 4567, "
        "ip 10.0.0.' || CAST(turn_idx AS VARCHAR) ELSE text END"
    )
    return f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, turn_idx, role, {planted} AS text
  FROM ranked WHERE rn = 1 AND op <> 'd'
),
docs AS (
  SELECT conv_id,
         count(*) AS n_turns,
         string_agg(concat_ws(': ', role, {redact_pii_sql('text')}),
                    chr(10) ORDER BY turn_idx) AS document
  FROM final
  GROUP BY conv_id
),
scored AS (
  SELECT conv_id, n_turns, document,
         len(list_filter(regexp_split_to_array(document, '\\s+'),
                         x -> x <> '')) AS total_tokens
  FROM docs
)
SELECT conv_id, n_turns, total_tokens, document
FROM scored
WHERE n_turns BETWEEN 2 AND 30 AND total_tokens >= 5
"""


def q_corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment + reproducible shuffle
    order (`functions/shuffle.py` — the write stage behind
    `job.py corpus-export --shuffle-shards`).  Every decision is a pure
    function of the example id: shard = h31(id) % N (engine-portable
    hash), within-shard order = md5(id) lexicographic — so the oracle
    re-derives the COMPLETE permutation bit-for-bit in DuckDB.  The
    result is one row per shard carrying a position-weighted digest
    (sum over pos·h31(id) mod 2^31-1): any row in the wrong shard OR the
    wrong position changes the digest, so value-equality here certifies
    the full shuffle order, not just membership counts.

    Scale shape: shard/key are zero-exchange codegen'd row expressions;
    the production write adds exactly one hash exchange on `shard` plus
    an in-task (spillable) sort — never a global sort.  The digest's
    per-shard window sort exists only for this compact certificate.

    Reference analog: the reference ends at final-table order and leaves
    shard/shuffle to trainers (base-typing-deduping final-table
    contract, DefaultTyperDeduper.java); this is that missing step."""
    from pyspark.sql.window import Window

    from airbyte_custom_spark.functions.shuffle import shuffled_shards
    from airbyte_custom_spark.functions.text import P31, h31

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id")
    )
    sh = shuffled_shards(docs, ["doc_id"], 8)
    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    )
    return (
        sh.withColumn("pos", pos)
        .withColumn(
            "term", (F.col("pos") * h31("doc_id")) % F.lit(P31)
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("term").alias("order_digest"),
            F.min("shuffle_key").alias("first_key"),
        )
    )


def _oracle_corpus_shards() -> str:
    from airbyte_custom_spark.functions.text import P31, h31_sql

    return f"""
WITH ids AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents
),
keyed AS (
  SELECT doc_id,
         {h31_sql('doc_id')} % 8 AS shard,
         md5(doc_id) AS shuffle_key
  FROM ids
),
posed AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY shard ORDER BY shuffle_key, doc_id) AS pos
  FROM keyed
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum((pos * ({h31_sql('doc_id')})) % {P31}) AS BIGINT)
         AS order_digest,
       min(shuffle_key) AS first_key
FROM posed
GROUP BY shard
"""


def q_corpus_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher duplicate-LINE signals over ASSEMBLED conversations — the
    repetition filter that runs on multi-line transcript documents (the
    flat `documents` table has no line structure; the assembled corpus
    does: one ``role: text`` line per turn).  Duplicate lines are PLANTED
    the same way corpus_export plants PII: turns with turn_idx % 11 == 5
    are cloned at turn_idx + 1000, so their assembled lines appear twice.
    Line stats are the same zero-shuffle sorted-array fold as
    `doc_repetition` (`functions/text.py::line_repetition_stats`); the
    only exchange is the conv_id assembly itself."""
    from airbyte_custom_spark.functions.corpus import assemble_corpus
    from airbyte_custom_spark.functions.text import line_repetition_stats

    final = _final_state_events(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text"
    )
    clones = final.filter(F.col("turn_idx") % 11 == 5).withColumn(
        "turn_idx", F.col("turn_idx") + F.lit(1000)
    )
    docs = assemble_corpus(final.unionByName(clones), redact=False)
    r = line_repetition_stats("document")
    return docs.select(
        "conv_id",
        F.size(F.split(F.col("document"), "\n")).cast("long").alias("n_lines"),
        r["dup_items"].alias("dup_line_count"),
        r["dup_chars"].alias("dup_line_chars"),
        r["top_count"].alias("top_line_count"),
        F.length("document").cast("long").alias("n_chars"),
    )


def _oracle_corpus_repetition() -> str:
    return f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, turn_idx, role, text
  FROM ranked WHERE rn = 1 AND op <> 'd'
),
with_clones AS (
  SELECT conv_id, turn_idx, role, text FROM final
  UNION ALL
  SELECT conv_id, turn_idx + 1000 AS turn_idx, role, text
  FROM final WHERE turn_idx % 11 = 5
),
docs AS (
  SELECT conv_id, count(*) AS n_turns,
         string_agg(concat_ws(': ', role, text),
                    chr(10) ORDER BY turn_idx) AS document
  FROM with_clones GROUP BY conv_id
),
corpus AS (
  SELECT conv_id, document FROM docs
  WHERE n_turns BETWEEN 2 AND 30
    AND len(list_filter(regexp_split_to_array(document, '\\s+'),
                        x -> x <> '')) >= 5
),
lines AS (
  SELECT conv_id, unnest(string_split(document, chr(10))) AS ln FROM corpus
),
c AS (
  SELECT conv_id, ln, CAST(count(*) AS BIGINT) AS cnt
  FROM lines GROUP BY conv_id, ln
),
agg AS (
  SELECT conv_id,
         CAST(sum(cnt) AS BIGINT) AS n_lines,
         CAST(COALESCE(sum(cnt) FILTER (cnt >= 2), 0) AS BIGINT)
             AS dup_line_count,
         CAST(COALESCE(sum(cnt * length(ln)) FILTER (cnt >= 2), 0) AS BIGINT)
             AS dup_line_chars,
         CAST(max(cnt) AS BIGINT) AS top_line_count
  FROM c GROUP BY conv_id
)
SELECT corpus.conv_id, agg.n_lines, agg.dup_line_count, agg.dup_line_chars,
       agg.top_line_count, CAST(length(corpus.document) AS BIGINT) AS n_chars
FROM corpus JOIN agg USING (conv_id)
"""


_SAMPLE_RATES = {"en": 0.25, "de": 0.5}  # downsample the dominant langs


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mix rebalance over the documents table:
    keep 25% of English, 50% of German, everything else whole — decided
    per row by an md5-prefix hash threshold, so the SAMPLE ITSELF (not
    just its size) is reproducible across engines and the oracle is a
    plain WHERE clause (`functions/sampling.py`).  Scale shape: zero
    exchanges — a codegen'd row-local predicate that pushes to the scan
    like any other filter."""
    from airbyte_custom_spark.functions.sampling import stratified_sample

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return stratified_sample(docs, "lang", "doc_id", _SAMPLE_RATES).select(
        "doc_id", "lang", "source"
    )


_ORACLE_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, source
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE lang WHEN 'en' THEN '40000000'
                WHEN 'de' THEN '80000000'
                ELSE 'zzzzzzzz' END
"""

_PACK_MAX_TOKENS = 8


def q_context_window_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing of the final transcript state: each
    conversation's turns, in turn order, chunked into windows of at most
    `_PACK_MAX_TOKENS` (8) whitespace tokens by cumulative token offset
    — sized to the synthetic transcripts (~5-token turns, ~30-token
    conversations) so the multi-window path is genuinely exercised by
    the oracle comparison, not just by pytest
    (`functions/packing.py` — the last step before transcripts become
    fixed-length training examples).  Per (conv_id, window_id): turn
    count, token total, and the turn range — all integers, so parity is
    exact.  ONE conv_id-keyed exchange (window cum-sum + the per-window
    aggregation share it), no global sort, no Python."""
    from airbyte_custom_spark.functions.packing import pack_context_windows
    from airbyte_custom_spark.functions.text import token_count

    ev = _final_state_events(spark, sf_dir).select(
        "conv_id", "turn_idx", token_count("text").alias("tok")
    )
    packed = pack_context_windows(
        ev, ["conv_id"], "turn_idx", "tok", _PACK_MAX_TOKENS
    )
    return packed.groupBy("conv_id", "window_id").agg(
        F.count("*").cast("long").alias("turns"),
        F.sum("tok").cast("long").alias("window_tokens"),
        F.min("turn_idx").cast("long").alias("first_turn"),
        F.max("turn_idx").cast("long").alias("last_turn"),
    )


_ORACLE_CONTEXT_WINDOWS = f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, turn_idx, text
  FROM ranked WHERE rn = 1 AND op <> 'd'
),
tokd AS (
  SELECT conv_id, turn_idx,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
           AS tok
  FROM final
),
offs AS (
  SELECT conv_id, turn_idx, tok,
         COALESCE(sum(tok) OVER (
             PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM tokd
)
SELECT conv_id,
       CAST(cum_before // {_PACK_MAX_TOKENS} AS BIGINT) AS window_id,
       CAST(count(*) AS BIGINT) AS turns,
       CAST(sum(tok) AS BIGINT) AS window_tokens,
       CAST(min(turn_idx) AS BIGINT) AS first_turn,
       CAST(max(turn_idx) AS BIGINT) AS last_turn
FROM offs
GROUP BY conv_id, CAST(cum_before // {_PACK_MAX_TOKENS} AS BIGINT)
"""

_SLIDE_STRIDE = 4


def q_context_window_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-context packing (stride < max): window w covers token
    offsets [w*4, w*4 + 8), so each turn lands in every window whose
    span covers its starting offset (~2× replication at this overlap;
    strides sized to the ~5-token synthetic turns so the fan-out path is
    genuinely exercised by the oracle comparison) —
    the pretraining rule that keeps boundary-adjacent text from being
    seen in only one truncated context.  The window-id fan-out is a
    map-side explode(sequence(lo, hi)) AFTER the one conv_id exchange;
    the per-window aggregation reuses the same partitioning."""
    from airbyte_custom_spark.functions.packing import pack_context_windows
    from airbyte_custom_spark.functions.text import token_count

    ev = _final_state_events(spark, sf_dir).select(
        "conv_id", "turn_idx", token_count("text").alias("tok")
    )
    packed = pack_context_windows(
        ev, ["conv_id"], "turn_idx", "tok", _PACK_MAX_TOKENS,
        stride=_SLIDE_STRIDE,
    )
    return packed.groupBy("conv_id", "window_id").agg(
        F.count("*").cast("long").alias("turns"),
        F.sum("tok").cast("long").alias("window_tokens"),
        F.min("turn_idx").cast("long").alias("first_turn"),
        F.max("turn_idx").cast("long").alias("last_turn"),
    )


_ORACLE_CONTEXT_SLIDE = f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, turn_idx, text
  FROM ranked WHERE rn = 1 AND op <> 'd'
),
tokd AS (
  SELECT conv_id, turn_idx,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
           AS tok
  FROM final
),
offs AS (
  SELECT conv_id, turn_idx, tok,
         COALESCE(sum(tok) OVER (
             PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM tokd
),
fanned AS (
  SELECT conv_id, turn_idx, tok,
         unnest(generate_series(
             greatest(0, CAST(floor(CAST(cum_before - {_PACK_MAX_TOKENS}
                                         AS DOUBLE) / {_SLIDE_STRIDE})
                              AS BIGINT) + 1),
             CAST(floor(CAST(cum_before AS DOUBLE) / {_SLIDE_STRIDE})
                  AS BIGINT)
         )) AS window_id
  FROM offs
)
SELECT conv_id,
       CAST(window_id AS BIGINT) AS window_id,
       CAST(count(*) AS BIGINT) AS turns,
       CAST(sum(tok) AS BIGINT) AS window_tokens,
       CAST(min(turn_idx) AS BIGINT) AS first_turn,
       CAST(max(turn_idx) AS BIGINT) AS last_turn
FROM fanned
GROUP BY conv_id, window_id
"""


def q_conversation_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level near-dup over ASSEMBLED conversations — the CDC →
    assembly → MinHash+LSH composition a training pipeline runs before
    export.  Documents are the role-prefixed per-conversation transcripts;
    every 10th conversation is planted again under id+10M so the candidate
    set is non-trivially non-empty.  At threshold 0.9 with 16 bands × 4
    rows the LSH output is exhaustive ((1-0.9^4)^16 ≈ 4e-8 per-pair miss)
    and the exact-jaccard verify removes false positives, so the oracle is
    the all-pairs 3-gram jaccard scan over the same assembled docs.  Scale
    shape: assembly is one conv_id-keyed aggregation; the LSH self-join
    ships only (id, band, hash) — no document text crosses that exchange
    (functions/dedup.py:153)."""
    from airbyte_custom_spark.functions.dedup import minhash_lsh_candidates

    turns = F.array_sort(F.collect_list(F.struct("turn_idx", "role", "text")))
    docs = (
        _final_state_events(spark, sf_dir)
        .groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(turns, lambda s: F.concat_ws(": ", s["role"], s["text"])),
                "\n",
            ).alias("text")
        )
        .select(
            F.regexp_extract("conv_id", r"conv-(\d+)", 1).cast("long").alias("doc_id"),
            "text",
        )
    )
    planted = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        )
    )
    return minhash_lsh_candidates(planted, jaccard_threshold=0.9)


_CONV_DOCS_SQL = f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, turn_idx, role, text
  FROM ranked WHERE rn = 1 AND op <> 'd'
),
conv_docs AS (
  SELECT CAST(substr(conv_id, 6) AS BIGINT) AS doc_id,
         string_agg(concat_ws(': ', role, text), chr(10) ORDER BY turn_idx)
           AS text
  FROM final
  GROUP BY conv_id
),
all_docs AS (
  SELECT doc_id, text FROM conv_docs
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM conv_docs
  WHERE doc_id % 10 = 0
)
"""


_ORACLE_DELETE_WHERE = f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
)
SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us
FROM ranked
WHERE rn = 1 AND op <> 'd' AND role IS DISTINCT FROM 'tool'
"""


_ORACLE_LOOKUP = f"""
WITH ev0 AS ({DERIVATION_SQL}),
ranked AS (
  SELECT ev0.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev0
),
final AS (
  SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us
  FROM ranked WHERE rn = 1 AND op <> 'd'
),
picked AS (
  SELECT DISTINCT conv_id FROM final ORDER BY conv_id LIMIT 5
)
SELECT f.* FROM final f JOIN picked USING (conv_id)
"""


_ORACLE_FINAL_EXCISED = f"""
WITH ev0 AS ({DERIVATION_SQL}),
ev AS (
  SELECT * FROM ev0
  WHERE lsn <= (SELECT max(lsn) FROM ev0) // 3
     OR lsn > (2 * (SELECT max(lsn) FROM ev0)) // 3
),
ranked AS (
  SELECT ev.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev
)
SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us
FROM ranked WHERE rn = 1 AND op <> 'd'
"""


_ORACLE_FINAL_PREFIX = f"""
WITH ev0 AS ({DERIVATION_SQL}),
ev AS (
  SELECT * FROM ev0
  WHERE lsn <= (2 * (SELECT max(lsn) FROM ev0)) // 3
),
ranked AS (
  SELECT ev.*, row_number() OVER (
           PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
  FROM ev
)
SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us
FROM ranked WHERE rn = 1 AND op <> 'd'
"""


def q_cdc_stream_tail_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Structured-Streaming tail: events written as binlog
    segments, consumed by the checkpointed ingest job (availableNow),
    merged per micro-batch — final state must equal the SQL replay."""
    ev = events_from_table(spark, sf_dir)
    src = _fresh_dir("seg")
    write_event_chunks(ev, src, n_chunks=4)
    t = LakeTable.create(spark, _fresh_dir("tail"), TRANSCRIPT_SCHEMA, num_buckets=16)
    job = CdcIngestJob(
        spark,
        t.path,
        src,
        _fresh_dir("ckpt"),
        IngestConfig(max_files_per_trigger=1),
    )
    job.run_available_now()
    return _final_payload(LakeTable.load(spark, t.path).read())


def q_lineage_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 per-partition lineage, driver-verified end to end: run the
    checkpointed streaming tail over 4 binlog segments (one micro-batch
    each), then read back the lineage rows PERSISTED in the commit
    snapshots (`lake/table.py` `snap["lineage"]`; reference analog
    `AbstractDbSource.java:415-424` record counters) and fold them per
    source partition.  Totals must equal a plain GROUP BY over the
    derived events — proving the metrics are exact and complete across
    micro-batches, not approximations."""
    ev = events_from_table(spark, sf_dir)
    src = _fresh_dir("linseg")
    write_event_chunks(ev, src, n_chunks=4)
    t = LakeTable.create(spark, _fresh_dir("lintbl"), TRANSCRIPT_SCHEMA, num_buckets=16)
    job = CdcIngestJob(
        spark,
        t.path,
        src,
        _fresh_dir("linckpt"),
        IngestConfig(max_files_per_trigger=1),
    )
    job.run_available_now()
    agg: dict[int, list[int]] = {}
    for snap in LakeTable.load(spark, t.path).history():
        for p in snap.get("lineage") or []:
            sp = p["source_partition"]
            cur = agg.setdefault(sp, [0, p["min_lsn"], p["max_lsn"]])
            cur[0] += p["events"]
            cur[1] = min(cur[1], p["min_lsn"])
            cur[2] = max(cur[2], p["max_lsn"])
    rows = [
        (int(sp), int(c), int(lo), int(hi))
        for sp, (c, lo, hi) in sorted(agg.items())
    ]
    return spark.createDataFrame(
        rows, "source_partition int, events bigint, min_lsn bigint, max_lsn bigint"
    )


def q_stateful_sequence_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState,
    `streaming/stateful.py`): per-conversation sequence monitor — state
    (events, max_lsn, last_turn, gaps, regressions, deletes) carried
    across micro-batches, folded in lsn order.  Runs the REAL streaming
    operator over multi-batch segments (not the batch shortcut); the
    DuckDB oracle replicates the fold as a LAG window, so the incremental
    state machine is value-checked end to end."""
    import uuid

    from airbyte_custom_spark.schema import CDC_EVENT_SCHEMA
    from airbyte_custom_spark.streaming.stateful import sequence_monitor

    ev = events_from_table(spark, sf_dir)
    src = _fresh_dir("monwal")
    write_event_chunks(ev, src, n_chunks=4)
    name = "mon_" + uuid.uuid4().hex[:12]
    stream = (
        spark.readStream.schema(CDC_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    q = (
        sequence_monitor(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", _fresh_dir("monckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy(F.desc("events"))
    return (
        spark.table(name)
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select(
            "conv_id", "events", "max_lsn", "last_turn", "gaps",
            "regressions", "deletes",
        )
    )


def q_event_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked event-time aggregation (`streaming/dedup.py::
    event_time_stats`): hourly tumbling windows per op over the CDC
    envelope timestamp, run as a REAL multi-batch streaming query (update
    mode, watermark-evicted state) — the DuckDB oracle is plain
    time_bucket GROUP BY, so the streaming rollup is value-checked end to
    end.  Epoch-aligned windows ⇒ `window().start` ≡ `time_bucket`."""
    import uuid

    from pyspark.sql import Window

    from airbyte_custom_spark.schema import CDC_EVENT_SCHEMA
    from airbyte_custom_spark.streaming.dedup import event_time_stats

    ev = events_from_table(spark, sf_dir)
    src = _fresh_dir("rollwal")
    write_event_chunks(ev, src, n_chunks=4)
    name = "roll_" + uuid.uuid4().hex[:12]
    stream = (
        spark.readStream.schema(CDC_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    q = (
        event_time_stats(
            stream, window="1 hour", horizon="7 days", by_op=True
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", _fresh_dir("rollckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    w = Window.partitionBy("ws", "op").orderBy(F.desc("events"))
    return (
        spark.table(name)
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select(
            F.unix_micros(F.col("ws").cast("timestamp")).alias("ws_us"),
            "op", "events", "min_lsn", "max_lsn",
        )
    )


def q_json_cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-JSON-envelope replay end-to-end: typed events packed into the
    `_airbyte_data`-style payload string, streamed through
    `JsonCdcIngestJob` (per-batch Arrow schema inference + typed try_cast
    extraction + merge) — the final state must equal the plain window-SQL
    replay, proving the JSON roundtrip is value-exact for every payload
    type including timestamps."""
    from airbyte_custom_spark.sources.generator import json_envelope
    from airbyte_custom_spark.streaming.pipeline import JsonCdcIngestJob

    ev = events_from_table(spark, sf_dir)
    src = _fresh_dir("jsonwal")
    write_event_chunks(json_envelope(ev), src, n_chunks=4)
    t = LakeTable.create(spark, _fresh_dir("jsontbl"), TRANSCRIPT_SCHEMA, num_buckets=16)
    job = JsonCdcIngestJob(
        spark,
        t.path,
        src,
        _fresh_dir("jsonckpt"),
        IngestConfig(max_files_per_trigger=2),
    )
    job.run_available_now()
    return _final_payload(LakeTable.load(spark, t.path).read())


def q_json_nested_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-payload JSON ingest end-to-end (round-4): events carry an
    ARRAY column (`tags`) and a STRUCT column (`meta{model, tokens}`)
    packed into the raw `_airbyte_data` JSON; `JsonCdcIngestJob` must
    infer typed ArrayType/StructType columns (SURVEY §1.3 Struct/Array
    variants, `AirbyteType.java:27-55`), extract them via typed per-field
    from_json (`BigQuerySqlGenerator.java:109-160` JSON_QUERY analog),
    and the merged final state must match the oracle, which computes the
    same nested values as scalars directly — proving the JSON roundtrip,
    nested typing, and merge are value-exact."""
    from airbyte_custom_spark.sources.generator import json_envelope
    from airbyte_custom_spark.streaming.pipeline import JsonCdcIngestJob

    ev = events_from_table(spark, sf_dir)
    not_del = F.col("op") != "d"
    nested = ev.select(
        "*",
        F.when(
            not_del,
            F.array(
                F.concat(F.lit("t"), (F.col("lsn") % 5).cast("string")),
                F.concat(F.lit("u"), F.col("turn_idx").cast("string")),
            ),
        ).alias("tags"),
        F.when(
            not_del,
            F.struct(
                F.concat(F.lit("m"), (F.col("lsn") % 3).cast("string")).alias(
                    "model"
                ),
                (F.col("lsn") % 1000).alias("tokens"),
            ),
        ).alias("meta"),
    )
    src = _fresh_dir("nestwal")
    write_event_chunks(json_envelope(nested), src, n_chunks=4)
    t = LakeTable.create(spark, _fresh_dir("nesttbl"), TRANSCRIPT_SCHEMA, num_buckets=16)
    job = JsonCdcIngestJob(
        spark,
        t.path,
        src,
        _fresh_dir("nestckpt"),
        IngestConfig(max_files_per_trigger=2),
    )
    job.run_available_now()
    final = LakeTable.load(spark, t.path).read()
    return final.select(
        "conv_id",
        "turn_idx",
        "text",
        F.array_join(F.col("tags"), ",").alias("tags_csv"),
        F.col("meta.model").alias("model"),
        F.col("meta.tokens").alias("tokens"),
    )


def q_json_raw_retype_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-retention roundtrip (round 4): the JSON ingest ALSO appends
    every envelope verbatim to an append-only raw table
    (`JavaBaseConstants.java:29-39` `_airbyte_data` semantics), then the
    final table is REBUILT purely from that raw table
    (`lake/raw.py::retype_from_raw`) — the rebuilt state must equal the
    window-SQL replay, proving payload bytes survive retention and the
    re-type path reproduces live typing exactly."""
    from airbyte_custom_spark.lake.raw import retype_from_raw
    from airbyte_custom_spark.sources.generator import json_envelope
    from airbyte_custom_spark.streaming.pipeline import JsonCdcIngestJob

    ev = events_from_table(spark, sf_dir)
    src = _fresh_dir("rrwal")
    write_event_chunks(json_envelope(ev), src, n_chunks=4)
    t = LakeTable.create(spark, _fresh_dir("rrtbl"), TRANSCRIPT_SCHEMA, num_buckets=16)
    raw_path = _fresh_dir("rrraw")
    job = JsonCdcIngestJob(
        spark,
        t.path,
        src,
        _fresh_dir("rrckpt"),
        IngestConfig(max_files_per_trigger=2),
        raw_table_path=raw_path,
    )
    job.run_available_now()
    rebuilt = retype_from_raw(
        LakeTable.load(spark, raw_path),
        _fresh_dir("rrfinal"),
        payload_schema=TRANSCRIPT_SCHEMA,
        num_buckets=16,
    )
    return _final_payload(rebuilt.read())


def q_json_evolution_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-stream schema-evolution end-to-end (round 4): two payload
    columns — `score` (double) and `reaction` (string) — first appear
    only in events past the LSN midpoint (``to_json`` drops NULL fields,
    so early envelopes carry no such keys at all, exactly like a source
    ALTER TABLE ADD COLUMN mid-replication).  `JsonCdcIngestJob` must
    discover the new keys with the exact distributed key-set aggregate,
    evolve the table in place (E1/E2, `AirbyteType.java:16`,
    `typing-deduping.md:5-70`), keep merging, and read pre-evolution
    rows back as NULL — the final state must match the oracle's CASE
    replay, proving no late-column value is lost and no early row is
    mistyped."""
    from airbyte_custom_spark.sources.generator import json_envelope
    from airbyte_custom_spark.streaming.pipeline import JsonCdcIngestJob

    ev = events_from_table(spark, sf_dir)
    b = ev.agg(F.min("lsn").alias("lo"), F.max("lsn").alias("hi")).first()
    mid = (int(b["lo"]) + int(b["hi"])) // 2
    late = (F.col("lsn") > F.lit(mid)) & (F.col("op") != "d")
    evolved = ev.select(
        "*",
        F.when(late, (F.col("lsn") % 100).cast("double") + 0.25).alias("score"),
        F.when(
            late, F.concat(F.lit("r"), (F.col("lsn") % 4).cast("string"))
        ).alias("reaction"),
    )
    src = _fresh_dir("evowal")
    write_event_chunks(json_envelope(evolved), src, n_chunks=4)
    t = LakeTable.create(spark, _fresh_dir("evotbl"), TRANSCRIPT_SCHEMA, num_buckets=16)
    job = JsonCdcIngestJob(
        spark,
        t.path,
        src,
        _fresh_dir("evockpt"),
        IngestConfig(max_files_per_trigger=2),
    )
    job.run_available_now()
    final = LakeTable.load(spark, t.path).read()
    return final.select(
        "conv_id",
        "turn_idx",
        "text",
        F.col("score").cast("double").alias("score"),
        F.col("reaction").cast("string").alias("reaction"),
    )


def q_json_widening_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-stream type WIDENING end-to-end (north rule: "type widening"):
    payload column `score` carries integers up to the LSN midpoint (typed
    LONG on first contact) and decimals after it — with NO new key to
    trigger re-inference.  The exact widen probes (fused into the stats
    aggregation, `widen_probe_expr`) must detect the change on the rows
    themselves, widen the column to DOUBLE in place (E1/E2,
    `AirbyteType.java:16` type promotion), and land every decimal —
    early integer rows read back as exact doubles.  The oracle replays
    the same CASE with the winning event per key; any value nulled into
    a cast error (the pre-fix behavior) hash-mismatches."""
    from airbyte_custom_spark.sources.generator import json_envelope
    from airbyte_custom_spark.streaming.pipeline import JsonCdcIngestJob

    ev = events_from_table(spark, sf_dir)
    b = ev.agg(F.min("lsn").alias("lo"), F.max("lsn").alias("hi")).first()
    mid = (int(b["lo"]) + int(b["hi"])) // 2
    live = F.col("op") != "d"
    late = (F.col("lsn") > F.lit(mid)) & live
    scored = ev.select(
        "*",
        F.when(late, (F.col("lsn") % 50).cast("double") + 0.5)
        .when(live, (F.col("lsn") % 50).cast("long").cast("double"))
        .alias("score"),
    )
    # to_json renders whole doubles as "3.0" — longs must serialize as
    # integer literals for phase 1 to type as LONG, so build the envelope
    # from the typed split halves
    early_env = json_envelope(
        scored.filter(F.col("lsn") <= mid).withColumn(
            "score", F.col("score").cast("long")
        )
    )
    late_env = json_envelope(scored.filter(F.col("lsn") > mid))
    src = _fresh_dir("widewal")
    write_event_chunks(early_env, src + "-a", n_chunks=2)
    write_event_chunks(late_env, src + "-b", n_chunks=2)
    t = LakeTable.create(spark, _fresh_dir("widetbl"), TRANSCRIPT_SCHEMA, num_buckets=16)
    for i, s in enumerate((src + "-a", src + "-b")):
        JsonCdcIngestJob(
            spark, t.path, s, _fresh_dir(f"wideck{i}"), IngestConfig(max_files_per_trigger=1)
        ).run_available_now()
    final = LakeTable.load(spark, t.path).read()
    return final.select(
        "conv_id",
        "turn_idx",
        "text",
        F.col("score").cast("double").alias("score"),
    )


def q_schema_rename_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Renamed-column schema evolution end-to-end (north rule: "added/
    RENAMED columns, type widening"): phase 1 ingests JSON envelopes whose
    payload key is `tool`; mid-stream the table is soft-reset with
    ``rename_map={"tool": "tool_name"}`` (T8 incompatible-change rebuild,
    `BigQuerySqlGenerator.java:322-335` — data preserved, column renamed);
    phase 2's envelopes already carry `tool_name` and keep merging into
    the renamed column.  The final state must equal the oracle's plain
    latest-per-key replay with `tool AS tool_name` — proving no value was
    lost across the rename and both phases land in ONE column."""
    import pyspark.sql.types as T

    from airbyte_custom_spark.sources.generator import json_envelope
    from airbyte_custom_spark.streaming.pipeline import JsonCdcIngestJob

    ev = events_from_table(spark, sf_dir)
    b = ev.agg(F.min("lsn").alias("lo"), F.max("lsn").alias("hi")).first()
    mid = (int(b["lo"]) + int(b["hi"])) // 2

    src1, src2 = _fresh_dir("renwal1"), _fresh_dir("renwal2")
    write_event_chunks(json_envelope(ev.filter(F.col("lsn") <= mid)), src1, n_chunks=2)
    write_event_chunks(
        json_envelope(
            ev.filter(F.col("lsn") > mid).withColumnRenamed("tool", "tool_name")
        ),
        src2,
        n_chunks=2,
    )

    t = LakeTable.create(spark, _fresh_dir("rentbl"), TRANSCRIPT_SCHEMA, num_buckets=16)
    JsonCdcIngestJob(
        spark, t.path, src1, _fresh_dir("renck1"), IngestConfig(max_files_per_trigger=2)
    ).run_available_now()

    renamed = T.StructType(
        [
            T.StructField("tool_name" if f.name == "tool" else f.name, f.dataType, True)
            for f in TRANSCRIPT_SCHEMA.fields
        ]
    )
    LakeTable.load(spark, t.path).soft_reset(renamed, rename_map={"tool": "tool_name"})

    JsonCdcIngestJob(
        spark, t.path, src2, _fresh_dir("renck2"), IngestConfig(max_files_per_trigger=2)
    ).run_available_now()

    final = LakeTable.load(spark, t.path).read()
    return final.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.col("tool_name").cast("string").alias("tool_name"),
        F.unix_micros("ts").alias("ts_us"),
    )


def q_raw_table_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 end-to-end through the raw/final two-table path: append every
    event version to an append-only raw table, dedupRawTable it, read the
    user view — must equal the window-SQL replay (tombstoned keys absent)."""
    from airbyte_custom_spark.lake.raw import dedup_raw_table

    ev = events_from_table(spark, sf_dir)
    raw = LakeTable.create(spark, _fresh_dir("rawt"), TRANSCRIPT_SCHEMA, num_buckets=8)
    raw.append(ev)
    dedup_raw_table(raw)
    return _final_payload(raw.read())


def q_incremental_cursor_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/C4: cursor-filtered incremental read (cursor > saved state)."""
    ev = events_from_table(spark, sf_dir)
    cutoff = F.to_timestamp(F.lit("2024-01-01 12:00:00"))
    return ev.filter(F.col("_ab_cdc_updated_at") > cutoff).select(
        "lsn", "conv_id", "turn_idx", "op",
        _us("_ab_cdc_updated_at").alias("cursor_us"),
    )


def q_full_refresh_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: full-refresh projection scan (column pruning pushed to parquet)."""
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return c.select("c_custkey", "c_name", "c_nationkey", "c_acctbal")


def q_chunked_snapshot_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S4: pk-range chunked snapshot plan — per-chunk row counts and pk
    bounds (each chunk = a resumable state boundary)."""
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    # floor, not cast: DuckDB's double→bigint cast ROUNDS, Spark truncates
    chunk = F.floor(F.col("o_orderkey") / F.lit(4096)).alias("chunk_id")
    return (
        o.groupBy(chunk)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("o_orderkey").alias("min_pk"),
            F.max("o_orderkey").alias("max_pk"),
        )
    )


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 legacy SCD Type 2: per-key revision intervals via lead() —
    (valid_from_lsn, valid_to_lsn, is_active)."""
    ev = events_from_table(spark, sf_dir)
    ev.createOrReplaceTempView("_scd_ev")
    return spark.sql(_SCD2_SQL_BODY)


# portable body (runs verbatim on Spark over _scd_ev; oracle embeds the
# derivation CTE instead of the view)
_SCD2_SQL_BODY_TEMPLATE = """
SELECT conv_id, turn_idx, op, text,
       lsn AS valid_from_lsn,
       lead(lsn) OVER w AS valid_to_lsn,
       CASE WHEN lead(lsn) OVER w IS NULL AND op <> 'd' THEN 1 ELSE 0 END AS is_active
FROM {src}
WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY lsn)
"""
_SCD2_SQL_BODY = _SCD2_SQL_BODY_TEMPLATE.format(src="_scd_ev")


def q_name_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: identifier normalization of observed stream names."""
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return e.select(
        F.col("event_type").alias("raw_name"),
        F.lower(F.regexp_replace(F.col("event_type"), "[^A-Za-z0-9_]", "_")).alias(
            "normalized"
        ),
    ).distinct()


def q_validate_pk_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: count rows whose pk would fail validation (nulls injected
    deterministically via NULLIF)."""
    ev = events_from_table(spark, sf_dir)
    bad = ev.withColumn(
        "conv_id", F.expr("CASE WHEN lsn % 101 = 0 THEN NULL ELSE conv_id END")
    )
    return bad.select(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("conv_id").isNull(), 1)).alias("null_pk_rows"),
    )


def q_raw_table_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.4 raw-table shape: deterministic _raw_id (sha256 of pk+lsn) +
    extraction metadata (`JavaBaseConstants.java:29-39`)."""
    ev = events_from_table(spark, sf_dir)
    return ev.select(
        F.sha2(
            F.concat_ws(
                "\x1f",
                F.col("conv_id").cast("string"),
                F.col("turn_idx").cast("string"),
                F.col("lsn").cast("string"),
            ),
            256,
        ).alias("raw_id"),
        F.lit("transcripts").alias("stream"),
        "lsn",
        "op",
    )


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------


def q_doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + text stats (integer outputs → exact oracle parity)."""
    from airbyte_custom_spark.functions.text import bpe_ish_token_count, token_count

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    stop = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_tokens"),
        F.size(F.filter(toks, lambda x: F.lower(x).isin(stop))).alias("n_stopwords"),
        F.length(F.regexp_replace("text", r"[^.,;:!?]", "")).alias("n_punct"),
    )


def q_doc_lang_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stopword hit counts (the lang_id heuristic's inputs) —
    integer outputs, exact oracle parity."""
    from airbyte_custom_spark.functions.text import STOPWORDS, tokens

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = tokens("text")

    def hits(sw):
        return F.size(F.filter(toks, lambda x: F.lower(x).isin(sw))).cast("long")

    return d.select(
        "doc_id",
        *[hits(sw).alias(f"hits_{lang}") for lang, sw in STOPWORDS.items()],
    )


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals (top-2-gram
    occupancy + duplicated-3-gram character coverage) — the MassiveWeb
    repetition filters a pre-training pipeline runs before quality
    scoring.  Entirely map-side (one sorted-array fold per document, see
    ``functions.text.repetition_stats``): no shuffle, no Python — a pure
    map stage over a 100 TB corpus.  Integer numerators/denominator so
    the oracle comparison is exact (fraction = numerator / n_chars,
    computed by the consumer)."""
    from airbyte_custom_spark.functions.text import repetition_stats

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    r2 = repetition_stats("text", 2)
    r3 = repetition_stats("text", 3)
    return d.select(
        "doc_id",
        r2["top_count"].alias("top2_count"),
        r2["top_gram"].alias("top2_gram"),
        (r2["top_count"] * F.length(r2["top_gram"]).cast("long")).alias(
            "top2_chars"
        ),
        r3["dup_chars"].alias("dup3_chars"),
        F.length("text").cast("long").alias("n_chars"),
    )


# Decontamination parameters: docs whose id ≡ BENCH_REM (mod BENCH_MOD)
# stand in for the held-out benchmark set; overlap is word 3-grams (the
# real-world filter uses 13-grams — k=3 here because the synthetic vocab
# is ~30 words, giving k=3 the collision density 13-grams have on web text)
_DECON_MOD, _DECON_REM, _DECON_K = 97, 3, 3


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    n-gram with a held-out benchmark set (the n-gram-overlap filter of
    GPT-3 appendix C / PaLM §6 — standard pre-training hygiene).  The
    benchmark gram set is SMALL by construction (benchmarks are a few
    thousand documents even when the corpus is 100 TB), so the join is a
    broadcast hash join against the distinct benchmark grams — candidate
    grams stream map-side through the broadcast, and the only shuffle is
    the per-doc hit count over matched rows (a vanishingly small subset).
    Returns (doc_id, n_contaminated_grams) for contaminated docs."""
    from airbyte_custom_spark.functions.text import positional_ngrams

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    grams = F.array_distinct(positional_ngrams("text", _DECON_K))
    is_bench = F.col("doc_id") % _DECON_MOD == F.lit(_DECON_REM)
    bench = d.filter(is_bench).select(F.explode(grams).alias("g")).distinct()
    cand = d.filter(~is_bench).select("doc_id", F.explode(grams).alias("g"))
    return (
        cand.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_contaminated_grams"))
    )


def q_doc_quality_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic + composite quality score.  Quality is emitted
    ×1000 as an integer so the oracle comparison is float-representation-
    proof (the score's value set has 2-decimal granularity, so ×1000 is
    lossless)."""
    from airbyte_custom_spark.functions.text import lang_id, quality_score

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return d.select(
        "doc_id",
        lang_id("text").alias("lang"),
        F.round(quality_score("text") * 1000).cast("long").alias("quality_x1000"),
    )


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints over the portable h31 rolling hash — the
    DuckDB oracle reproduces the exact fingerprint count per doc."""
    from airbyte_custom_spark.functions.text import doc_fingerprint

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return d.select(
        "doc_id",
        F.size(doc_fingerprint("text")).alias("n_fingerprints"),
    )


_PLANT_DUPS_SPARK = None  # documents ∪ shifted copies of every 100th doc


def _docs_with_planted_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    dup = d.filter(F.col("doc_id") % 100 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    return d.unionByName(dup)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized sha256 groups over documents with
    deterministically planted duplicates (same derivation in the oracle)."""
    from airbyte_custom_spark.functions.dedup import exact_duplicates

    return exact_duplicates(_docs_with_planted_dups(spark, sf_dir))


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, full oracle: at threshold 0.9 with 16
    bands × 4 rows the per-pair miss probability is (1-0.9⁴)¹⁶ ≈ 4e-8 and
    the exact-jaccard verify removes all false positives, so the output
    equals the oracle's exhaustive all-pairs jaccard ≥ 0.9 scan."""
    from airbyte_custom_spark.functions.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(
        _docs_with_planted_dups(spark, sf_dir), jaccard_threshold=0.9
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs ≥ 0.9 over planted dups — full SQL oracle
    (inverted-index self-join in both engines).  cap=10,000 here means the
    frequency cap never bites at oracle scale, so this checks the UNCAPPED
    jaccard semantics; the production cap regime is checked separately by
    ``dedup_ngram_jaccard_capped`` (at corpus scale keep the cap ≤ ~500 —
    candidate volume is Σ_shingle min(freq, cap)²)."""
    from airbyte_custom_spark.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs_with_planted_dups(spark, sf_dir), threshold=0.9, max_shingle_freq=10_000
    )


def q_dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION cap regime of ngram_jaccard_pairs: shingles appearing
    in more than 3 docs are dropped from candidate generation AND from the
    intersection count (denominator sizes stay full-set) — the oracle
    replicates the capped semantics exactly, so both the candidate pruning
    and the capped-jaccard arithmetic are value-checked, not just the
    never-bites cap=10,000 case."""
    from airbyte_custom_spark.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs_with_planted_dups(spark, sf_dir), threshold=0.5, max_shingle_freq=3
    )


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS, not just pairs: connected components over the
    exact 3-gram-Jaccard ≥ 0.9 pair set (same derivation as
    ``dedup_ngram_jaccard``), labels = min doc_id per component via
    hash-to-min + pointer-jump shortcut (O(log d) rounds, scalar-only
    shuffles).  ``is_canonical`` marks the one doc to KEEP per cluster —
    "dedup the corpus" is then a semi-join filter.  The DuckDB oracle
    computes the same closure with a recursive CTE, so the clustering is
    value-checked end to end, not rows-only."""
    from airbyte_custom_spark.functions.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(
        _docs_with_planted_dups(spark, sf_dir), threshold=0.9, max_shingle_freq=10_000
    )
    comp = connected_components(pairs)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("component_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def q_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END USE of the dedup family: materialize the deduplicated
    corpus.  pairs (exact 3-gram Jaccard ≥ 0.9) → connected components →
    keep one doc per cluster (the min-id canonical) plus every
    uncontested doc — a broadcast left-anti semi-join of the corpus
    against the (tiny) non-canonical id set, so the corpus itself never
    shuffles.  Output is (doc_id, n_chars) of the KEPT rows."""
    from airbyte_custom_spark.functions.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    docs = _docs_with_planted_dups(spark, sf_dir).select("doc_id", "text")
    pairs = ngram_jaccard_pairs(docs, threshold=0.9, max_shingle_freq=10_000)
    comp = connected_components(pairs)
    drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return docs.join(F.broadcast(drop), "doc_id", "left_anti").select(
        "doc_id", F.length("text").alias("n_chars")
    )


def q_dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MinHash+LSH over a persisted band index: the planted-dup
    corpus splits deterministically into an already-indexed batch
    (doc_id % 7 != 3) and a new batch (doc_id % 7 == 3); the index stores
    only (id, band, bh); output = near-dup pairs TOUCHING the new batch at
    jaccard ≥ 0.9.  Exhaustive at that threshold by the same
    (1-0.9⁴)¹⁶ ≈ 4e-8 per-pair miss bound as ``dedup_minhash_lsh``, and
    the exact-jaccard verify removes all false positives — so the oracle
    is the exhaustive all-pairs jaccard scan filtered to pairs with a
    new-batch member.  (10,000,000 % 7 == 3, so planted duplicates land
    on the OTHER side of the split from their originals — the new×indexed
    join path is what produces the pairs.)"""
    from airbyte_custom_spark.functions.dedup import MinHashLshIndex

    docs = _docs_with_planted_dups(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 7 != 3)
    new = docs.filter(F.col("doc_id") % 7 == 3)
    idx = MinHashLshIndex.create(spark, _fresh_dir("lshidx"))
    idx.add(old)
    return idx.pairs_against(new, corpus_df=old, jaccard_threshold=0.9)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, full oracle: signatures are built from the
    portable h31 token hash + shared affine constants (bit-identical in
    DuckDB), and the 4-band join is pigeonhole-complete at hamming ≤ 3 —
    so the pair set equals the oracle's exhaustive O(n²) scan."""
    from airbyte_custom_spark.functions.dedup import simhash_near_dups

    return simhash_near_dups(_docs_with_planted_dups(spark, sf_dir), max_hamming=3)


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (k=5) for the first 5 vectors as queries —
    exact baseline, DuckDB list_cosine_similarity oracle."""
    from airbyte_custom_spark.functions.embeddings import brute_force_topk

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = brute_force_topk(e, queries, k=5)
    # rounding to 3dp: float32 accumulation differs ~1e-6 across engines
    return out.select(
        "query_id", "vec_id", F.round(F.col("cosine"), 3).alias("cosine3"), "rank"
    )


def q_embedding_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-k, full oracle: the seeded hyperplanes are
    inlined into the DuckDB SQL and sign bits computed with an identical
    left-fold dot product, so candidate sets match exactly (pytest
    additionally measures recall vs the exact baseline)."""
    from airbyte_custom_spark.functions.embeddings import lsh_bucket_topk

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(e.select("embedding").first()[0])
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return lsh_bucket_topk(e, queries, dim=dim, k=5)


def q_embedding_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN top-k (the second SURVEY 'scale path' beside LSH):
    data vectors live in the inverted list of their nearest centroid,
    queries probe their 3 nearest of 16 lists, exact-cosine re-rank on
    candidates only.  Uses the seeded RANDOM (untrained) quantizer so the
    oracle can inline identical centroid constants; assignment ties break
    to the lower list id in both engines, and dots/cosines use the same
    strict left folds.  The trained k-means quantizer (`ivf_centroids`)
    is pytest-covered for recall."""
    from airbyte_custom_spark.functions.embeddings import (
        ivf_random_centroids,
        ivf_topk,
    )

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(e.select("embedding").first()[0])
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = ivf_random_centroids(dim, 16, seed=42)
    return ivf_topk(
        e, queries, dim=dim, k=5, n_lists=16, nprobe=3, centroids=cents
    )


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over planted duplicate vectors.
    Full oracle: at threshold 0.999 on random gaussian vectors the only
    qualifying pairs are the planted identical copies (cosine 1.0), which
    collide in every LSH band — the banded self-join therefore returns
    exactly the oracle's exhaustive-scan pair set."""
    from airbyte_custom_spark.functions.embeddings import embedding_near_dups

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dup = e.filter(F.col("vec_id") % 100 == 0).withColumn(
        "vec_id", F.col("vec_id") + 10_000_000
    )
    both = e.unionByName(dup)
    dim = len(e.select("embedding").first()[0])
    return embedding_near_dups(both, dim=dim, cosine_threshold=0.999)


_PROFILE_NUMERIC = ("l_quantity", "l_extendedprice", "l_discount")
_PROFILE_STRING = ("l_returnflag", "l_linestatus")


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler (ingest-audit distributions) over
    lineitem with nulls injected deterministically into l_discount
    (l_orderkey % 10 == 0) so null accounting and null-ignoring
    percentiles are value-checked, not vacuous.  distinct_mode="exact"
    here because the oracle demands exact numbers; production default is
    the single-pass HLL path (see functions/profile.py)."""
    from airbyte_custom_spark.functions.profile import profile_columns

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li = li.withColumn(
        "l_discount",
        F.when(F.col("l_orderkey") % 10 == 0, F.lit(None)).otherwise(
            F.col("l_discount")
        ),
    )
    return profile_columns(
        li,
        numeric_cols=_PROFILE_NUMERIC,
        string_cols=_PROFILE_STRING,
        distinct_mode="exact",
    )


def _profile_oracle_sql() -> str:
    """DuckDB twin of q_profile_columns: the same null-injected frame, one
    UNION ALL row per (column, metric) — quantile_cont is DuckDB's exact
    interpolated percentile, matching Spark's `percentile`."""
    parts = []
    for c in _PROFILE_NUMERIC:
        parts += [
            f"SELECT '{c}' AS col_name, 'count' AS metric, cast(count({c}) AS double) AS value FROM t",
            f"SELECT '{c}', 'nulls', cast(count(*) - count({c}) AS double) FROM t",
            f"SELECT '{c}', 'distinct', cast(count(DISTINCT {c}) AS double) FROM t",
            f"SELECT '{c}', 'min', cast(min({c}) AS double) FROM t",
            f"SELECT '{c}', 'max', cast(max({c}) AS double) FROM t",
            f"SELECT '{c}', 'mean', round(cast(avg({c}) AS double), 2) FROM t",
            f"SELECT '{c}', 'stddev', round(cast(stddev_samp({c}) AS double), 2) FROM t",
        ]
        for p in (0.25, 0.5, 0.75):
            parts.append(
                f"SELECT '{c}', 'p{int(p * 100)}', "
                f"round(cast(quantile_cont({c}, {p}) AS double), 6) FROM t"
            )
    for c in _PROFILE_STRING:
        parts += [
            f"SELECT '{c}', 'count', cast(count({c}) AS double) FROM t",
            f"SELECT '{c}', 'nulls', cast(count(*) - count({c}) AS double) FROM t",
            f"SELECT '{c}', 'distinct', cast(count(DISTINCT {c}) AS double) FROM t",
            f"SELECT '{c}', 'min_len', cast(min(length({c})) AS double) FROM t",
            f"SELECT '{c}', 'max_len', cast(max(length({c})) AS double) FROM t",
            f"SELECT '{c}', 'avg_len', round(cast(avg(length({c})) AS double), 2) FROM t",
            f"SELECT '{c}', 'empty', cast(count(CASE WHEN length({c}) = 0 THEN 1 END) AS double) FROM t",
        ]
    body = "\nUNION ALL\n".join(parts)
    return (
        "WITH t AS (SELECT * REPLACE ("
        "CASE WHEN l_orderkey % 10 = 0 THEN NULL ELSE l_discount END AS l_discount"
        ") FROM lineitem)\n" + body
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → mapInPandas feature extraction (deterministic
    fake decoder; real decode stubbed — no codec libs in image)."""
    from airbyte_custom_spark.functions.multimodal import (
        extract_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=256)
    out = extract_features(media, decoder="fake")
    return out.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round(F.aggregate(F.col("features"), F.lit(0.0), lambda a, x: a + x), 4).alias(
            "feature_sum"
        ),
    )


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def _utc(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Pin the session time zone to UTC before running a query: the DuckDB
    oracle treats naive parquet timestamps as UTC, so NTZ→timestamp casts
    must interpret wall times the same way regardless of how the caller
    configured its session."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return q_cdc_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _utc(v) for k, v in _QUERIES.items()}


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = None  # set below


def _raw_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # The driver's correctness harness checks the FIRST 50 registry
    # entries per round.  Ordering policy (round 5): queries that have
    # never had a driver row, or whose last row is stale (r03), lead the
    # registry; entries whose values are identical to another checked
    # query (the shared final-state table — equality is itself
    # pytest-asserted in tests/test_final_state_variants.py) or that
    # carry 4 rounds of driver passes rotate to slots 51+.  Every demoted
    # query remains fully runnable and oracle-paired; its pass history
    # lives in CORRECTNESS_r0{1..4}.json.
    return {
        # --- never driver-checked before round 5 ---
        "dedup_components": q_dedup_components,
        "corpus_dedup": q_corpus_dedup,
        # --- stale since r03 (driver slot overflow in r04) ---
        "dedup_ngram_jaccard_capped": q_dedup_ngram_jaccard_capped,
        "dedup_simhash": q_dedup_simhash,
        "embedding_topk": q_embedding_topk,
        "embedding_lsh_ann": q_embedding_lsh_ann,
        "embedding_ivf_ann": q_embedding_ivf_ann,
        "embedding_near_dups": q_embedding_near_dups,
        "multimodal_features": q_multimodal_features,
        # --- CDC core ---
        "cdc_flatten_events": q_cdc_flatten_events,
        "cdc_latest_per_key": q_cdc_latest_per_key,
        "cdc_final_state": q_cdc_final_state,
        "json_cdc_final_state": q_json_cdc_final_state,
        "json_nested_final_state": q_json_nested_final_state,
        "json_evolution_final_state": q_json_evolution_final_state,
        "json_widening_final_state": q_json_widening_final_state,
        # --- lake ops with distinct result tables ---
        "changelog_between_versions": q_changelog_between_versions,
        "incremental_export": q_incremental_export,
        "time_travel_final_state": q_time_travel_final_state,
        "rollback_excise_final_state": q_rollback_excise_final_state,
        "point_lookup_state": q_point_lookup_state,
        "delete_where_final_state": q_delete_where_final_state,
        "changes_since_wide_gap": q_changes_since_wide_gap,
        # --- transcript analytics / training export ---
        "conversation_assembly": q_conversation_assembly,
        "conversation_sessions": q_conversation_sessions,
        "transcript_redaction": q_transcript_redaction,
        "session_window_rollup": q_session_window_rollup,
        "sft_pairs": q_sft_pairs,
        "corpus_export": q_corpus_export,
        "incremental_corpus_refresh": q_incremental_corpus_refresh,
        "conversation_token_budget": q_conversation_token_budget,
        "conversation_bpe_budget": q_conversation_bpe_budget,
        "conversation_near_dup": q_conversation_near_dup,
        # --- streaming / accounting / sources ---
        "lineage_accounting": q_lineage_accounting,
        "stateful_sequence_monitor": q_stateful_sequence_monitor,
        "event_time_rollup": q_event_time_rollup,
        "raw_table_dedup": q_raw_table_dedup,
        "incremental_cursor_scan": q_incremental_cursor_scan,
        "scd2_history": q_scd2_history,
        "name_normalization": q_name_normalization,
        "validate_pk_counts": q_validate_pk_counts,
        # --- training-data pipeline ops ---
        "doc_text_stats": q_doc_text_stats,
        "profile_columns": q_profile_columns,
        "doc_repetition": q_doc_repetition,
        "corpus_repetition": q_corpus_repetition,
        "decontaminate": q_decontaminate,
        "stratified_sample": q_stratified_sample,
        "context_window_pack": q_context_window_pack,
        "context_window_slide": q_context_window_slide,
        "corpus_shards": q_corpus_shards,
        # ---- slot 51+ below: rotated out this round (see policy note) ----
        # doc_lang_hits: its outputs are the exact inputs doc_quality_lang
        # re-derives; raw_table_envelope: projection of the same raw table
        # raw_table_dedup (slot ≤50) checks.  doc_lang_hits,
        # raw_table_envelope, dedup_exact, doc_quality_lang, and
        # doc_fingerprints all carry r01–r04 driver passes and rotate out
        # to make room for the round-5 additions that have never had a
        # driver row (corpus_repetition, stratified_sample,
        # context_window_pack, context_window_slide, corpus_shards);
        # full_refresh_scan (r01–r04 passes, also pytest-covered via the
        # plan asserts) rotates out for corpus_shards.  Every demoted
        # query stays mirror-checked at sf0.01 AND sf0.1.
        "full_refresh_scan": q_full_refresh_scan,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_exact": q_dedup_exact,
        "doc_quality_lang": q_doc_quality_lang,
        "doc_fingerprints": q_doc_fingerprints,
        "doc_lang_hits": q_doc_lang_hits,
        "raw_table_envelope": q_raw_table_envelope,
        "dedup_incremental_lsh": q_dedup_incremental_lsh,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "json_raw_retype_final_state": q_json_raw_retype_final_state,
        "schema_rename_final_state": q_schema_rename_final_state,
        "cdc_final_state_incremental": q_cdc_final_state_incremental,
        "mor_final_state": q_mor_final_state,
        "rebucket_final_state": q_rebucket_final_state,
        "replica_sync_final_state": q_replica_sync_final_state,
        "wap_publish_final_state": q_wap_publish_final_state,
        "cdc_stream_tail_final_state": q_cdc_stream_tail_final_state,
        "chunked_snapshot_plan": q_chunked_snapshot_plan,
    }


_QUERIES = _raw_queries()


def oracle_sql() -> dict[str, str]:
    ev = DERIVATION_SQL
    return {
        "cdc_flatten_events": f"""
            WITH ev AS ({ev})
            SELECT lsn, op, conv_id, turn_idx, role, text, tool,
                   epoch_us(ts) AS ts_us,
                   epoch_us(_ab_cdc_updated_at) AS cdc_updated_at_us,
                   epoch_us(_ab_cdc_deleted_at) AS cdc_deleted_at_us,
                   source_partition
            FROM ev
        """,
        "cdc_latest_per_key": f"""
            WITH ev AS ({ev}),
            ranked AS (
              SELECT ev.*, row_number() OVER (
                       PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
              FROM ev
            )
            SELECT conv_id, turn_idx, lsn, op, text FROM ranked WHERE rn = 1
        """,
        "cdc_final_state": _ORACLE_FINAL,
        "json_cdc_final_state": _ORACLE_FINAL,
        # nested roundtrip: the oracle computes the array/struct values as
        # scalars straight from the winning event's lsn/turn_idx — the
        # Spark side must recover the identical values THROUGH the JSON
        # envelope + nested inference + typed extraction + merge
        "json_nested_final_state": f"""
            WITH ev AS ({ev}),
            ranked AS (
              SELECT ev.*, row_number() OVER (
                       PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
              FROM ev
            )
            SELECT conv_id, turn_idx, text,
                   't' || CAST(lsn % 5 AS STRING) || ',u'
                       || CAST(turn_idx AS STRING) AS tags_csv,
                   'm' || CAST(lsn % 3 AS STRING) AS model,
                   lsn % 1000 AS tokens
            FROM ranked WHERE rn = 1 AND op <> 'd'
        """,
        "cdc_final_state_incremental": _ORACLE_FINAL,
        "mor_final_state": _ORACLE_FINAL,
        "rebucket_final_state": _ORACLE_FINAL,
        # net i/u/d between the 2/3-prefix state and the full replay:
        # new winners classified by liveness in the old state; a key
        # created and deleted between versions nets to nothing
        "changelog_between_versions": f"""
            WITH ev0 AS ({ev}),
            ranked_new AS (
              SELECT ev0.*, row_number() OVER (
                       PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
              FROM ev0
            ),
            old_ranked AS (
              SELECT *, row_number() OVER (
                       PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
              FROM ev0
              WHERE lsn <= (2 * (SELECT max(lsn) FROM ev0)) // 3
            ),
            old_live AS (
              SELECT conv_id, turn_idx FROM old_ranked
              WHERE rn = 1 AND op <> 'd'
            ),
            new_winners AS (
              SELECT * FROM ranked_new
              WHERE rn = 1
                AND lsn > (2 * (SELECT max(lsn) FROM ev0)) // 3
            )
            SELECT n.conv_id, n.turn_idx, n.role, n.text, n.tool,
                   epoch_us(n.ts) AS ts_us, n.lsn,
                   CASE WHEN n.op = 'd' THEN 'd'
                        WHEN o.conv_id IS NOT NULL THEN 'u'
                        ELSE 'i' END AS change_op
            FROM new_winners n
            LEFT JOIN old_live o
              ON n.conv_id = o.conv_id AND n.turn_idx = o.turn_idx
            WHERE NOT (n.op = 'd' AND o.conv_id IS NULL)
        """,
        # same net-changes semantics, 1/3 cut — the wide-gap (shuffled,
        # non-broadcast) changes_since path must produce identical values
        "changes_since_wide_gap": f"""
            WITH ev0 AS ({ev}),
            ranked_new AS (
              SELECT ev0.*, row_number() OVER (
                       PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
              FROM ev0
            ),
            old_ranked AS (
              SELECT *, row_number() OVER (
                       PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
              FROM ev0
              WHERE lsn <= (SELECT max(lsn) FROM ev0) // 3
            ),
            old_live AS (
              SELECT conv_id, turn_idx FROM old_ranked
              WHERE rn = 1 AND op <> 'd'
            ),
            new_winners AS (
              SELECT * FROM ranked_new
              WHERE rn = 1
                AND lsn > (SELECT max(lsn) FROM ev0) // 3
            )
            SELECT n.conv_id, n.turn_idx, n.role, n.text, n.tool,
                   epoch_us(n.ts) AS ts_us, n.lsn,
                   CASE WHEN n.op = 'd' THEN 'd'
                        WHEN o.conv_id IS NOT NULL THEN 'u'
                        ELSE 'i' END AS change_op
            FROM new_winners n
            LEFT JOIN old_live o
              ON n.conv_id = o.conv_id AND n.turn_idx = o.turn_idx
            WHERE NOT (n.op = 'd' AND o.conv_id IS NULL)
        """,
        # winners (incl. delete winners) strictly after the 2/3 cursor —
        # the read_since export feed
        "incremental_export": f"""
            WITH ev0 AS ({ev}),
            ranked AS (
              SELECT ev0.*, row_number() OVER (
                       PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
              FROM ev0
            )
            SELECT conv_id, turn_idx, role, text, tool,
                   epoch_us(ts) AS ts_us, lsn, (op = 'd') AS deleted
            FROM ranked
            WHERE rn = 1 AND lsn > (2 * (SELECT max(lsn) FROM ev0)) // 3
        """,
        "time_travel_final_state": _ORACLE_FINAL_PREFIX,
        "rollback_excise_final_state": _ORACLE_FINAL_EXCISED,
        "wap_publish_final_state": _ORACLE_FINAL_PREFIX,
        "point_lookup_state": _ORACLE_LOOKUP,
        "replica_sync_final_state": _ORACLE_FINAL,
        "delete_where_final_state": _ORACLE_DELETE_WHERE,
        "conversation_assembly": _ORACLE_ASSEMBLY,
        "conversation_sessions": _ORACLE_SESSIONS,
        "transcript_redaction": _oracle_redaction(),
        "session_window_rollup": _ORACLE_SESSION_WINDOWS,
        "sft_pairs": _ORACLE_SFT_PAIRS,
        "corpus_export": _oracle_corpus_export(),
        "corpus_repetition": _oracle_corpus_repetition(),
        "stratified_sample": _ORACLE_STRATIFIED_SAMPLE,
        "context_window_pack": _ORACLE_CONTEXT_WINDOWS,
        "context_window_slide": _ORACLE_CONTEXT_SLIDE,
        "corpus_shards": _oracle_corpus_shards(),
        "incremental_corpus_refresh": _oracle_corpus_refresh(),
        "conversation_token_budget": _ORACLE_TOKEN_BUDGET,
        "conversation_bpe_budget": _oracle_bpe_budget(),
        # assembled-conversation docs feed the SAME exhaustive all-pairs
        # jaccard CTEs the document-corpus minhash oracle uses
        "conversation_near_dup": (
            _CONV_DOCS_SQL
            + _NGRAM_JAC_CTES
            + "SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.9"
        ),
        "cdc_stream_tail_final_state": _ORACLE_FINAL,
        # snapshot-persisted lineage folded across micro-batches must be
        # EXACT event accounting, not an estimate
        "lineage_accounting": f"""
            WITH ev AS ({ev})
            SELECT source_partition,
                   count(*) AS events,
                   min(lsn) AS min_lsn,
                   max(lsn) AS max_lsn
            FROM ev
            GROUP BY source_partition
        """,
        "event_time_rollup": f"""
WITH ev AS ({DERIVATION_SQL})
SELECT epoch_us(time_bucket(INTERVAL '1 hour', _ab_cdc_updated_at)) AS ws_us,
       op,
       count(*) AS events,
       min(lsn) AS min_lsn,
       max(lsn) AS max_lsn
FROM ev
GROUP BY 1, 2
""",
        "stateful_sequence_monitor": f"""
WITH ev AS ({DERIVATION_SQL}),
lagged AS (
  SELECT conv_id, turn_idx, lsn, op,
         lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY lsn) AS pt
  FROM ev
)
SELECT conv_id,
       count(*) AS events,
       max(lsn) AS max_lsn,
       arg_max(turn_idx, lsn) AS last_turn,
       CAST(coalesce(sum(CASE WHEN turn_idx > pt + 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS gaps,
       CAST(coalesce(sum(CASE WHEN turn_idx < pt THEN 1 ELSE 0 END), 0) AS BIGINT) AS regressions,
       CAST(coalesce(sum(CASE WHEN op = 'd' THEN 1 ELSE 0 END), 0) AS BIGINT) AS deletes
FROM lagged
GROUP BY conv_id
""",
        # retained-raw rebuild must converge to the same replayed state
        "json_raw_retype_final_state": _ORACLE_FINAL,
        # late-appearing columns: values exist only past the LSN midpoint;
        # the engine must evolve mid-stream and backfill NULL for earlier
        # rows — the oracle replays the same CASE over the winning event
        "json_evolution_final_state": f"""
            WITH ev AS ({ev}),
            b AS (
              SELECT CAST(floor((min(lsn) + max(lsn)) / 2.0) AS BIGINT) AS mid
              FROM ev
            ),
            ranked AS (
              SELECT ev.*, row_number() OVER (
                       PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
              FROM ev
            )
            SELECT conv_id, turn_idx, text,
                   CASE WHEN lsn > (SELECT mid FROM b)
                        THEN CAST(lsn % 100 AS DOUBLE) + 0.25 END AS score,
                   CASE WHEN lsn > (SELECT mid FROM b)
                        THEN 'r' || CAST(lsn % 4 AS STRING) END AS reaction
            FROM ranked WHERE rn = 1 AND op <> 'd'
        """,
        # the replay computes the winning event's score under the WIDENED
        # type for every row — early integer phases must read back as
        # exact doubles, late decimals must survive untouched
        "json_widening_final_state": f"""
            WITH ev AS ({ev}),
            b AS (
              SELECT CAST(floor((min(lsn) + max(lsn)) / 2.0) AS BIGINT) AS mid
              FROM ev
            ),
            ranked AS (
              SELECT ev.*, row_number() OVER (
                       PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
              FROM ev
            )
            SELECT conv_id, turn_idx, text,
                   CASE WHEN lsn > (SELECT mid FROM b)
                        THEN CAST(lsn % 50 AS DOUBLE) + 0.5
                        ELSE CAST(lsn % 50 AS DOUBLE) END AS score
            FROM ranked WHERE rn = 1 AND op <> 'd'
        """,
        # rename is a pure relabeling: the replay is the plain final state
        # with tool surfaced under its post-rename name — any value lost
        # (or duplicated into two columns) across the soft-reset would
        # hash-mismatch
        "schema_rename_final_state": f"""
            WITH ev AS ({ev}),
            ranked AS (
              SELECT ev.*, row_number() OVER (
                       PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) AS rn
              FROM ev
            )
            SELECT conv_id, turn_idx, role, text, tool AS tool_name,
                   epoch_us(ts) AS ts_us
            FROM ranked WHERE rn = 1 AND op <> 'd'
        """,
        # the raw/final path must converge to the same replayed state
        "raw_table_dedup": _ORACLE_FINAL,
        "incremental_cursor_scan": f"""
            WITH ev AS ({ev})
            SELECT lsn, conv_id, turn_idx, op,
                   epoch_us(_ab_cdc_updated_at) AS cursor_us
            FROM ev
            WHERE _ab_cdc_updated_at > TIMESTAMP '2024-01-01 12:00:00'
        """,
        "full_refresh_scan": """
            SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer
        """,
        "chunked_snapshot_plan": """
            SELECT CAST(floor(o_orderkey / 4096) AS BIGINT) AS chunk_id,
                   count(*) AS rows,
                   min(o_orderkey) AS min_pk,
                   max(o_orderkey) AS max_pk
            FROM orders GROUP BY 1
        """,
        "scd2_history": f"""
            WITH ev AS ({ev})
            {_SCD2_SQL_BODY_TEMPLATE.format(src="ev")}
        """,
        "name_normalization": """
            SELECT DISTINCT event_type AS raw_name,
                   lower(regexp_replace(event_type, '[^A-Za-z0-9_]', '_', 'g')) AS normalized
            FROM events
        """,
        "validate_pk_counts": f"""
            WITH ev AS ({ev}),
            bad AS (
              SELECT CASE WHEN lsn % 101 = 0 THEN NULL ELSE conv_id END AS conv_id
              FROM ev
            )
            SELECT count(*) AS total,
                   count(CASE WHEN conv_id IS NULL THEN 1 END) AS null_pk_rows
            FROM bad
        """,
        "raw_table_envelope": f"""
            WITH ev AS ({ev})
            SELECT sha256(conv_id || chr(31) || CAST(turn_idx AS STRING)
                          || chr(31) || CAST(lsn AS STRING)) AS raw_id,
                   'transcripts' AS stream, lsn, op
            FROM ev
        """,
        "doc_text_stats": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                            x -> x <> '')) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text,
                            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT)
                       AS n_bpe_tokens,
                   CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                            x -> lower(x) IN ('the','and','of','to','a','in',
                                              'is','it','that','for')))
                       AS BIGINT) AS n_stopwords,
                   CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                       AS BIGINT) AS n_punct
            FROM documents
        """,
        "doc_repetition": r"""
            WITH toks AS (
              SELECT doc_id, text,
                     list_filter(regexp_split_to_array(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ), g2 AS (
              SELECT doc_id,
                     unnest(CASE WHEN len(t) >= 2 THEN
                       list_transform(generate_series(1, len(t) - 1),
                         i -> list_aggregate(t[i:i+1], 'string_agg', ' '))
                     ELSE [] END) AS g
              FROM toks
            ), c2 AS (
              SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt
              FROM g2 GROUP BY doc_id, g
            ), top2 AS (
              SELECT doc_id, g, cnt FROM (
                SELECT doc_id, g, cnt,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY cnt DESC, g ASC) AS rn
                FROM c2
              ) WHERE rn = 1
            ), g3 AS (
              SELECT doc_id,
                     unnest(CASE WHEN len(t) >= 3 THEN
                       list_transform(generate_series(1, len(t) - 2),
                         i -> list_aggregate(t[i:i+2], 'string_agg', ' '))
                     ELSE [] END) AS g
              FROM toks
            ), c3 AS (
              SELECT doc_id, g, count(*) AS cnt
              FROM g3 GROUP BY doc_id, g
            ), d3 AS (
              SELECT doc_id, CAST(sum(cnt * length(g)) AS BIGINT) AS dup3_chars
              FROM c3 WHERE cnt >= 2 GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(top2.cnt, 0) AS top2_count,
                   COALESCE(top2.g, '') AS top2_gram,
                   CAST(COALESCE(top2.cnt * length(top2.g), 0) AS BIGINT)
                       AS top2_chars,
                   COALESCE(d3.dup3_chars, 0) AS dup3_chars,
                   CAST(length(d.text) AS BIGINT) AS n_chars
            FROM documents d
            LEFT JOIN top2 USING (doc_id)
            LEFT JOIN d3 USING (doc_id)
        """,
        "decontaminate": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ), grams AS (
              SELECT doc_id,
                     list_distinct(CASE WHEN len(t) >= 3 THEN
                       list_transform(generate_series(1, len(t) - 2),
                         i -> list_aggregate(t[i:i+2], 'string_agg', ' '))
                     ELSE [] END) AS gs
              FROM toks
            ), bench AS (
              SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 97 = 3
            ), cand AS (
              SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 97 <> 3
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_grams
            FROM cand JOIN bench USING (g)
            GROUP BY doc_id
        """,
        "doc_lang_hits": r"""
            SELECT doc_id,
                   CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                        x -> lower(x) IN ('the','and','of','to','a','in','is',
                                          'it','that','for'))) AS BIGINT) AS hits_en,
                   CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                        x -> lower(x) IN ('el','la','de','que','y','en','un',
                                          'una','los','por'))) AS BIGINT) AS hits_es,
                   CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                        x -> lower(x) IN ('le','la','de','et','les','des','un',
                                          'une','que','pour'))) AS BIGINT) AS hits_fr,
                   CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                        x -> lower(x) IN ('der','die','das','und','ist','ein',
                                          'eine','nicht','mit','zu'))) AS BIGINT) AS hits_de
            FROM documents
        """,
        "dedup_exact": _DUP_DOCS_SQL
        + r"""
            , hashed AS (
              SELECT doc_id,
                     sha256(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS h
              FROM all_docs
            ),
            grp AS (
              SELECT h, min(doc_id) AS canonical_id, count(*) AS group_size
              FROM hashed GROUP BY h
            )
            SELECT hashed.doc_id, canonical_id, group_size
            FROM hashed JOIN grp USING (h)
            WHERE group_size > 1
        """,
        "dedup_ngram_jaccard": _ngram_jaccard_oracle(0.9),
        "dedup_ngram_jaccard_capped": _ngram_jaccard_capped_oracle(0.5, 3),
        "dedup_components": _dedup_components_oracle(0.9),
        "corpus_dedup": _corpus_dedup_oracle(0.9),
        "doc_quality_lang": _quality_lang_oracle_sql(),
        "doc_fingerprints": _fingerprint_oracle_sql(),
        "dedup_simhash": _simhash_oracle_sql(),
        # the minhash output is exhaustive at threshold 0.9 (see
        # q_dedup_minhash_lsh) — the oracle is the same all-pairs jaccard
        # scan the ngram query uses
        "dedup_minhash_lsh": _ngram_jaccard_oracle(0.9),
        # incremental LSH emits exactly the pairs TOUCHING the new batch
        # (doc_id % 7 == 3); exhaustive at 0.9 by the same band-miss bound
        "dedup_incremental_lsh": (
            _ngram_jaccard_oracle(0.9)
            + " AND (id_a % 7 = 3 OR id_b % 7 = 3)"
        ),
        "embedding_near_dups": _EMB_NEAR_DUP_ORACLE,
        "embedding_lsh_ann": _lsh_ann_oracle_sql(),
        "embedding_ivf_ann": _ivf_ann_oracle_sql(),
        "multimodal_features": _multimodal_oracle_sql(),
        "profile_columns": _profile_oracle_sql(),
        "embedding_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qv
              FROM embeddings WHERE vec_id < 5
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     round(list_cosine_similarity(e.embedding, q.qv), 6) AS c6
              FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
              SELECT query_id, vec_id, round(c6, 3) AS cosine3,
                     CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY c6 DESC, vec_id ASC
                     ) AS INT) AS rank
              FROM scored
            )
            SELECT query_id, vec_id, cosine3, rank FROM ranked WHERE rank <= 5
        """,
    }


# documents ∪ shifted copies of every 100th doc — mirrors _docs_with_planted_dups
_DUP_DOCS_SQL = """
            WITH all_docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000000 AS doc_id, text FROM documents
              WHERE doc_id % 100 = 0
            )
"""

def _ngram_jaccard_capped_oracle(threshold: float, cap: int) -> str:
    """DuckDB twin of ngram_jaccard_pairs WITH the frequency cap biting:
    shingles with document frequency > cap are excluded from the inverted
    index (so from both candidate generation and the intersection count),
    while n_a/n_b stay full-set sizes — exactly the Spark semantics."""
    return _DUP_DOCS_SQL + rf"""
            , tok AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
              FROM all_docs
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(
                       CASE WHEN len(w) >= 3 THEN
                         list_transform(generate_series(1, len(w) - 2),
                                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                       WHEN len(w) > 0 THEN [array_to_string(w, ' ')]
                       ELSE [] END) AS shingles
              FROM tok
            ),
            szd AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh
                    WHERE len(shingles) > 0),
            inv0 AS (SELECT doc_id, n, unnest(shingles) AS s FROM szd),
            freq AS (SELECT s, count(*) AS df FROM inv0 GROUP BY s),
            inv AS (SELECT inv0.* FROM inv0 JOIN freq USING (s)
                    WHERE freq.df <= {cap}),
            shared AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.n AS n_a, b.n AS n_b, count(*) AS cnt
              FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4
            ),
            jac AS (
              SELECT id_a, id_b,
                     round(cnt * 1.0 / (n_a + n_b - cnt), 6) AS jaccard
              FROM shared
            )
            SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= {threshold}
        """


# the shared all-pairs 3-gram jaccard CTE chain (tok→sh→szd→inv→shared→jac),
# appended to _DUP_DOCS_SQL by the ngram-jaccard and components oracles
_NGRAM_JAC_CTES = r"""
            , tok AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
              FROM all_docs
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(
                       CASE WHEN len(w) >= 3 THEN
                         list_transform(generate_series(1, len(w) - 2),
                                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                       WHEN len(w) > 0 THEN [array_to_string(w, ' ')]
                       ELSE [] END) AS shingles
              FROM tok
            ),
            szd AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh
                    WHERE len(shingles) > 0),
            inv AS (SELECT doc_id, n, unnest(shingles) AS s FROM szd),
            shared AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.n AS n_a, b.n AS n_b, count(*) AS cnt
              FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4
            ),
            jac AS (
              SELECT id_a, id_b,
                     round(cnt * 1.0 / (n_a + n_b - cnt), 6) AS jaccard
              FROM shared
            )
"""


def _corpus_dedup_oracle(threshold: float) -> str:
    """DuckDB twin of q_corpus_dedup: the `_dedup_components_oracle`
    closure, then keep every doc that is not a non-canonical cluster
    member."""
    docs = _DUP_DOCS_SQL.replace("WITH all_docs", "WITH RECURSIVE all_docs", 1)
    return (
        docs
        + _NGRAM_JAC_CTES
        + f"""
            , pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {threshold}),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL
              SELECT id_b AS u, id_a AS v FROM pairs
            ),
            nodes AS (SELECT DISTINCT u AS id FROM edges),
            walk(id, comp) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT e.v, w.comp FROM walk w JOIN edges e ON e.u = w.id
            ),
            labels AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id),
            dropped AS (SELECT id FROM labels WHERE id <> comp)
            SELECT d.doc_id, length(d.text) AS n_chars
            FROM all_docs d
            WHERE d.doc_id NOT IN (SELECT id FROM dropped)
        """
    )


def _ngram_jaccard_oracle(threshold: float) -> str:
    """Exhaustive all-pairs 3-gram jaccard ≥ threshold over the planted-dup
    corpus — the oracle for BOTH dedup_ngram_jaccard and dedup_minhash_lsh
    (the LSH output is exhaustive at its threshold; see q_dedup_minhash_lsh)."""
    return (
        _DUP_DOCS_SQL
        + _NGRAM_JAC_CTES
        + f"SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= {threshold}"
    )


def _dedup_components_oracle(threshold: float) -> str:
    """DuckDB twin of q_dedup_components: the SAME pair derivation as
    _ngram_jaccard_oracle, then the transitive closure via a recursive CTE
    (walk enumerates every (node, reachable-node) pair over the symmetrized
    edge set; UNION dedups so it terminates) — component = min reachable id,
    exactly what hash-to-min converges to on the Spark side."""
    # the recursive member forces RECURSIVE on the whole WITH chain
    docs = _DUP_DOCS_SQL.replace("WITH all_docs", "WITH RECURSIVE all_docs", 1)
    return (
        docs
        + _NGRAM_JAC_CTES
        + f"""
            , pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {threshold}),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL
              SELECT id_b AS u, id_a AS v FROM pairs
            ),
            nodes AS (SELECT DISTINCT u AS id FROM edges),
            walk(id, comp) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT e.v, w.comp FROM walk w JOIN edges e ON e.u = w.id
            )
            SELECT id AS doc_id,
                   min(comp) AS component_id,
                   (id = min(comp)) AS is_canonical
            FROM walk GROUP BY id
        """
    )


# whitespace tokens, empties removed — the DuckDB twin of functions.text.tokens
_TOK_SQL = r"list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"

# positional word 3-gram sequence — twin of functions.text.word_shingle_seq
_SHINGLE_SEQ_SQL = r"""
              CASE WHEN len(w) >= 3 THEN
                     list_transform(generate_series(1, len(w) - 2),
                                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                   WHEN len(w) > 0 THEN [array_to_string(w, ' ')]
                   ELSE [] END
"""


def _fingerprint_oracle_sql(window: int = 4) -> str:
    """Exact winnowing-count parity: same positional shingles, same h31
    rolling hash, same sliding-window minima as functions.text
    .doc_fingerprint."""
    from airbyte_custom_spark.functions.text import h31_sql

    return f"""
            WITH tok AS (SELECT doc_id, {_TOK_SQL} AS w FROM documents),
            sq AS (SELECT doc_id, {_SHINGLE_SEQ_SQL} AS sh FROM tok),
            h AS (SELECT doc_id,
                         list_transform(sh, s -> {h31_sql('s')}) AS hs
                  FROM sq),
            mins AS (
              SELECT doc_id,
                     CASE WHEN len(hs) >= {window} THEN
                            list_transform(generate_series(1, len(hs) - {window - 1}),
                                           i -> list_aggregate(hs[i:i+{window - 1}], 'min'))
                          WHEN len(hs) > 0 THEN [list_aggregate(hs, 'min')]
                          ELSE [] END AS m
              FROM h)
            SELECT doc_id, CAST(len(list_distinct(m)) AS INT) AS n_fingerprints
            FROM mins
    """


def _simhash_oracle_sql(max_hamming: int = 3) -> str:
    """Exhaustive-pair simhash parity: identical signatures via the shared
    h31 token hash + simhash_params affine constants, then every pair with
    hamming ≤ max_hamming (the Spark side's 4-band join is pigeonhole-
    complete at ≤3, so the pair sets are equal, not just similar)."""
    from airbyte_custom_spark.functions.dedup import (
        SIMHASH_BITS,
        _MERSENNE,
        simhash_params,
    )
    from airbyte_custom_spark.functions.text import h31_sql

    a_c, b_c = simhash_params()
    bit_sums = ",\n                   ".join(
        f"SUM((({a_c[i]} * h + {b_c[i]}) % {_MERSENNE}) % 2) AS v{i}"
        for i in range(SIMHASH_BITS)
    )
    packed = " + ".join(
        f"(CASE WHEN 2 * v{i} > n THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    return f"""{_DUP_DOCS_SQL}
            , tok AS (SELECT doc_id, {_TOK_SQL} AS w FROM all_docs),
            th AS (SELECT doc_id,
                          list_transform(w, t -> {h31_sql('lower(t)')}) AS th
                   FROM tok),
            unn AS (SELECT doc_id, unnest(th) AS h FROM th),
            votes AS (SELECT doc_id, count(*) AS n,
                   {bit_sums}
                      FROM unn GROUP BY doc_id),
            sim0 AS (SELECT doc_id, CAST({packed} AS BIGINT) AS sim FROM votes),
            sim AS (SELECT t.doc_id, coalesce(s.sim, 0) AS sim
                    FROM th t LEFT JOIN sim0 s USING (doc_id))
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
            FROM sim a JOIN sim b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
    """


def _quality_lang_oracle_sql() -> str:
    """Integer-stable quality/lang parity: the argmax tie rule matches
    functions.text.lang_id (earlier language wins, 'und' when zero hits);
    quality replays the exact score formula and emits ×1000 as BIGINT."""
    sw = {
        "en": "'the','and','of','to','a','in','is','it','that','for'",
        "es": "'el','la','de','que','y','en','un','una','los','por'",
        "fr": "'le','la','de','et','les','des','un','une','que','pour'",
        "de": "'der','die','das','und','ist','ein','eine','nicht','mit','zu'",
    }
    hits = ",\n                   ".join(
        f"len(list_filter(w, x -> lower(x) IN ({s}))) AS h_{lang}"
        for lang, s in sw.items()
    )
    # NB: punct class matches functions.text.punct_ratio exactly
    punct = r"'[^.,;:!?''\"()\[\]{}-]'"
    return f"""
            WITH tok AS (SELECT doc_id, text, {_TOK_SQL} AS w FROM documents),
            m AS (SELECT doc_id,
                   len(w) AS n,
                   {hits},
                   length(regexp_replace(text, {punct}, '', 'g')) AS npunct,
                   length(text) AS nchars,
                   coalesce(list_aggregate(list_transform(w, x -> length(x)),
                                           'sum'), 0) AS tl
                  FROM tok),
            q AS (SELECT doc_id,
                   CASE WHEN greatest(h_en, h_es, h_fr, h_de) = 0 THEN 'und'
                        WHEN h_en = greatest(h_en, h_es, h_fr, h_de) THEN 'en'
                        WHEN h_es = greatest(h_en, h_es, h_fr, h_de) THEN 'es'
                        WHEN h_fr = greatest(h_en, h_es, h_fr, h_de) THEN 'fr'
                        ELSE 'de' END AS lang,
                   (CASE WHEN n >= 10 AND n <= 10000 THEN 1.0
                         WHEN n > 0 THEN 0.3 ELSE 0.0 END) AS len_ok,
                   (CASE WHEN n > 0 AND (h_en / n) > 0.01 AND (h_en / n) < 0.6
                         THEN 1.0 ELSE 0.2 END) AS sw_ok,
                   (CASE WHEN (CASE WHEN nchars > 0 THEN npunct / nchars
                                    ELSE 0.0 END) < 0.2
                         THEN 1.0 ELSE 0.2 END) AS punct_ok,
                   (CASE WHEN n > 0 AND (tl / n) >= 2.0 AND (tl / n) <= 12.0
                         THEN 1.0 ELSE 0.2 END) AS wl_ok
                  FROM m)
            SELECT doc_id, lang,
                   CAST(round(round(0.4 * len_ok + 0.3 * sw_ok
                              + 0.15 * punct_ok + 0.15 * wl_ok, 6) * 1000)
                        AS BIGINT) AS quality_x1000
            FROM q
    """


def _lsh_ann_oracle_sql(
    dim: int = 64, n_planes: int = 16, bands: int = 4, k: int = 5, seed: int = 42
) -> str:
    """Full-parity oracle for the hyperplane-LSH ANN: the seeded planes are
    inlined as literals and each sign bit is computed with the SAME strict
    left-fold dot product Spark's `_dot` uses (list_reduce seeded by the
    first element ≡ fold from 0.0), so signatures — and therefore candidate
    sets — are identical; the re-rank reuses the rounded-cosine ordering of
    the embedding_topk oracle.  dim is pinned to the testdata's embedding
    width."""
    from airbyte_custom_spark.functions.embeddings import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    rows = ",\n              ".join(
        f"({j}, [{', '.join(repr(float(x)) for x in planes[j])}]::DOUBLE[])"
        for j in range(n_planes)
    )
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1

    def banded(src: str, idc: str) -> str:
        return f"""
            SELECT {idc}, b.band,
                   (sig >> (b.band * {bits_per_band})) & {mask} AS bh
            FROM {src} CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1})) AS band) b
        """

    return f"""
            WITH pl(j, p) AS (VALUES
              {rows}),
            dots AS (
              SELECT e.vec_id, pl.j,
                     list_reduce(
                       list_transform(generate_series(1, {dim}),
                                      i -> CAST(e.embedding[i] AS DOUBLE) * pl.p[i]),
                       (a, x) -> a + x) AS dot
              FROM embeddings e CROSS JOIN pl
            ),
            sig AS (
              SELECT vec_id,
                     SUM(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << j)
                              ELSE 0 END) AS sig
              FROM dots GROUP BY vec_id
            ),
            dband AS ({banded('sig', 'vec_id')}),
            qband AS (
              SELECT vec_id AS query_id, band, bh FROM dband WHERE vec_id < 5
            ),
            cand AS (
              SELECT DISTINCT q.query_id, d.vec_id
              FROM qband q JOIN dband d USING (band, bh)
            ),
            -- cosine via the SAME left folds Spark's cosine_similarity
            -- uses (list_cosine_similarity differs in the last bit, which
            -- flips round-6 boundary cases)
            scored AS (
              SELECT c.query_id, c.vec_id,
                     round(CASE WHEN den > 0 THEN dotp / den ELSE 0.0 END, 6)
                         AS cosine
              FROM (
                SELECT c.query_id, c.vec_id,
                       list_reduce(list_transform(generate_series(1, {dim}),
                         i -> CAST(e.embedding[i] AS DOUBLE)
                              * CAST(qe.embedding[i] AS DOUBLE)),
                         (a, x) -> a + x) AS dotp,
                       sqrt(list_reduce(list_transform(generate_series(1, {dim}),
                         i -> CAST(e.embedding[i] AS DOUBLE)
                              * CAST(e.embedding[i] AS DOUBLE)),
                         (a, x) -> a + x))
                       * sqrt(list_reduce(list_transform(generate_series(1, {dim}),
                         i -> CAST(qe.embedding[i] AS DOUBLE)
                              * CAST(qe.embedding[i] AS DOUBLE)),
                         (a, x) -> a + x)) AS den
                FROM cand c
                JOIN embeddings e ON e.vec_id = c.vec_id
                JOIN embeddings qe ON qe.vec_id = c.query_id
              ) c
            ),
            ranked AS (
              SELECT query_id, vec_id, cosine,
                     CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
                     ) AS INT) AS rank
              FROM scored
            )
            SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


def _ivf_ann_oracle_sql(
    dim: int = 64, n_lists: int = 16, nprobe: int = 3, k: int = 5, seed: int = 42
) -> str:
    """Full-parity oracle for the IVF ANN: the seeded random unit
    centroids are inlined as literals; list assignment (argmax dot, ties
    to the LOWER list id) and the query's top-``nprobe`` probe lists use
    the SAME strict left-fold dot product as Spark's `_dot`, so the
    candidate sets are identical; the cosine re-rank reuses the
    embedding_topk oracle's fold-exact arithmetic."""
    from airbyte_custom_spark.functions.embeddings import ivf_random_centroids

    cents = ivf_random_centroids(dim, n_lists, seed)
    rows = ",\n              ".join(
        f"({j}, [{', '.join(repr(float(x)) for x in cents[j])}]::DOUBLE[])"
        for j in range(n_lists)
    )
    return f"""
            WITH ce(j, p) AS (VALUES
              {rows}),
            dots AS (
              SELECT e.vec_id, ce.j,
                     list_reduce(
                       list_transform(generate_series(1, {dim}),
                                      i -> CAST(e.embedding[i] AS DOUBLE) * ce.p[i]),
                       (a, x) -> a + x) AS dot
              FROM embeddings e CROSS JOIN ce
            ),
            assign AS (
              SELECT vec_id, j FROM (
                SELECT vec_id, j, row_number() OVER (
                  PARTITION BY vec_id ORDER BY dot DESC, j ASC) AS rn
                FROM dots) WHERE rn = 1
            ),
            probes AS (
              SELECT vec_id AS query_id, j FROM (
                SELECT vec_id, j, row_number() OVER (
                  PARTITION BY vec_id ORDER BY dot DESC, j ASC) AS rn
                FROM dots WHERE vec_id < 5) WHERE rn <= {nprobe}
            ),
            cand AS (
              SELECT DISTINCT q.query_id, d.vec_id
              FROM probes q JOIN assign d USING (j)
            ),
            scored AS (
              SELECT c.query_id, c.vec_id,
                     round(CASE WHEN den > 0 THEN dotp / den ELSE 0.0 END, 6)
                         AS cosine
              FROM (
                SELECT c.query_id, c.vec_id,
                       list_reduce(list_transform(generate_series(1, {dim}),
                         i -> CAST(e.embedding[i] AS DOUBLE)
                              * CAST(qe.embedding[i] AS DOUBLE)),
                         (a, x) -> a + x) AS dotp,
                       sqrt(list_reduce(list_transform(generate_series(1, {dim}),
                         i -> CAST(e.embedding[i] AS DOUBLE)
                              * CAST(e.embedding[i] AS DOUBLE)),
                         (a, x) -> a + x))
                       * sqrt(list_reduce(list_transform(generate_series(1, {dim}),
                         i -> CAST(qe.embedding[i] AS DOUBLE)
                              * CAST(qe.embedding[i] AS DOUBLE)),
                         (a, x) -> a + x)) AS den
                FROM cand c
                JOIN embeddings e ON e.vec_id = c.vec_id
                JOIN embeddings qe ON qe.vec_id = c.query_id
              ) c
            ),
            ranked AS (
              SELECT query_id, vec_id, cosine,
                     CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
                     ) AS INT) AS rank
              FROM scored
            )
            SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {k}
        """


def _multimodal_oracle_sql(n: int = 256, seed: int = 42) -> str:
    """Rebuilds synthetic_media's deterministic payload (ASCII hexdigest
    bytes — chosen so DuckDB's VARCHAR-only sha256 can hash it) and replays
    the fake feature extraction exactly: 16 little-endian uint32s from
    sha256(payload)||sha256(payload), % 10000 / 10000."""
    hv = "(strpos('0123456789abcdef', substring(f2, {p}, 1)) - 1)"

    def byte(pos: int) -> str:
        return f"(16 * {hv.format(p=pos)} + {hv.format(p=pos + 1)})"

    feats = []
    for j in range(16):
        b = 8 * j + 1
        u32 = (
            f"({byte(b)} + 256 * {byte(b + 2)} + 65536 * {byte(b + 4)}"
            f" + 16777216 * {byte(b + 6)})"
        )
        feats.append(f"(({u32} % 10000) / 10000.0)")
    # left-associated sum matches the Spark fold order
    total = feats[0]
    for f in feats[1:]:
        total = f"({total} + {f})"
    return f"""
            WITH m AS (
              SELECT i AS media_id,
                     CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image'
                          WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                     substring(repeat(sha256('{seed}:' || i), CAST(i % 7 AS INT) + 1),
                               1, 32 + CAST(i % 64 AS INT)) AS payload
              FROM range({n}) t(i)
            ),
            f AS (SELECT media_id, kind,
                         CAST(length(payload) AS INT) AS n_bytes,
                         repeat(sha256(payload), 2) AS f2
                  FROM m)
            SELECT media_id, kind, n_bytes,
                   round({total}, 4) AS feature_sum
            FROM f
    """


_EMB_NEAR_DUP_ORACLE = """
            WITH all_vecs AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 10000000 AS vec_id, embedding FROM embeddings
              WHERE vec_id % 100 = 0
            ),
            scored AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(list_cosine_similarity(a.embedding, b.embedding), 6)
                         AS cosine
              FROM all_vecs a JOIN all_vecs b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.999
"""
