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
# contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_cdc_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_flatten_events": q_cdc_flatten_events,
        "cdc_latest_per_key": q_cdc_latest_per_key,
        "cdc_final_state": q_cdc_final_state,
        "cdc_final_state_incremental": q_cdc_final_state_incremental,
        "cdc_stream_tail_final_state": q_cdc_stream_tail_final_state,
        "incremental_cursor_scan": q_incremental_cursor_scan,
        "full_refresh_scan": q_full_refresh_scan,
        "chunked_snapshot_plan": q_chunked_snapshot_plan,
        "scd2_history": q_scd2_history,
        "name_normalization": q_name_normalization,
        "validate_pk_counts": q_validate_pk_counts,
        "raw_table_envelope": q_raw_table_envelope,
    }


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
        "cdc_final_state_incremental": _ORACLE_FINAL,
        "cdc_stream_tail_final_state": _ORACLE_FINAL,
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
    }
