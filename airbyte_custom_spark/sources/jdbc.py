"""JDBC relational-database sources (SURVEY.md §2.1 S1/S2/S3).

The reference reads live databases through a JDBC iterator stack
(`AbstractDbSource.java:479-491` full refresh, `:653-664` incremental
cursor) and chunks initial snapshots into resumable pk ranges
(`MySqlInitialLoadRecordIterator.java:119-167`).  Spark's JDBC source
covers all of it declaratively:

  * full refresh  → ``spark.read.jdbc`` with ``partitionColumn/lowerBound/
    upperBound/numPartitions`` — Spark generates one range predicate per
    partition and reads them in parallel (the S3/S4 chunk plan, executed
    concurrently instead of sequentially);
  * incremental   → the same reader with a pushed ``cursor > state``
    predicate (Catalyst pushes it into the generated SQL);
  * explicit chunks → ``predicates=[...]`` (one reader task per predicate),
    which is the closest analog of the reference's resumable chunk
    boundaries — ``chunk_predicates`` builds exactly those strings.

Scale note: ``numPartitions`` bounds concurrent connections to the source
database — the reference throttles the same way with its connection pool.
Partition bounds should come from ``min(pk)/max(pk)`` (one cheap query),
exactly like `MySqlInitialLoadRecordIterator` derives chunk bounds.

No JDBC driver jar ships in this sandbox image, so the live-read test is
skipped-if-no-driver; the plan/predicate construction is pure and tested.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcSourceConfig:
    """Connection + table coordinates (the `source-postgres`/`source-mysql`
    config analog: host/port/db/credentials collapse into the JDBC url)."""

    url: str                      # jdbc:postgresql://host:5432/db
    table: str                    # schema-qualified table or (subquery) t
    user: str | None = None
    password: str | None = None
    driver: str | None = None     # e.g. org.postgresql.Driver
    fetch_size: int = 10_000      # streaming fetch, reference default-ish

    def options(self) -> dict[str, str]:
        opts = {"url": self.url, "dbtable": self.table,
                "fetchsize": str(self.fetch_size)}
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        if self.driver is not None:
            opts["driver"] = self.driver
        return opts


def chunk_predicates(
    pk_col: str,
    lower: int,
    upper: int,
    chunk_size: int,
) -> list[str]:
    """Contiguous, non-overlapping pk-range predicates covering
    [lower, upper] — the resumable chunk plan of
    `MySqlInitialLoadRecordIterator.java:119-167` as WHERE strings.

    Half-open ranges ``pk >= lo AND pk < hi`` except the last (closed), so
    the union is exactly the full range with no row read twice."""
    if upper < lower:
        return []
    preds: list[str] = []
    lo = lower
    while lo <= upper:
        hi = lo + chunk_size
        if hi > upper:
            preds.append(f"{pk_col} >= {lo} AND {pk_col} <= {upper}")
            break
        preds.append(f"{pk_col} >= {lo} AND {pk_col} < {hi}")
        lo = hi
    return preds


def full_refresh_read(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """S1 full-refresh scan (`AbstractDbSource.java:479-491`).  With a
    partition column, Spark issues ``num_partitions`` parallel range reads
    (the S3/S4 chunked snapshot, parallelized)."""
    reader = spark.read.format("jdbc")
    for k, v in cfg.options().items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def incremental_read(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    cursor_col: str,
    cursor_state,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """S2 incremental cursor read (`AbstractDbSource.java:653-664`): rows
    with cursor strictly above the saved state.  The filter is applied on
    the Spark side and PUSHED into the generated JDBC SQL by Catalyst
    (JDBCScan pushes comparison predicates), so the database does the
    filtering — same wire behavior as the reference's WHERE clause."""
    df = full_refresh_read(
        spark, cfg, partition_column, lower_bound, upper_bound, num_partitions
    )
    from pyspark.sql import functions as F

    return df.filter(F.col(cursor_col) > F.lit(cursor_state))


def chunked_read(
    spark: SparkSession,
    cfg: JdbcSourceConfig,
    pk_col: str,
    lower: int,
    upper: int,
    chunk_size: int,
) -> DataFrame:
    """S3/S4 explicit-chunk snapshot: one reader task per pk-range
    predicate (`MySqlInitialLoadRecordIterator` chunk semantics).  Use when
    chunk boundaries must be controlled exactly (e.g. to mirror saved
    per-chunk state); otherwise prefer ``full_refresh_read`` with a
    partition column."""
    props = {k: v for k, v in cfg.options().items() if k not in ("url", "dbtable")}
    return spark.read.jdbc(
        url=cfg.url,
        table=cfg.table,
        predicates=chunk_predicates(pk_col, lower, upper, chunk_size),
        properties=props,
    )
