"""File-format event sources (SURVEY.md §2.1 S10).

The reference ships CSV/JSONL/Avro/Parquet parsers with schema inference
(`airbyte-cdk/python/airbyte_cdk/sources/file_based/file_types/*`); Spark
has all of these built in — this module just pins the event-schema reading
conventions (no inference in production paths: explicit schema, permissive
mode, corrupt-record capture) and the symmetric writers used by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from airbyte_custom_spark.schema import CDC_EVENT_SCHEMA

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def avro_available(spark: SparkSession) -> bool:
    """True when the `spark-avro` module is on the session classpath.
    Spark ships Avro as an EXTERNAL module (`--packages
    org.apache.spark:spark-avro_2.13:<version>`); this image has only the
    avro core jars, so the branch is exercised on clusters that add the
    module (reference parser:
    `airbyte-cdk/.../file_based/file_types/avro_parser.py`)."""
    try:
        # the registration check Spark itself uses — mere presence of the
        # AvroFileFormat CLASS is not enough (this image ships the class
        # but not the ServiceLoader registration, and reads still fail)
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # type: ignore[union-attr]
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def read_events(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType = CDC_EVENT_SCHEMA,
) -> DataFrame:
    """Read CDC events from parquet / jsonl / csv with the declared schema.

    PERMISSIVE mode + `_corrupt_record` capture mirrors the reference's
    "schema mismatch must never fail replication" rule
    (`airbyte-protocol.md:431-442`): malformed lines land as NULL rows with
    the raw text preserved instead of failing the sync."""
    if fmt == "parquet":
        return spark.read.schema(schema).parquet(path)
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    if fmt in ("jsonl", "json"):
        return (
            spark.read.schema(with_corrupt)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .option("timestampFormat", _TS_FMT)
            .json(path)
        )
    if fmt == "csv":
        return (
            spark.read.schema(with_corrupt)
            .option("header", "true")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .option("timestampFormat", _TS_FMT)
            .csv(path)
        )
    if fmt == "avro":
        if not avro_available(spark):
            raise RuntimeError(
                "avro format requires the spark-avro module jar "
                "(org.apache.spark:spark-avro_2.13) on the classpath — not "
                "present in this image; add it via spark-submit --packages"
            )
        # Avro carries its own schema per file; the declared schema is
        # enforced by projection+cast on read (S10 explicit-schema rule)
        df = spark.read.format("avro").load(path)
        return df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    raise ValueError(f"unsupported format: {fmt} (parquet|jsonl|csv|avro)")


def write_events(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif fmt in ("jsonl", "json"):
        df.write.mode("overwrite").option("timestampFormat", _TS_FMT).json(path)
    elif fmt == "csv":
        (
            df.write.mode("overwrite")
            .option("header", "true")
            .option("timestampFormat", _TS_FMT)
            .csv(path)
        )
    elif fmt == "avro":
        if not avro_available(df.sparkSession):
            raise RuntimeError(
                "avro format requires the spark-avro module jar "
                "(org.apache.spark:spark-avro_2.13) on the classpath — not "
                "present in this image; add it via spark-submit --packages"
            )
        df.write.mode("overwrite").format("avro").save(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def infer_event_schema(spark: SparkSession, path: str, fmt: str = "jsonl") -> T.StructType:
    """Schema inference for discovery (`discover` analog) — dev/discovery
    only; production reads always declare the schema."""
    if fmt in ("jsonl", "json"):
        return spark.read.option("timestampFormat", _TS_FMT).json(path).schema
    if fmt == "csv":
        return (
            spark.read.option("header", "true")
            .option("inferSchema", "true")
            .csv(path)
            .schema
        )
    return spark.read.parquet(path).schema
