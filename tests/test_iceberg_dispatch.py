"""K1 Iceberg dispatch: the factory picks the real Iceberg table when the
runtime is configured, the parquet-snapshot LakeTable otherwise.  The live
Iceberg round-trip is skipped here because no iceberg-spark-runtime jar
ships in this image (documented limitation; on a cluster the same test
body runs unskipped)."""

import pytest

from airbyte_custom_spark.lake.iceberg import (
    IcebergTable,
    iceberg_available,
    open_table,
)
from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA


def test_dispatch_falls_back_without_runtime(spark, tmp_path):
    assert not iceberg_available(spark)
    t = open_table(
        spark,
        str(tmp_path / "tbl"),
        ident="ice.db.transcripts",
        payload_schema=TRANSCRIPT_SCHEMA,
        num_buckets=2,
    )
    assert isinstance(t, LakeTable)
    # reopening loads the existing table rather than re-creating
    t2 = open_table(spark, str(tmp_path / "tbl"), payload_schema=TRANSCRIPT_SCHEMA)
    assert isinstance(t2, LakeTable) and t2.version == t.version


def test_iceberg_merge_roundtrip(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip(
            "no iceberg-spark-runtime jar in image — on a cluster, configure "
            "spark.sql.extensions + spark.sql.catalog.* and this runs"
        )
    from airbyte_custom_spark.sources.generator import change_events

    t = IcebergTable(spark, "spark_catalog.default.acs_test")
    t.create(TRANSCRIPT_SCHEMA, num_buckets=4)
    events = change_events(spark, 2000, n_convs=50, max_turns=8, p_delete=0.1)
    t.merge(events, batch_id=0, query_id="q")
    assert t.last_committed_batch("q") == 0
    assert t.read().count() > 0
    # replay skip
    assert t.merge(events, batch_id=0, query_id="q") is None
