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


def test_iceberg_surface_matches_laketable(spark):
    """The dispatch contract: every pipeline-facing LakeTable method the
    ingest/maintenance paths call must exist on IcebergTable with a
    compatible signature, so `open_table` swaps implementations with zero
    call-site changes (round-3: soft_reset / gc_tombstones /
    expire_snapshots / widen-typed evolve_schema added)."""
    import inspect

    surface = [
        "merge",
        "merge_with_retry",
        "read",
        "lookup",
        "compact",
        "evolve_schema",
        "soft_reset",
        "gc_tombstones",
        "expire_snapshots",
        "last_committed_batch",
        "schema",
        "tag",
        "tags",
        "drop_tag",
        "rollback",
    ]
    for name in surface:
        assert callable(getattr(IcebergTable, name, None)), name
    # keyword compatibility for the calls the pipeline actually makes
    m = inspect.signature(IcebergTable.merge)
    for kw in ("batch_id", "query_id"):
        assert kw in m.parameters
    assert "rename_map" in inspect.signature(IcebergTable.soft_reset).parameters
    assert "lsn_watermark" in inspect.signature(IcebergTable.gc_tombstones).parameters
    e = inspect.signature(IcebergTable.expire_snapshots)
    assert "retain_last" in e.parameters and "remove_orphans" in e.parameters
    # read() accepts LakeTable's flags
    r = inspect.signature(IcebergTable.read)
    assert "include_deleted" in r.parameters and "include_meta" in r.parameters
    # lifecycle verbs keep LakeTable's keyword shapes
    lk = inspect.signature(IcebergTable.lookup)
    assert "columns" in lk.parameters and "include_meta" in lk.parameters
    tg = inspect.signature(IcebergTable.tag)
    assert "version" in tg.parameters
    rb = inspect.signature(IcebergTable.rollback)
    assert "version" in rb.parameters and "tag" in rb.parameters
    mr = inspect.signature(IcebergTable.merge_with_retry)
    for kw in ("batch_id", "query_id", "retries"):
        assert kw in mr.parameters


def test_open_table_forwards_primary_key(spark, tmp_path):
    """round-2 ADVICE: a non-default pk must reach whichever branch the
    factory takes (the Iceberg branch previously hardcoded the default,
    producing a wrong MERGE ON clause)."""
    t = open_table(
        spark,
        str(tmp_path / "tbl"),
        ident="ice.db.t",
        payload_schema=TRANSCRIPT_SCHEMA,
        primary_key=("conv_id",),
        num_buckets=2,
    )
    assert t.primary_key == ["conv_id"]
    # and the Iceberg-branch constructor path honors it too
    it = IcebergTable(spark, "ice.db.t", primary_key=("conv_id",))
    assert it.primary_key == ["conv_id"]


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
    assert t.merge(events, batch_id=0, query_id="q").skipped


def test_iceberg_merge_source_uses_windowgrouplimit(spark):
    """round-3 VERDICT item 3: the Iceberg branch's pre-MERGE reduce must
    use the WindowGroupLimit top-1 formulation (map-side top-1 per key),
    NOT the max_by SortAggregate form SCALE.md measured 2.1× slower.  The
    source frame builds without the Iceberg jar, so the plan is assertable
    in this image even though MERGE itself can't run."""
    from airbyte_custom_spark.plans.inspect import explain_str
    from airbyte_custom_spark.sources.generator import change_events

    t = IcebergTable(spark, "ice.db.t")
    src = t.merge_source(change_events(spark, 500, n_convs=20, max_turns=6))
    plan = explain_str(src, "formatted")
    assert "WindowGroupLimit" in plan, plan
    assert "SortAggregate" not in plan, plan
    # output shape: payload + (_lsn, _deleted), CDC envelope consumed
    cols = set(src.columns)
    assert {"_lsn", "_deleted"} <= cols
    assert "op" not in cols and "lsn" not in cols and "_del" not in cols
