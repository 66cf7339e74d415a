"""One-command live check of the real-Iceberg K1 branch (see ICEBERG.md).

Run on any cluster/session with iceberg-spark-runtime + a catalog
configured (spark.sql.extensions with IcebergSparkSessionExtensions and a
spark.sql.catalog.<name>); exits non-zero with a clear message otherwise.

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
      --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.local.type=hadoop \
      --conf spark.sql.catalog.local.warehouse=/tmp/iceberg-warehouse \
      --py-files acs.zip scripts/iceberg_live_check.py [catalog.db.table]
"""

from __future__ import annotations

import os
import sys

# direct-run convenience; on a cluster --py-files provides the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airbyte_custom_spark.lake.iceberg import IcebergTable, iceberg_available
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.session import get_spark
from airbyte_custom_spark.sources.generator import change_events


def main() -> int:
    ident = sys.argv[1] if len(sys.argv) > 1 else "local.db.acs_live_check"
    spark = get_spark(app_name="iceberg-live-check")
    catalog = ident.split(".", 1)[0]
    if not iceberg_available(spark, catalog):
        print(
            f"FAIL: Iceberg runtime not configured for catalog {catalog!r} — "
            "see ICEBERG.md for the spark-submit conf (extensions + catalog).",
            file=sys.stderr,
        )
        return 2

    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {'.'.join(ident.split('.')[:2])}")
    spark.sql(f"DROP TABLE IF EXISTS {ident}")
    t = IcebergTable(spark, ident)
    t.create(TRANSCRIPT_SCHEMA, num_buckets=4)

    events = change_events(spark, 5000, n_convs=120, max_turns=8, p_delete=0.1)
    r1 = t.merge(events, batch_id=0, query_id="live-check")
    assert not r1.skipped, "first merge must apply"
    n = t.read().count()
    assert n > 0, "final table empty after merge"
    r2 = t.merge(events, batch_id=0, query_id="live-check")
    assert r2.skipped, "replayed batch must skip via the property ledger"
    assert t.last_committed_batch("live-check") == 0

    # snapshot lifecycle surface (round-4 parity verbs)
    sid = t.tag("live-check-pin")
    assert t.tags().get("live-check-pin") == sid
    some_id = t.read().select("conv_id").first()["conv_id"]
    assert t.lookup([some_id], columns=("conv_id",)).count() > 0
    t.rollback(tag="live-check-pin")
    assert t.read().count() == n, "rollback to the pinned snapshot changed state"
    t.drop_tag("live-check-pin")

    # maintenance surface
    t.gc_tombstones(lsn_watermark=0)
    stats = t.expire_snapshots(retain_last=2)
    print(f"OK: {ident} merged {n} rows, replay skipped, lifecycle verbs ran, "
          f"maintenance ran {stats}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
