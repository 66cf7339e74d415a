"""Driver script for the real `spark-submit --py-files` deployment check.

The north rule's deployment mode is `spark-submit --py-files` on a
multi-executor cluster (reference lifecycle: Airbyte worker launching the
connector process; our Spark replacement ships `airbyte_custom_spark` as a
zip).  `tests/test_spark_submit.py` runs THIS file through the real
`spark-submit` binary with the package available ONLY via `--py-files
acs.zip` (cwd is a temp dir, PYTHONPATH stripped) — proving the engine is
deployable exactly as documented in README.md, not only importable from a
repo checkout.

Runs the minimal end-to-end lifecycle in one JVM: gen → init → tail, then
re-opens the table and prints one JSON line {"rows": N, "version": V}.

Usage:
  spark-submit --py-files acs.zip submit_smoke.py <seg> <tbl> <ckpt> [events]
"""

import json
import sys


def main() -> int:
    seg, tbl, ckpt = sys.argv[1:4]
    events = int(sys.argv[4]) if len(sys.argv) > 4 else 2000

    # Import INSIDE main: the package must resolve from the --py-files zip.
    from airbyte_custom_spark.job import main as job_main
    from airbyte_custom_spark.lake.table import LakeTable
    from airbyte_custom_spark.session import get_spark

    # one session for all phases; modest parallelism — this is a
    # deployment check, not a benchmark
    spark = get_spark(app_name="submit-smoke", master="local[4]",
                      shuffle_partitions=8)

    for argv in (
        ["gen", "--out", seg, "--events", str(events), "--chunks", "2"],
        ["init", "--table", tbl, "--buckets", "4"],
        ["tail", "--table", tbl, "--source", seg, "--checkpoint", ckpt],
    ):
        rc = job_main(argv, stop_session=False)
        if rc != 0:
            print(json.dumps({"ok": False, "failed": argv}))
            return rc

    t = LakeTable.load(spark, tbl)
    print(json.dumps({
        "ok": True,
        "rows": int(t.read().count()),
        "version": t.version,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
