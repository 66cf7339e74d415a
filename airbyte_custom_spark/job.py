"""spark-submit entrypoint: backfill phase then tail phase (S8 ordering,
`MySqlInitialReadUtil.java:87-169` — initial load strictly before CDC tail).

Usage (local or cluster; package shipped via --py-files):

  spark-submit --py-files acs.zip -m airbyte_custom_spark.job ...   # or:
  spark-submit --py-files acs.zip job_main.py gen --out /data/seg --events 1000000
  ... job_main.py init --table /data/tbl [--buckets 64]
  ... job_main.py backfill --table /data/tbl --snapshot /data/snap.parquet
  ... job_main.py tail --table /data/tbl --source /data/seg --checkpoint /data/ckpt
        [--follow] [--target-lsn N] [--max-files N] [--salt N]
  ... job_main.py show --table /data/tbl [--limit 20]
  ... job_main.py history --table /data/tbl
  ... job_main.py compact --table /data/tbl
"""

from __future__ import annotations

import argparse
import json
import sys

from airbyte_custom_spark.config import IngestConfig
from airbyte_custom_spark.lake.table import LakeTable
from airbyte_custom_spark.schema import TRANSCRIPT_SCHEMA
from airbyte_custom_spark.session import get_spark
from airbyte_custom_spark.sources.generator import change_events, write_event_chunks
from airbyte_custom_spark.streaming.pipeline import CdcIngestJob, backfill


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="airbyte_custom_spark.job")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="write synthetic binlog segments")
    g.add_argument("--out", required=True)
    g.add_argument("--events", type=int, default=1_000_000)
    g.add_argument("--convs", type=int, default=None)
    g.add_argument("--chunks", type=int, default=16)
    g.add_argument("--hot-fraction", type=float, default=0.0)
    g.add_argument("--seed", type=int, default=42)

    i = sub.add_parser("init", help="create an empty transcripts lake table")
    i.add_argument("--table", required=True)
    i.add_argument("--buckets", type=int, default=64)
    i.add_argument("--files-per-bucket", type=int, default=1)

    b = sub.add_parser("backfill", help="phase 1: initial snapshot load")
    b.add_argument("--table", required=True)
    b.add_argument("--snapshot", required=True, help="parquet of payload rows")
    b.add_argument("--lsn", type=int, default=0)

    t = sub.add_parser("tail", help="phase 2: checkpointed CDC tail → merge")
    t.add_argument("--table", required=True)
    t.add_argument("--source", required=True)
    t.add_argument("--checkpoint", required=True)
    t.add_argument("--query-id", default="cdc-ingest")
    t.add_argument("--follow", action="store_true", help="continuous; else availableNow")
    t.add_argument("--target-lsn", type=int, default=None)
    t.add_argument("--max-files", type=int, default=None)
    t.add_argument("--salt", type=int, default=0)
    t.add_argument(
        "--max-empty-polls", type=int, default=0,
        help="with --follow: stop + fail after N consecutive no-data "
             "triggers (C10 liveness; 0 = run forever)",
    )

    s = sub.add_parser("show", help="print final table rows")
    s.add_argument("--table", required=True)
    s.add_argument("--limit", type=int, default=20)

    h = sub.add_parser("history", help="print snapshot history")
    h.add_argument("--table", required=True)

    c = sub.add_parser("compact", help="rewrite fragmented buckets")
    c.add_argument("--table", required=True)
    c.add_argument("--min-files", type=int, default=2)

    args = ap.parse_args(argv)
    spark = get_spark(app_name=f"acs-{args.cmd}")

    if args.cmd == "gen":
        ev = change_events(
            spark,
            args.events,
            n_convs=args.convs or max(args.events // 15, 100),
            hot_fraction=args.hot_fraction,
            seed=args.seed,
        )
        chunks = write_event_chunks(ev, args.out, n_chunks=args.chunks)
        print(json.dumps({"segments": len(chunks), "events": args.events}))
    elif args.cmd == "init":
        t_ = LakeTable.create(
            spark,
            args.table,
            TRANSCRIPT_SCHEMA,
            num_buckets=args.buckets,
            files_per_bucket=args.files_per_bucket,
        )
        print(json.dumps({"table": args.table, "version": t_.version}))
    elif args.cmd == "backfill":
        t_ = LakeTable.load(spark, args.table)
        snap = spark.read.parquet(args.snapshot)
        v = backfill(spark, t_, snap, lsn=args.lsn)
        print(json.dumps({"version": v, "rows": t_.read().count()}))
    elif args.cmd == "tail":
        cfg = IngestConfig(
            query_id=args.query_id,
            max_files_per_trigger=args.max_files,
            salt_buckets=args.salt,
        )
        job = CdcIngestJob(
            spark, args.table, args.source, args.checkpoint, cfg,
            target_lsn=args.target_lsn,
        )
        if args.follow and args.max_empty_polls > 0:
            job.run_continuous(
                timeout_sec=float("inf"),
                max_empty_polls=args.max_empty_polls,
            )
        elif args.follow:
            q = job.start()
            q.awaitTermination()
        else:
            m = job.run_available_now()
            print(
                json.dumps(
                    {
                        "events": m.total_events,
                        "seconds": round(m.total_seconds, 3),
                        "events_per_sec": round(m.overall_events_per_sec, 1),
                        "batches": len(m.batches),
                    }
                )
            )
    elif args.cmd == "show":
        t_ = LakeTable.load(spark, args.table)
        t_.read().orderBy("conv_id", "turn_idx").show(args.limit, truncate=False)
    elif args.cmd == "history":
        t_ = LakeTable.load(spark, args.table)
        print(json.dumps(t_.history(), indent=1, default=str))
    elif args.cmd == "compact":
        t_ = LakeTable.load(spark, args.table)
        v = t_.compact(min_files_per_bucket=args.min_files)
        print(json.dumps({"compacted_to_version": v}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
