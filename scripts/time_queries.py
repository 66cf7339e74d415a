#!/usr/bin/env python
"""Time every declared query at a given SF (noop sink) — round-6 sweep.

Usage: python scripts/time_queries.py [sf_dir] [name ...]
Prints one JSON line {name: seconds}.  Composite queries (table builds +
merges) time the whole call + one materialization, like the driver does.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as entry
    from airbyte_custom_spark.session import get_spark

    spark = get_spark(app_name="time-queries")
    qs = entry.queries()
    names = sys.argv[2:] or list(qs)
    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        try:
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            out[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # record, keep sweeping
            out[name] = f"ERR {type(e).__name__}: {e}"[:200]
        print(f"  {name}: {out[name]}", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
