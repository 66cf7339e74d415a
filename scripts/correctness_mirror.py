"""Driver-mirror correctness check, stricter than tests/test_oracle_parity.py.

The driver compares Spark vs DuckDB at sf0.01 by sorting columns by name
and hashing values — so a dtype difference (e.g. DuckDB HUGEINT sum
surfacing as float where Spark returns int) fails the hash even when every
value is numerically equal.  This script mirrors that: it runs the FIRST
50 registry entries (the driver's budget) at sf0.01 and compares values
WITHOUT numeric coercion — int 3 vs float 3.0 is a reported mismatch.

Usage: python scripts/correctness_mirror.py [n_queries] [sf_dir]
Prints one JSON line per query and a final summary line.
"""

import json
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from airbyte_custom_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _cell(v):
    # No numeric coercion: the tag keeps int-vs-float distinct (3 vs 3.0),
    # which is the class of mismatch the driver's value hash catches.
    # numpy scalars (np.int64 from toPandas(), np.float64, np.bool_) must
    # hit the SAME branches as their Python twins — np.int64 is not a
    # Python int, so plain isinstance checks would fall through to the
    # repr branch and report spurious dtype mismatches against a DuckDB
    # result surfaced as Python objects.
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NA or v is pd.NaT:
        return "\x00null"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "\x00nan"
        # floats compare at driver-hash granularity; round only to absorb
        # non-associative float addition order, not dtype.
        return f"f:{round(float(v), 6)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    return f"s:{v}"


def _norm(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = sorted(
        tuple(_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="correctness-mirror", master="local[8]",
                      shuffle_partitions=8)
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(queries)[:n]
    con = _duck(sf_dir)  # hold the connection for the whole run
    fails = []
    for name in names:
        rec = {"q": name}
        try:
            got = queries[name](spark, sf_dir).toPandas()
            rec["spark_rows"] = len(got)
            if name not in oracles:
                rec["oracle"] = "absent (rows-only check)"
                print(json.dumps(rec))
                continue
            want = con.sql(oracles[name]).df()
            rec["oracle_rows"] = len(want)
            g_cols, g_rows = _norm(got)
            w_cols, w_rows = _norm(want)
            rec["rows_match"] = len(g_rows) == len(w_rows)
            rec["schema_match"] = g_cols == w_cols
            rec["hash_match"] = g_rows == w_rows
            if not rec["hash_match"] and rec["rows_match"]:
                for a, b in zip(g_rows, w_rows):
                    if a != b:
                        rec["first_diff"] = {"spark": a, "duck": b}
                        break
            if not (rec["rows_match"] and rec["schema_match"]
                    and rec["hash_match"]):
                fails.append(name)
        except Exception as exc:  # pragma: no cover - diagnostic tool
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
            fails.append(name)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"checked": len(names), "failed": fails}))
    spark.stop()


if __name__ == "__main__":
    main()
