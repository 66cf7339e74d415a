"""Schema diff + evolution (SURVEY.md §2.7, E1-E4).

Reference behavior reproduced:
  E1 detect added / removed / retyped columns vs the existing final table
     (`BigQuerySqlGenerator.java:229-306`, `AlterTableReport.java:1-25`);
  E2 compatible changes evolve in place (LakeTable.evolve_schema — the
     Iceberg ALTER TABLE analog); incompatible changes soft-reset
     (LakeTable.soft_reset, `BigQuerySqlGenerator.java:322-335`);
  E3 dropped column: final keeps history, new writes stop populating it
     (modeled as evolution-with-null — the column stays, new rows are null);
  CDC-mode rule: schema changes apply at sync boundaries, never mid-stream
     (`docs/understanding-airbyte/cdc.md:27`) — a running StreamingQuery has
     a fixed schema, so evolution happens between runs.

The payload-inference stage is Arrow-vectorized: a bounded sample of JSON
payloads is pulled to the driver in one Arrow batch (``toPandas`` with
Arrow enabled) and inferred with pandas — no per-row Python inside Spark
tasks (north-rule constraint); inference cost is O(sample), independent of
stream size.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, types as T

_WIDENINGS: set[tuple[str, str]] = {
    ("integer", "long"),
    ("integer", "double"),
    ("long", "double"),
    ("float", "double"),
    ("date", "timestamp"),
}


@dataclass
class SchemaDiff:
    """AlterTableReport analog (`AlterTableReport.java:1-25`)."""

    added: list[T.StructField] = field(default_factory=list)
    removed: list[str] = field(default_factory=list)
    widened: list[tuple[str, T.DataType, T.DataType]] = field(default_factory=list)
    incompatible: list[tuple[str, T.DataType, T.DataType]] = field(default_factory=list)

    @property
    def no_change(self) -> bool:
        return not (self.added or self.removed or self.widened or self.incompatible)

    @property
    def compatible(self) -> bool:
        """Evolvable in place (add / widen).  Removed columns are compatible
        too: the column stays in the table, new rows leave it null (E3)."""
        return not self.incompatible


def diff_schemas(current: T.StructType, incoming: T.StructType) -> SchemaDiff:
    cur = {f.name: f for f in current.fields}
    inc = {f.name: f for f in incoming.fields}
    d = SchemaDiff()
    for name, f in inc.items():
        if name not in cur:
            d.added.append(T.StructField(name, f.dataType, True))
        elif f.dataType != cur[name].dataType:
            pair = (cur[name].dataType.typeName(), f.dataType.typeName())
            if pair in _WIDENINGS:
                d.widened.append((name, cur[name].dataType, f.dataType))
            elif (f.dataType.typeName(), cur[name].dataType.typeName()) in _WIDENINGS:
                # incoming is NARROWER — current already covers it; no-op
                pass
            else:
                d.incompatible.append((name, cur[name].dataType, f.dataType))
    for name in cur:
        if name not in inc:
            d.removed.append(name)
    return d


def evolved_payload(current: T.StructType, diff: SchemaDiff) -> T.StructType:
    """Apply a compatible diff: keep every current column (removed columns
    stay, per E3), widen in place, append added columns."""
    widen = {name: dst for name, _src, dst in diff.widened}
    fields = [
        T.StructField(f.name, widen.get(f.name, f.dataType), True)
        for f in current.fields
    ]
    fields += diff.added
    return T.StructType(fields)


def evolve_table_for(table, incoming_payload: T.StructType) -> SchemaDiff:
    """Diff the table's payload schema against an incoming batch schema and
    evolve the table in place when compatible; raise when not (caller
    decides whether to soft_reset).  Returns the diff for logging."""
    current = T.StructType(
        [f for f in table.schema().fields if f.name in set(table.payload_columns)]
    )
    diff = diff_schemas(current, incoming_payload)
    # incompatible check FIRST: an incompatible-only diff (pure retype, no
    # adds/widens) must raise, not silently return — the caller needs to
    # know a soft_reset is required
    if not diff.compatible:
        raise ValueError(
            f"incompatible schema change {diff.incompatible} — use soft_reset"
        )
    if diff.no_change or (not diff.added and not diff.widened):
        return diff
    table.evolve_schema(evolved_payload(current, diff))
    return diff


# ---------------------------------------------------------------------------
# Arrow-vectorized JSON payload schema inference
# ---------------------------------------------------------------------------

_PANDAS_TO_SPARK: list[tuple[str, T.DataType]] = [
    ("bool", T.BooleanType()),
    ("int", T.LongType()),
    ("float", T.DoubleType()),
    ("datetime", T.TimestampType()),
]


def _infer_series_type(s: pd.Series) -> T.DataType:
    s = s.dropna()
    if s.empty:
        return T.StringType()
    if s.map(lambda v: isinstance(v, bool)).all():
        return T.BooleanType()
    if s.map(lambda v: isinstance(v, int) and not isinstance(v, bool)).all():
        return T.LongType()
    if s.map(lambda v: isinstance(v, (int, float)) and not isinstance(v, bool)).all():
        return T.DoubleType()
    if s.map(lambda v: isinstance(v, list)).all():
        return T.ArrayType(T.StringType())
    if s.map(lambda v: isinstance(v, dict)).all():
        return T.StringType()  # free object → JSON string (schema.py policy)
    return T.StringType()


def infer_payload_schema(
    df: DataFrame, json_col: str, sample_rows: int = 2048
) -> T.StructType:
    """Infer a StructType from a column of JSON object strings.

    Pulls ≤ ``sample_rows`` payloads to the driver in one Arrow batch and
    infers with pandas — the 'vectorized Arrow-based schema-diff stage' of
    the north star.  Bounded, metadata-only; never runs per row over the
    full stream."""
    sample = (
        df.select(json_col).filter(f"{json_col} is not null").limit(sample_rows).toPandas()
    )
    if sample.empty:
        return T.StructType([])
    parsed = pd.json_normalize(sample[json_col].map(json.loads), max_level=0)
    fields = [
        T.StructField(name, _infer_series_type(parsed[name]), True)
        for name in parsed.columns
    ]
    return T.StructType(fields)
