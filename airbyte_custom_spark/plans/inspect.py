"""Physical-plan inspection helpers — used by tests to assert the plans we
actually want (pushdown reached the scan, codegen spans are wide, joins
chose the intended strategy), not just plans that happen to return the
right rows (SURVEY.md §4)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *needles: str) -> None:
    """Assert each needle appears in the scan's PushedFilters list —
    i.e. Catalyst pushed the predicate into the parquet reader."""
    plan = explain_str(df)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = ", ".join(m)
    for needle in needles:
        assert needle.lower() in pushed.lower(), (
            f"filter `{needle}` not pushed to scan; PushedFilters=[{pushed}]"
        )


def wholestage_spans(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans in the physical plan
    (Spark 4 formatted mode labels nodes `[codegen id : n]`; simple mode
    uses `*(n)` asterisks).  More nodes inside fewer spans = more of the
    plan runs as generated JVM code."""
    ids = re.findall(r"codegen id : (\d+)", explain_str(df, "formatted"))
    return len(set(ids))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (broadcast
    exchanges excluded) — the unit of cost the scaling gate cares about."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning", plan))


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the scan's ReadSchema (column-pruning check)."""
    plan = explain_str(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
