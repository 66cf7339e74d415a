"""Single-pass column profiler: the data-quality / distribution summary a
training-data pipeline runs over every new partition before admitting it.

Scale design: ONE aggregation job over ONE scan — every metric is an
aggregate expression with a map-side partial, so only the tiny combined
state (a few doubles per column) ever crosses the shuffle; nothing is
collected per-row and no column is scanned twice.  The one deliberate
exception is exact distinct counts: Spark plans k simultaneous
``count(DISTINCT colᵢ)`` with an Expand that replicates scan rows ×k —
fine at audit scale, wrong as a default at 100 TB, so ``distinct_mode``
defaults to ``"approx"`` (HyperLogLog++, single pass, no Expand) and
``"exact"`` is opt-in.

Reference parity: the reference tracks per-stream record/byte/null counts
in its sync stats (`AirbyteStateStats`, SURVEY.md §2 A1-A3); this extends
the same accounting to full column distributions the way a lakehouse
ingest audit would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _pname(p: float) -> str:
    v = p * 100
    return f"p{int(v)}" if float(int(v)) == v else f"p{v:g}".replace(".", "_")


def profile_columns(
    df: DataFrame,
    numeric_cols: tuple[str, ...] | list[str] = (),
    string_cols: tuple[str, ...] | list[str] = (),
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    distinct_mode: str = "approx",
) -> DataFrame:
    """Long-format profile ``(col_name, metric, value)`` — value is DOUBLE.

    numeric metrics: count (non-null), nulls, distinct, min, max, mean,
    stddev (sample), one exact interpolated percentile per requested p
    (``percentile``; nulls ignored — the same semantics as SQL
    ``quantile_cont``).  mean/stddev round to 2 decimals: float summation
    order is nondeterministic under partial aggregation, so publishing
    more precision than the accumulation guarantees would make the
    profile itself flaky.

    string metrics: count, nulls, distinct, min_len, max_len, avg_len
    (characters), empty (zero-length count).

    distinct_mode: "approx" (default — HLL++, single pass, the 100-TB
    path), "exact" (audit scale; one extra column-pruned pass over
    ``df`` PER exact column — cheap on a parquet scan, but cache ``df``
    first if it is an expensive computed pipeline), "none" (skip).
    """
    if distinct_mode not in ("approx", "exact", "none"):
        raise ValueError(f"unknown distinct_mode {distinct_mode!r}")

    aggs: list = []
    # (col, metric, stack SQL expression over the assembled one-row frame)
    entries: list[tuple[str, str, str]] = []
    exact_cols: list[tuple[str, str]] = []  # (col, alias) — separate aggs

    def add(col: str, metric: str, expr) -> None:
        alias = f"_{len(entries)}"
        aggs.append(expr.alias(alias))
        entries.append((col, metric, alias))

    def add_distinct(c: str) -> None:
        if distinct_mode == "approx":
            add(c, "distinct", F.approx_count_distinct(c))
        else:
            # EXACT distinct stays OUT of the shared aggregation: k
            # simultaneous count(DISTINCT colᵢ) plan as an Expand that
            # replicates every scan row ×(k+1) through EVERY other
            # aggregate — the exact percentile buffers then ingest the
            # replicated stream too (measured 21-24s combined vs
            # 2.5s + 5s apart at 600k rows).  Each column's exact
            # distinct runs as its own single-distinct aggregation
            # (2-stage partial-distinct hash agg, no Expand) over a
            # column-pruned scan, cross-joined back as a 1-row frame.
            alias = f"_{len(entries)}"
            exact_cols.append((c, alias))
            entries.append((c, "distinct", alias))

    for c in numeric_cols:
        col = F.col(c)
        add(c, "count", F.count(col))
        add(c, "nulls", F.count(F.lit(1)) - F.count(col))
        if distinct_mode != "none":
            add_distinct(c)
        add(c, "min", F.min(col))
        add(c, "max", F.max(col))
        add(c, "mean", F.round(F.avg(col), 2))
        add(c, "stddev", F.round(F.stddev_samp(col), 2))
        if percentiles:
            # ONE exact-percentile buffer per column (array form) instead
            # of one full value buffer per requested p — same algorithm,
            # same interpolated values, 1/len(percentiles) the state
            alias = f"_q{len(entries)}"
            aggs.append(
                F.percentile(
                    col, F.lit([float(p) for p in percentiles])
                ).alias(alias)
            )
            for i, p in enumerate(percentiles):
                entries.append(
                    (c, _pname(p), f"round(element_at({alias}, {i + 1}), 6)")
                )
    for c in string_cols:
        col = F.col(c)
        add(c, "count", F.count(col))
        add(c, "nulls", F.count(F.lit(1)) - F.count(col))
        if distinct_mode != "none":
            add_distinct(c)
        add(c, "min_len", F.min(F.length(col)))
        add(c, "max_len", F.max(F.length(col)))
        add(c, "avg_len", F.round(F.avg(F.length(col)), 2))
        add(c, "empty", F.count(F.when(F.length(col) == 0, 1)))
    if not entries:
        raise ValueError("no columns to profile")

    one = df.agg(*aggs)
    for c, alias in exact_cols:
        one = one.crossJoin(df.agg(F.count_distinct(F.col(c)).alias(alias)))
    stacked = ", ".join(
        f"'{col}', '{metric}', cast({expr} as double)"
        for col, metric, expr in entries
    )
    return one.selectExpr(
        f"stack({len(entries)}, {stacked}) as (col_name, metric, value)"
    )
