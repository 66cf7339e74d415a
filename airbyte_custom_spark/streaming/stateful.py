"""Custom stateful streaming operator: per-conversation sequence
monitoring via ``applyInPandasWithState``.

The reference's CDC plumbing tracks per-entity arrival health — Debezium's
ordering expectations and heartbeat liveness
(`DebeziumRecordIterator.java:112-141`, heartbeat handling
`DebeziumRecordIterator.java:63-95`) — as imperative per-key state inside
the read loop.  Spark-first, the sanctioned shape for custom per-key
streaming state is ``groupBy(key).applyInPandasWithState`` with an
explicit state schema, update-mode emission, and (optionally) a
processing-time timeout that EVICTS idle keys — which is what bounds the
state store at 100 TB: state size tracks LIVE conversations, not all-time
ones.  (On a cluster, pair with the RocksDB state store provider —
``spark.sql.streaming.stateStore.providerClass`` — so per-key state spills
off-heap; the operator itself is provider-agnostic.)

Semantics (deterministic, LAG-expressible — hence DuckDB-oracle-checked by
the driver contract): events fold per ``conv_id`` in ``lsn`` order; for
each event after the first, a GAP is counted when
``turn_idx > previous turn_idx + 1`` (a turn went missing from the arrival
sequence) and a REGRESSION when ``turn_idx < previous turn_idx``
(out-of-order replay / rewrite).  State carries
(events, max_lsn, last_turn, gaps, regressions, deletes) across
micro-batches, so the incremental fold over any batch split equals one
pass over the full stream in lsn order (pytest asserts 1-batch ≡ N-batch).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("events", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("last_turn", T.IntegerType()),
        T.StructField("gaps", T.LongType()),
        T.StructField("regressions", T.LongType()),
        T.StructField("deletes", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("events", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("last_turn", T.IntegerType()),
        T.StructField("gaps", T.LongType()),
        T.StructField("regressions", T.LongType()),
        T.StructField("deletes", T.LongType()),
        T.StructField("expired", T.BooleanType()),
    ]
)

_OUT_COLS = [f.name for f in OUTPUT_SCHEMA.fields]


def sequence_monitor(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming input → one updated monitor row per conversation per
    micro-batch (update mode).  With ``idle_timeout_ms``, a conversation
    with no events for that long emits a final ``expired=true`` row and
    its state is evicted.

    Batch input → the same fold as one LAG-window pass (used by tests and
    the driver-contract oracle to cross-check the incremental fold)."""
    if not events.isStreaming:
        return _batch_fold(events)
    timeout = "ProcessingTimeTimeout" if idle_timeout_ms else "NoTimeout"

    def fn(key: tuple, pdfs: Iterator, state) -> Iterator:
        import pandas as pd

        (conv_id,) = key
        if state.hasTimedOut:
            ev, mx, lt, gp, rg, dl = state.get
            state.remove()
            yield pd.DataFrame(
                [(conv_id, ev, mx, lt, gp, rg, dl, True)], columns=_OUT_COLS
            )
            return
        ev, mx, lt, gp, rg, dl = (
            state.get if state.exists else (0, None, None, 0, 0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("lsn")
        for turn, lsn, op in zip(rows["turn_idx"], rows["lsn"], rows["op"]):
            # prev-ROW comparison (exactly LAG semantics, so the SQL
            # oracle replicates the fold bit-for-bit): a NULL turn on
            # either side of the pair skips the gap/regression checks but
            # still advances the "previous turn"
            turn = int(turn) if pd.notna(turn) else None
            ev += 1
            mx = int(lsn) if mx is None else max(mx, int(lsn))
            if op == "d":
                dl += 1
            if turn is not None and lt is not None:
                if turn > lt + 1:
                    gp += 1
                elif turn < lt:
                    rg += 1
            lt = turn
        state.update((ev, mx, lt, gp, rg, dl))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [(conv_id, ev, mx, lt, gp, rg, dl, False)], columns=_OUT_COLS
        )

    return events.groupBy("conv_id").applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
    )


def _batch_fold(events: DataFrame) -> DataFrame:
    """One-pass equivalent of the incremental fold: LAG window +
    conditional sums — pure JVM, one shuffle on conv_id."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("conv_id").orderBy("lsn")
    lagged = events.withColumn("_pt", F.lag("turn_idx").over(w))
    zero = F.lit(0).cast("long")
    return lagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("events"),
        F.max("lsn").alias("max_lsn"),
        # lsn is a total order per stream → no max_by tie to break
        F.max_by("turn_idx", "lsn").alias("last_turn"),
        F.coalesce(
            F.sum((F.col("turn_idx") > F.col("_pt") + 1).cast("long")), zero
        ).alias("gaps"),
        F.coalesce(
            F.sum((F.col("turn_idx") < F.col("_pt")).cast("long")), zero
        ).alias("regressions"),
        F.coalesce(F.sum((F.col("op") == "d").cast("long")), zero).alias(
            "deletes"
        ),
        F.lit(False).alias("expired"),
    )
