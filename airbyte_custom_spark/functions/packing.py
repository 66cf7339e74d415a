"""Context-window packing: chunk ordered sequences into token budgets.

The last step before a transcript corpus becomes training examples:
each conversation's turns, in stable turn order, are cut into context
windows of at most ``max_tokens`` (the model's sequence length).  The
assignment rule is cumulative-offset chunking — a turn belongs to the
window its starting token offset falls in::

    window_id = floor(tokens_before_this_turn / max_tokens)

so window boundaries land between turns wherever possible and the one
turn that straddles a boundary goes wholly to the window it starts in
(a window can exceed the budget by at most one turn — the standard
greedy-append rule; callers that must hard-cap instead split that turn
upstream).  The rule is a pure function of (key, order, token counts):
deterministic across partitionings and engines, so the packing itself is
oracle-checkable — the SQL twin is one cumulative-sum window function.

Scale shape: ONE exchange keyed on the sequence key (the same
conv_id-keyed shuffle every analytics operator here uses — on a
conv-bucketed table layout it collapses entirely), a window-function
cumulative sum inside each key, then an optional per-window aggregation.
No global sort, no Python.  State per key is O(1) in the window frame
(running sum), so hot conversations cost their row count, not memory.

Reference analog: the reference emits one record per turn and leaves
packing to downstream trainers; this operator is the Spark-side
equivalent of the size-budgeted batcher in its buffered consumer
(reference: base-java/.../buffered_stream_consumer/
BufferedStreamConsumer.java:38 — flush when the buffer exceeds its size
budget, re-expressed as token-budgeted sequence chunking).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["pack_context_windows"]


def pack_context_windows(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    token_col: Column | str,
    max_tokens: int,
    window_col: str = "window_id",
    stride: int | None = None,
) -> DataFrame:
    """Assign each row a ``window_col`` id by cumulative token offset
    within its key group (see module docstring for the rule).  Returns
    ``df`` with the id column added; all input columns pass through.

    ``stride`` (default ``max_tokens`` — non-overlapping) slides the
    window starts: window ``w`` covers token offsets
    ``[w*stride, w*stride + max_tokens)``, so with ``stride <
    max_tokens`` a turn starting at offset ``o`` lands in EVERY window
    whose span covers ``o`` — the overlapping-context rule pretraining
    pipelines use so no boundary-adjacent text is seen in only one
    truncated context.  Each row is then REPLICATED ≈``max_tokens /
    stride`` times via a map-side ``explode(sequence(lo, hi))`` — the
    fan-out happens after the one keyed exchange, never through it, and
    the replication factor is the caller's explicit overlap choice."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if stride is None:
        stride = max_tokens
    if not 0 < stride <= max_tokens:
        raise ValueError(
            f"stride must be in (0, max_tokens], got {stride}"
        )
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    before = Window.partitionBy(*key_cols).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum_before = F.coalesce(F.sum(tok).over(before), F.lit(0))
    if stride == max_tokens:
        return df.withColumn(
            window_col, F.floor(cum_before / F.lit(max_tokens)).cast("long")
        )
    # window w covers offsets [w*stride, w*stride + max_tokens); a row at
    # offset o belongs to w iff (o - max_tokens)/stride < w <= o/stride.
    # floor() on a DOUBLE quotient in both engines (not integer division,
    # whose negative-operand semantics differ across engines).  The
    # cumulative sum materializes in its own projection first — a
    # generator (explode) cannot host a window expression directly.
    off = "__pack_cum_before"
    staged = df.withColumn(off, cum_before)
    lo = F.greatest(
        F.lit(0).cast("long"),
        (
            F.floor(
                (F.col(off) - F.lit(max_tokens)).cast("double")
                / F.lit(stride)
            )
            + F.lit(1)
        ).cast("long"),
    )
    hi = F.floor(F.col(off).cast("double") / F.lit(stride)).cast("long")
    return staged.withColumn(window_col, F.explode(F.sequence(lo, hi))).drop(
        off
    )
