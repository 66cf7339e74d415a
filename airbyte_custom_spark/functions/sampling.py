"""Deterministic stratified sampling for training-mix construction.

Training-data pipelines rebalance a corpus by stratum (language, source,
quality bucket): downsample the dominant strata, keep the rare ones
whole.  At 100 TB the keep decision must be a pure map-side filter — no
shuffle, no RNG state, no driver round-trip — and reproducible across
reruns, partitionings, AND engines, so the sample itself can be
oracle-checked row for row.

The decision is a hash threshold: a row is kept iff the first 8 hex
characters of ``md5(id)`` sort below the stratum's threshold string.
md5 hex is lowercase in Spark, DuckDB, and ANSI SQL alike, so the
lexicographic compare equals the numeric compare on the top 32 bits of
the digest and the EXACT same rows are kept everywhere — the oracle is a
plain ``WHERE`` clause.  Each stratum's expected keep fraction is
``rate`` with variance that of a Bernoulli(rate) per row (md5's top bits
are uniform); unlike ``DataFrame.sample`` the result is a pure function
of the data, immune to partition count, task retries, and Spark version.

Reference analog: the record-filter stage of the declarative source
framework (reference: airbyte-cdk/python/airbyte_cdk/sources/declarative/
extractors/record_filter.py:13 — a per-record predicate), re-expressed as
a stratum-weighted deterministic sampler.

Scale shape: zero exchanges — codegen'd md5 + substring + CASE compare
per row; the filter pushes to the scan like any other predicate and
composes with partition/bucket pruning upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hex_threshold",
    "keep_fraction",
    "keep_predicate",
    "stratified_sample",
]

_HEX_SPACE = 16 ** 8  # the compare reads the digest's top 8 hex chars


def hex_threshold(rate: float) -> str:
    """The 8-hex-char threshold under which ``rate`` of uniform digests
    sort.  ``rate >= 1`` returns ``'zzzzzzzz'`` (every hex string sorts
    below it — keep all); ``rate <= 0`` returns ``'00000000'`` (no hex
    string sorts below it — keep none)."""
    if rate >= 1.0:
        return "zzzzzzzz"
    if rate <= 0.0:
        return "00000000"
    return format(int(rate * _HEX_SPACE), "08x")


def keep_fraction(id_col: Column | str, rate: float) -> Column:
    """Single-rate keep column (the no-strata case): md5-prefix of the id
    under ``hex_threshold(rate)``.  The deterministic replacement for
    ``DataFrame.sample(rate)`` wherever the KEPT SET itself must be
    reproducible — across reruns, partitionings, and incremental-refresh
    batches (a conversation sampled into a corpus stays in it on every
    later refresh, because the decision depends only on its id)."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    digest = F.substring(F.md5(idc.cast("string")), 1, 8)
    return digest < F.lit(hex_threshold(rate))


def keep_predicate(
    id_col: Column | str,
    stratum_col: Column | str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> Column:
    """Boolean keep column: md5-prefix of the id under the stratum's
    threshold.  Pure row-local JVM expression (md5 + substring + chained
    CASE + string compare) — usable as a filter or as a flag column."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    sc = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
    thr = F.lit(hex_threshold(default_rate))
    # deterministic CASE order: sorted strata, so the plan (and any
    # plan-hash caching) is stable across dict orderings
    for key in sorted(rates, reverse=True):
        thr = F.when(sc == F.lit(key), F.lit(hex_threshold(rates[key]))) \
               .otherwise(thr)
    digest = F.substring(F.md5(idc.cast("string")), 1, 8)
    return digest < thr


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep each row of ``df`` with its stratum's probability, decided by
    the deterministic hash threshold above.  Returns the filtered frame
    unchanged otherwise (all columns pass through)."""
    return df.filter(
        keep_predicate(id_col, stratum_col, rates, default_rate)
    )
