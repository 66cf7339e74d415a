"""Deterministic stratified sampling (functions/sampling.py): the keep
rule recomputed independently with hashlib must select the exact same
rows; thresholds are monotone (nested samples); the plan is a pure
map-side filter with zero exchanges and no Python."""

import hashlib

from airbyte_custom_spark.functions.sampling import (
    hex_threshold,
    stratified_sample,
)
from airbyte_custom_spark.plans.inspect import exchange_count, explain_str


def _kept_ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def _expect_keep(doc_id: int, rate: float) -> bool:
    # independent reimplementation of the rule: top-8 hex of md5(str(id))
    # compared numerically against floor(rate * 16^8)
    if rate >= 1.0:
        return True
    if rate <= 0.0:
        return False
    prefix = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
    return int(prefix, 16) < int(rate * 16 ** 8)


def test_hex_threshold_edges():
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(-1.0) == "00000000"
    assert hex_threshold(1.0) == "zzzzzzzz"
    assert hex_threshold(2.0) == "zzzzzzzz"
    assert hex_threshold(0.25) == "40000000"
    assert hex_threshold(0.5) == "80000000"


def test_sample_matches_independent_hash(spark):
    rows = [(i, "en" if i % 3 == 0 else "de") for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    rates = {"en": 0.3, "de": 0.7}
    kept = _kept_ids(stratified_sample(df, "lang", "doc_id", rates))
    expected = {
        i for i, lang in rows if _expect_keep(i, rates[lang])
    }
    assert kept == expected
    assert 0 < len(kept) < 500


def test_default_rate_keeps_unlisted_strata_whole(spark):
    rows = [(i, "zh") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = _kept_ids(stratified_sample(df, "lang", "doc_id", {"en": 0.1}))
    assert len(kept) == 100  # zh not in rates -> default 1.0


def test_rate_zero_keeps_nothing(spark):
    rows = [(i, "en") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    assert _kept_ids(stratified_sample(df, "lang", "doc_id", {"en": 0.0})) == set()


def test_samples_nest_as_rate_grows(spark):
    """threshold(r1) <= threshold(r2) for r1 <= r2, so the r1 sample is a
    SUBSET of the r2 sample — growing a stratum's budget only adds rows,
    it never swaps the sample (the property that makes re-mixes cheap)."""
    rows = [(i, "en") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    small = _kept_ids(stratified_sample(df, "lang", "doc_id", {"en": 0.2}))
    big = _kept_ids(stratified_sample(df, "lang", "doc_id", {"en": 0.6}))
    assert small <= big
    assert len(small) < len(big)


def test_rate_is_approximately_respected(spark):
    rows = [(i, "en") for i in range(20_000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = stratified_sample(df, "lang", "doc_id", {"en": 0.25}).count()
    assert abs(kept / 20_000 - 0.25) < 0.02  # md5 top bits are uniform


def test_plan_is_map_side_filter(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = stratified_sample(docs, "lang", "doc_id", {"en": 0.25}).select(
        "doc_id", "lang", "source"
    )
    plan = explain_str(out, "simple")
    assert exchange_count(out) == 0, plan
    assert "EvalPython" not in plan, plan
    # column pruning reaches the scan: only the 3 projected columns (the
    # predicate needs no others) — a scan reading `text` for a 3-column
    # sample would drag the corpus payload through the filter
    formatted = explain_str(out, "formatted")
    read = [l for l in formatted.splitlines() if "ReadSchema" in l]
    assert read and "text" not in read[0], read


def test_partitioning_does_not_change_the_sample(spark):
    rows = [(i, "en" if i % 2 else "fr") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    rates = {"en": 0.4, "fr": 0.6}
    one = _kept_ids(stratified_sample(df.coalesce(1), "lang", "doc_id", rates))
    many = _kept_ids(
        stratified_sample(df.repartition(16), "lang", "doc_id", rates)
    )
    assert one == many
