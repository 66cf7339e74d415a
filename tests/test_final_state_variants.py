"""The driver's correctness harness checks the first 50 registry entries;
queries rotated to slots 51+ whose RESULT is the shared final-state table
are covered transitively: this test asserts each is value-identical to
`cdc_final_state` (which stays inside the checked window), so a driver
pass on the canonical query certifies the variants too.  Each variant
exercises a DIFFERENT write path (incremental batches, merge-on-read,
bucket evolution, replica sync, stream tail, raw-retype) into the same
semantic state — equality here is the read-equivalence claim those paths
make."""

import pytest

import __spark_entry__ as entry


CANONICAL = "cdc_final_state"
# variants whose rows must equal the canonical final state, column names
# included (schema_rename maps tool -> tool_name by design, checked apart)
SAME_TABLE = [
    "cdc_final_state_incremental",
    "json_cdc_final_state",
    "json_raw_retype_final_state",
    "mor_final_state",
    "rebucket_final_state",
    "replica_sync_final_state",
    "cdc_stream_tail_final_state",
]


@pytest.fixture(scope="module")
def canonical(spark, sf_dir):
    df = entry.queries()[CANONICAL](spark, sf_dir)
    return sorted(df.columns), sorted(df.collect())


@pytest.mark.parametrize("name", SAME_TABLE)
def test_variant_equals_canonical_final_state(spark, sf_dir, name, canonical):
    cols, rows = canonical
    df = entry.queries()[name](spark, sf_dir)
    assert sorted(df.columns) == cols
    got = sorted(df.collect())
    assert len(got) == len(rows)
    assert got == rows


def test_schema_rename_is_canonical_modulo_rename(spark, sf_dir, canonical):
    cols, rows = canonical
    df = entry.queries()["schema_rename_final_state"](spark, sf_dir)
    renamed = df.withColumnRenamed("tool_name", "tool")
    assert sorted(renamed.columns) == cols
    assert sorted(renamed.collect()) == rows
