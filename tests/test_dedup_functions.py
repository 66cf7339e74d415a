"""Near-dup detection: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

import os

import pytest
from pyspark.sql import functions as F

from airbyte_custom_spark.functions.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash48,
    simhash_near_dups,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs across the wide "
        "green field towards the old wooden barn near the river bank"
    )
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("lazy", "sleepy")),  # near dup of 1
        (4, "completely different text about spark shuffles and partitions "
            "with adaptive execution and broadcast joins in the optimizer"),
        (5, base.upper()),  # case-normalized exact dup of 1
        (6, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, corpus):
    got = exact_duplicates(corpus).collect()
    groups = {(r["doc_id"], r["canonical_id"]) for r in got}
    assert (1, 1) in groups and (2, 1) in groups and (5, 1) in groups
    assert all(r["doc_id"] not in (3, 4, 6) for r in got)


def test_minhash_finds_exact_and_near(spark, corpus):
    pairs = minhash_lsh_candidates(corpus, jaccard_threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got        # exact dup always found
    assert (1, 3) in got or (2, 3) in got  # near dup (1-word change)
    assert all(4 not in p and 6 not in p for p in got)


def test_minhash_jaccard_is_exact_on_candidates(spark, corpus):
    pairs = minhash_lsh_candidates(corpus, jaccard_threshold=0.0).collect()
    for r in pairs:
        if (r["id_a"], r["id_b"]) == (1, 2):
            assert r["jaccard"] == 1.0


def test_minhash_banded_exchange_carries_no_arrays(spark, corpus):
    """The ×bands explode and the band self-join must shuffle only
    (id, band, band_hash) — the shingle arrays join back by id AFTER pair
    dedup (round-2 scale fix; at 100 TB the replicated shingle sets would
    otherwise dominate the shuffle)."""
    from airbyte_custom_spark.plans.inspect import explain_str

    plan = explain_str(minhash_lsh_candidates(corpus, jaccard_threshold=0.5))
    for block in plan.split("\n\n"):
        first = block.lstrip().splitlines()[0] if block.strip() else ""
        if "Exchange" not in first:
            continue
        if "hashpartitioning(band" in block:
            assert "_sh" not in block, block


def test_ngram_jaccard_pairs(spark, corpus):
    pairs = ngram_jaccard_pairs(corpus, threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and got[(1, 3)] < 1.0
    assert all(4 not in (a, b) for (a, b) in got)


def test_ngram_frequency_cap_drops_hot_shingles(spark):
    # every doc shares the hot boilerplate; cap=2 kills those candidates
    rows = [(i, "common boilerplate header text " + f"unique body {i} {i*7}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df, threshold=0.01, max_shingle_freq=100).count()
    capped = ngram_jaccard_pairs(df, threshold=0.01, max_shingle_freq=2).count()
    assert capped < uncapped


def test_simhash_properties(spark, corpus):
    s = corpus.select("doc_id", simhash48("text").alias("sh")).collect()
    by_id = {r["doc_id"]: r["sh"] for r in s}
    assert by_id[1] == by_id[2]  # identical text → identical simhash
    ham13 = bin((by_id[1] ^ by_id[3]) & ((1 << 64) - 1)).count("1")
    ham14 = bin((by_id[1] ^ by_id[4]) & ((1 << 64) - 1)).count("1")
    assert ham13 < ham14  # near dup closer than unrelated


def test_simhash_near_dups(spark, corpus):
    got = {(r["id_a"], r["id_b"]) for r in simhash_near_dups(corpus, max_hamming=3).collect()}
    assert (1, 2) in got
    assert all(4 not in p for p in got)


def test_dedup_on_documents_table(spark, sf_dir):
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # injected exact duplicates must be found by every method
    dup = d.limit(5).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = d.unionByName(dup)
    exact = exact_duplicates(both)
    assert exact.count() >= 10  # 5 pairs → 10 member rows
    mh = minhash_lsh_candidates(both, jaccard_threshold=0.95)
    found = {(r["id_a"], r["id_b"]) for r in mh.collect()}
    for r in dup.select("doc_id").collect():
        assert (r["doc_id"] - 1_000_000, r["doc_id"]) in found


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def _cc(spark, pairs, **kw):
    from airbyte_custom_spark.functions.dedup import connected_components

    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        (r["id"], r["component"]) for r in connected_components(edges, **kw).collect()
    }


def test_components_star_and_disjoint(spark):
    # star {1,2,3,4} + pair {10,11}; node 99 untouched by any pair is absent
    got = _cc(spark, [(1, 2), (1, 3), (1, 4), (10, 11)])
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_components_path_needs_multiple_rounds(spark):
    # a 16-node path is the adversarial case for naive one-hop propagation;
    # pointer jumping must converge well inside the iteration cap
    path = [(i, i + 1) for i in range(16)]
    got = _cc(spark, path)
    assert got == {(i, 0) for i in range(17)}


def test_components_min_id_not_first_seen(spark):
    # min id arrives "late" in edge order; label must still be the min
    got = _cc(spark, [(7, 9), (9, 3), (3, 5)])
    assert got == {(3, 3), (5, 3), (7, 3), (9, 3)}


def test_components_nonconvergence_raises(spark):
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        _cc(spark, [(i, i + 1) for i in range(40)], max_iter=1)
