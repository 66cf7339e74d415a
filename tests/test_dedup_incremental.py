"""Incremental MinHash+LSH via the persisted band index.

The contract under test: for any split of a corpus into batches, indexing
earlier batches and running ``pairs_against`` on the latest batch yields
exactly the one-shot ``minhash_lsh_candidates`` pairs that TOUCH the new
batch — same pairs, same exact-Jaccard values — and folding the per-batch
outputs over every batch reconstructs the full one-shot answer.
"""

import os

import pytest
from pyspark.sql import functions as F

from airbyte_custom_spark.functions.dedup import (
    MinHashLshIndex,
    minhash_lsh_candidates,
)

THRESH = 0.5


@pytest.fixture(scope="module")
def corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs across the "
        "wide green field towards the old wooden barn near the river bank"
    )
    rows = [
        (1, base),
        (2, base),                                   # exact dup of 1
        (3, base.replace("lazy", "sleepy")),          # near dup of 1
        (4, "completely different text about spark shuffles and partitions "
            "with adaptive execution and broadcast joins in the optimizer"),
        (5, base.replace("river", "creek")),          # near dup of 1
        (6, "short text"),
        (7, base.replace("quick", "swift").replace("lazy", "idle")),
        (8, "another unrelated document describing parquet footers and "
            "column statistics for predicate pushdown at scan time"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df) -> set:
    return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}


def test_incremental_matches_one_shot_touching_new(spark, corpus, tmp_path):
    old = corpus.filter(F.col("doc_id") <= 4)
    new = corpus.filter(F.col("doc_id") > 4)
    idx = MinHashLshIndex.create(spark, str(tmp_path / "idx"))
    idx.add(old)
    got = _pairs(idx.pairs_against(new, corpus_df=old, jaccard_threshold=THRESH))

    full = _pairs(minhash_lsh_candidates(corpus, jaccard_threshold=THRESH))
    want = {p for p in full if p[0] > 4 or p[1] > 4}
    assert got == want and len(want) > 0


def test_folding_batches_reconstructs_full_answer(spark, corpus, tmp_path):
    b1 = corpus.filter(F.col("doc_id") <= 3)
    b2 = corpus.filter((F.col("doc_id") > 3) & (F.col("doc_id") <= 6))
    b3 = corpus.filter(F.col("doc_id") > 6)
    idx = MinHashLshIndex.create(spark, str(tmp_path / "idx"))

    # batch 1: nothing indexed yet — new×new only (index dir absent)
    out = _pairs(idx.pairs_against(b1, corpus_df=b1.limit(0), jaccard_threshold=THRESH))
    idx.add(b1)
    out |= _pairs(idx.pairs_against(b2, corpus_df=b1, jaccard_threshold=THRESH))
    idx.add(b2)
    seen = corpus.filter(F.col("doc_id") <= 6)
    out |= _pairs(idx.pairs_against(b3, corpus_df=seen, jaccard_threshold=THRESH))

    assert out == _pairs(minhash_lsh_candidates(corpus, jaccard_threshold=THRESH))


def test_meta_roundtrip_pins_parameters(spark, corpus, tmp_path):
    p = str(tmp_path / "idx")
    MinHashLshIndex.create(
        spark, p, num_hashes=32, bands=8, shingle_k=2, seed=7
    )
    idx = MinHashLshIndex.open(spark, p)
    assert (idx.num_hashes, idx.bands, idx.shingle_k, idx.seed) == (32, 8, 2, 7)


def test_create_rejects_indivisible_bands(spark, tmp_path):
    with pytest.raises(ValueError):
        MinHashLshIndex.create(spark, str(tmp_path / "bad"), num_hashes=10, bands=3)


def test_index_stores_only_scalars(spark, corpus, tmp_path):
    """The persisted relation is (id, band, bh) — no text, shingles, or
    signature arrays ever land on disk (the 100-TB index-size contract)."""
    idx = MinHashLshIndex.create(spark, str(tmp_path / "idx"))
    idx.add(corpus)
    stored = spark.read.parquet(os.path.join(str(tmp_path / "idx"), "bands"))
    assert set(stored.columns) == {"_id", "band", "bh"}
    assert all(not t.startswith("array") for _, t in stored.dtypes)
    # bands rows per doc with non-empty shingles
    assert stored.count() == corpus.count() * idx.bands


def test_overlap_new_and_corpus_verifies_from_new_side(spark, corpus, tmp_path):
    """A doc present in both new_df and corpus_df (replay overlap) must not
    fan out duplicate pairs."""
    idx = MinHashLshIndex.create(spark, str(tmp_path / "idx"))
    old = corpus.filter(F.col("doc_id") <= 4)
    idx.add(old)
    new = corpus.filter(F.col("doc_id") >= 3)  # 3,4 overlap the index
    got = idx.pairs_against(new, corpus_df=old, jaccard_threshold=THRESH)
    assert got.count() == got.dropDuplicates(["id_a", "id_b"]).count()
