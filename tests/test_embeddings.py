"""Embedding similarity search: exact cosine, brute-force top-k, LSH ANN."""

import os

import pytest
from pyspark.sql import functions as F

from airbyte_custom_spark.functions.embeddings import (
    brute_force_topk,
    cosine_similarity,
    embedding_near_dups,
    lsh_bucket_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _dim(emb):
    return len(emb.select("embedding").first()[0])


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [-1.0, -1.0])],
        "a array<double>, b array<double>",
    )
    got = [r[0] for r in df.select(F.round(cosine_similarity("a", "b"), 6)).collect()]
    assert got == [1.0, 0.0, -1.0]


def test_brute_force_topk_self_is_nearest(spark, emb):
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = brute_force_topk(emb, queries, k=5)
    top1 = {r["query_id"]: r["vec_id"] for r in out.filter("rank = 1").collect()}
    for qid, vid in top1.items():
        assert qid == vid  # a vector's nearest neighbor is itself
    assert out.groupBy("query_id").count().filter("count != 5").count() == 0


def test_lsh_recall_vs_brute_force(spark, emb):
    dim = _dim(emb)
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = brute_force_topk(emb, queries, k=5)
    approx = lsh_bucket_topk(emb, queries, dim=dim, k=5, n_planes=16, bands=8)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # self-match always recalled (identical vector → identical signature)
    for r in queries.collect():
        assert (r["query_id"], r["query_id"]) in a


def test_embedding_near_dups_finds_planted_dup(spark, emb):
    dim = _dim(emb)
    planted = emb.limit(3).withColumn("vec_id", F.col("vec_id") + 1_000_000)
    both = emb.unionByName(planted)
    dups = embedding_near_dups(both, dim=dim, cosine_threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in dups.collect()}
    for r in planted.collect():
        assert (r["vec_id"] - 1_000_000, r["vec_id"]) in got


def test_near_dups_banded_exchange_carries_no_vectors(spark, emb):
    """The ×bands explode and banded self-join must shuffle only
    (id, band, band_hash); embeddings join back by id onto the deduped
    pair list (round-3 scale fix mirroring MinHash — at 1536-dim the
    vector is ~12 KB/row and would ride the exchange ×bands×2)."""
    from airbyte_custom_spark.plans.inspect import explain_str

    dim = _dim(emb)
    plan = explain_str(embedding_near_dups(emb, dim=dim, cosine_threshold=0.9))
    for block in plan.split("\n\n"):
        first = block.lstrip().splitlines()[0] if block.strip() else ""
        if "Exchange" not in first:
            continue
        if "hashpartitioning(band" in block:
            assert "_v#" not in block, block


def test_lsh_bucket_topk_no_vector_crosses_exchange(spark, emb):
    """lsh_bucket_topk's only shuffle is the (query_id, id) dedup +
    ranking — cosine is computed map-side right after the broadcast join,
    so no embedding array may appear in any shuffle exchange block and the
    data side itself never hash-repartitions."""
    from airbyte_custom_spark.plans.inspect import explain_str

    dim = _dim(emb)
    queries = emb.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = explain_str(lsh_bucket_topk(emb, queries, dim=dim, k=3))
    for block in plan.split("\n\n"):
        first = block.lstrip().splitlines()[0] if block.strip() else ""
        if "Exchange hashpartitioning" in first:
            assert "embedding#" not in block and "query_vec#" not in block, block
