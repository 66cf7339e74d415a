"""Embedding similarity search: exact cosine, brute-force top-k, LSH ANN."""

import os

import pytest
from pyspark.sql import functions as F

from airbyte_custom_spark.functions.embeddings import (
    brute_force_topk,
    cosine_similarity,
    embedding_near_dups,
    ivf_centroids,
    ivf_random_centroids,
    ivf_topk,
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


def test_ivf_trained_recall_and_self_match(spark, emb):
    """IVF with TRAINED centroids (deterministic spherical k-means on a
    bounded driver sample): every query's self-vector is recalled (it
    lives in the probed nearest list by construction), and recall vs the
    exact brute force is reasonable at nprobe=4/16."""
    dim = _dim(emb)
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = brute_force_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, dim=dim, k=5, n_lists=16, nprobe=4)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    for r in queries.collect():
        assert (r["query_id"], r["query_id"]) in a  # self always recalled
    assert len(e & a) / len(e) >= 0.5, f"IVF recall too low: {len(e & a) / len(e)}"


def test_ivf_centroids_deterministic(spark, emb):
    dim = _dim(emb)
    c1 = ivf_centroids(emb, dim, n_lists=8, sample=256)
    c2 = ivf_centroids(emb, dim, n_lists=8, sample=256)
    assert c1 == c2


def test_ivf_no_vector_crosses_exchange(spark, emb):
    """Same payload discipline as lsh_bucket_topk: the corpus is tagged
    map-side, cosine computed before the (query_id, id) dedup — no
    embedding array in any hash-partition exchange."""
    from airbyte_custom_spark.plans.inspect import explain_str

    dim = _dim(emb)
    queries = emb.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = ivf_random_centroids(dim, 8)
    plan = explain_str(ivf_topk(emb, queries, dim=dim, k=3, centroids=cents))
    for block in plan.split("\n\n"):
        first = block.lstrip().splitlines()[0] if block.strip() else ""
        if "Exchange hashpartitioning" in first:
            assert "embedding#" not in block and "query_vec#" not in block, block
