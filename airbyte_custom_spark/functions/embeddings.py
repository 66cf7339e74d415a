"""Embedding similarity search: exact cosine, brute-force top-k, and an
LSH-bucketed approximate path.

Scale design:
  * ``cosine_similarity`` is pure JVM array math (zip_with + aggregate) —
    no Python, no UDF.
  * ``brute_force_topk`` broadcasts the (small) query set; the data side
    never shuffles — one map + a per-query top-k aggregate.  This is the
    exact baseline for recall measurement.
  * ``lsh_bucket_topk`` uses random-hyperplane signatures (seeded, driver-
    generated, broadcast as literals): candidates only from matching
    buckets (multi-probe over b bands), turning 100 TB × Q into
    (bucket-collision volume) × Q.
  * ``embedding_near_dups`` finds dataset-internal near-duplicate vectors
    via the same banding, verified with exact cosine.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Exact cosine between two array<float|double> columns — zip_with +
    aggregate, fully JVM-side."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    ca = F.transform(ca, lambda x: x.cast("double"))
    cb = F.transform(cb, lambda x: x.cast("double"))
    denom = _norm(ca) * _norm(cb)
    return F.when(denom > 0, _dot(ca, cb) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query vector.  The query side is
    broadcast — the scan side stays put (no shuffle of the big table);
    ranking shuffles only (query, candidate) score rows."""
    joined = data.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(
    vec_col: Column | str, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Random-hyperplane sign bits packed into a long.  Hyperplanes are
    generated once on the driver (seeded) and inlined as ONE nested array
    literal — a single expression-tree node regardless of dim × n_planes
    (round-1 inlined dim × n_planes scalar literals, which bloats the plan
    to ~25k nodes at real embedding dims like 1536×16)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = F.transform(v, lambda x: x.cast("double"))
    planes = F.lit(_hyperplanes(dim, n_planes, seed)).cast("array<array<double>>")
    powers = F.lit([1 << i for i in range(n_planes)])
    # bit i = sign(v · planes[i]); packed = Σ 2^i over nonnegative dots
    return F.aggregate(
        F.zip_with(
            planes,
            powers,
            lambda p, pw: F.when(_dot(v, p) >= 0, pw).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def lsh_bucket_topk(
    data: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing ≥1 LSH band with the
    query (multi-probe), exact cosine re-rank on candidates only."""
    bits_per_band = n_planes // bands

    def banded(df: DataFrame, vc: str, keep: list[str]) -> DataFrame:
        sig = lsh_signature(vc, dim, n_planes, seed)
        return df.select(
            *keep,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            F.shiftrightunsigned(sig, i * bits_per_band)
                            .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                            .alias("bh"),
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("bk"),
        ).select(*keep, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    d = banded(data, vec_col, [id_col, vec_col])
    q = banded(queries, query_vec_col, [query_id_col, query_vec_col])
    # Cosine is computed MAP-SIDE, immediately after the broadcast join and
    # before the (query_id, id) dedup exchange — so the only shuffle in the
    # whole query carries three scalar columns, never a vector.  (Up to
    # `bands` redundant cosine evals per colliding pair, traded for zero
    # vector bytes through the exchange; the data side itself never
    # shuffles at all.)
    cand = (
        d.join(F.broadcast(q), ["band", "bh"])
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(
                cosine_similarity(F.col(vec_col), F.col(query_vec_col)), 6
            ).alias("cosine"),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cosine_threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Dataset-internal near-duplicate vectors (cosine ≥ threshold),
    candidates via banded hyperplane LSH self-join, verified exactly.

    Payload discipline (round-3 scale fix, mirroring
    ``minhash_lsh_candidates``): the ×bands explode and the banded
    self-join carry ONLY (id, band, band_hash) — at 1536-dim the vectors
    are ~12 KB/row and would otherwise ride the exchange ×bands×2.  The
    embedding column joins back by id onto the already-deduplicated pair
    list for the exact-cosine verification."""
    bits_per_band = n_planes // bands
    sig = lsh_signature(vec_col, dim, n_planes, seed)
    banded = (
        df.select(F.col(id_col).alias("_id"), sig.alias("_sig"))
        .select(
            "_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            F.shiftrightunsigned(F.col("_sig"), i * bits_per_band)
                            .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                            .alias("bh"),
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("bk"),
        )
        .select("_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = df.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    return (
        pairs.join(vecs.alias("va"), F.col("id_a") == F.col("va._vid"))
        .join(vecs.alias("vb"), F.col("id_b") == F.col("vb._vid"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("va._v"), F.col("vb._v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= cosine_threshold)
    )
