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
    aggregate, fully JVM-side.  The cast copies are let-bound (text.let)
    so each side's double-cast array materializes once per row instead of
    once for the norm and again for the dot."""
    from airbyte_custom_spark.functions.text import let

    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return let(
        F.transform(ca, lambda x: x.cast("double")),
        lambda va: let(
            F.transform(cb, lambda x: x.cast("double")),
            lambda vb: let(
                _norm(va) * _norm(vb),
                lambda den: F.when(den > 0, _dot(va, vb) / den).otherwise(
                    F.lit(0.0)
                ),
            ),
        ),
    )


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
    from airbyte_custom_spark.functions.text import let

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = F.lit(_hyperplanes(dim, n_planes, seed)).cast("array<array<double>>")
    powers = F.lit([1 << i for i in range(n_planes)])

    # bit i = sign(v · planes[i]); packed = Σ 2^i over nonnegative dots.
    # The cast vector is let-bound: captured as a subtree, the per-plane
    # lambda would re-materialize it n_planes times per row (text.let).
    return let(
        F.transform(v, lambda x: x.cast("double")),
        lambda vv: F.aggregate(
            F.zip_with(
                planes,
                powers,
                lambda p, pw: F.when(_dot(vv, p) >= 0, pw).otherwise(
                    F.lit(0).cast("long")
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
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
# IVF (inverted-file) approximate nearest neighbor
# ---------------------------------------------------------------------------


def ivf_random_centroids(dim: int, n_lists: int, seed: int = 42) -> list[list[float]]:
    """Seeded random unit-norm centroids — the untrained coarse quantizer.
    Data-independent (like the LSH hyperplanes), so an external oracle can
    inline the identical constants; recall is below a trained quantizer's
    but the IVF mechanics (assignment, probing, re-rank) are identical."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_lists, dim))
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return c.tolist()


def ivf_centroids(
    df: DataFrame,
    dim: int,
    n_lists: int = 16,
    sample: int = 2048,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Trained coarse-quantizer centroids: deterministic spherical k-means
    (Lloyd's on L2-normalized vectors) over a bounded driver-side sample
    (ordered by id — stable across runs).  The IVF split at 100 TB: a tiny
    global model trained once on the driver, assignment fully distributed
    as JVM expressions — the corpus itself never funnels anywhere."""
    rows = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(sample)
        .collect()
    )
    x = np.asarray([r["_v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents.tolist()


def ivf_assign(
    vec_col: Column | str, centroids: list[list[float]], rank: int = 1
) -> Column:
    """List id of the ``rank``-th nearest centroid by dot product
    (centroids are unit-norm, so argmax dot ≡ argmax cosine).  Pure JVM
    expressions over ONE inlined nested-array literal (the
    ``lsh_signature`` plan-size discipline); ordering is (dot DESC,
    list id ASC) — the tie rule the DuckDB oracle replicates."""
    from airbyte_custom_spark.functions.text import let

    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    cents = F.lit(centroids).cast("array<array<double>>")
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))

    def body(vv: Column) -> Column:
        # vv let-bound: the per-centroid dot lambda would otherwise
        # re-cast the vector once per centroid (text.let)
        scored = F.zip_with(
            cents, idx, lambda c, i: F.struct(_dot(vv, c).alias("s"), i.alias("i"))
        )
        ordered = F.array_sort(
            scored,
            lambda a, b: F.when(a["s"] > b["s"], F.lit(-1))
            .when(a["s"] < b["s"], F.lit(1))
            .otherwise(F.signum(a["i"] - b["i"]).cast("int")),
        )
        return ordered[rank - 1]["i"]

    return let(F.transform(v, lambda x: x.cast("double")), body)


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """IVF-flat approximate top-k: each data vector lives in the inverted
    list of its nearest centroid; a query probes its ``nprobe`` nearest
    lists and exact-cosine re-ranks only those lists' members.

    Scale shape: the corpus is tagged with ONE list id map-side (no
    shuffle); the broadcast query side carries nprobe probe rows per
    query; candidate volume shrinks to ~nprobe/n_lists of the corpus.
    Cosine is computed map-side right after the broadcast join, so (as in
    ``lsh_bucket_topk``) no vector ever crosses an exchange — the only
    shuffle carries (query_id, id, cosine) scalars."""
    if centroids is None:
        centroids = ivf_centroids(
            data, dim, n_lists=n_lists, id_col=id_col, vec_col=vec_col, seed=seed
        )
    tagged = data.select(
        F.col(id_col),
        F.col(vec_col),
        ivf_assign(vec_col, centroids).alias("list_id"),
    )
    probes = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        F.explode(
            F.array(
                *[
                    ivf_assign(query_vec_col, centroids, rank=r)
                    for r in range(1, min(nprobe, len(centroids)) + 1)
                ]
            )
        ).alias("list_id"),
    )
    cand = (
        tagged.join(F.broadcast(probes), "list_id")
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
