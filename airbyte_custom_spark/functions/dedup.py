"""Document deduplication at scale: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

Scale design (the point of each algorithm):
  * exact       — one map (hash) + one shuffle (groupBy hash).  Never ships
                  document text through the shuffle, only (hash, id).
  * MinHash+LSH — signatures are pure map-side JVM array math (one xxhash64
                  per shingle, then H affine rehashes); candidate generation
                  is a groupBy on (band_idx, band_hash) — only colliding
                  docs ever meet, so the shuffle is O(docs × bands), not
                  O(docs²).  Verification re-checks true Jaccard on the
                  candidate pairs only.
  * SimHash     — 64-bit bit-vote signature via one Arrow-batched pandas UDF
                  over JVM-precomputed token hashes; near-dups via banded
                  hamming join (4×16-bit bands finds all pairs with
                  hamming ≤ 3 by pigeonhole).
  * n-gram Jaccard — exact pairwise similarity, candidates from a shared-
                  shingle self-join (inverted index); frequency-capped to
                  avoid hot-shingle pair explosions (a shingle shared by
                  100k docs would otherwise emit 10^10 pairs).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from airbyte_custom_spark.functions.text import tokens, word_shingles

# 2^31-1: universal-hash prime small enough that a*h+b (a,h,b < 2^31)
# stays inside a 64-bit long — no ANSI overflow
_MERSENNE = (1 << 31) - 1


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", normalize: bool = True
) -> DataFrame:
    """Groups of byte-identical (optionally whitespace/case-normalized)
    documents: (doc_id, canonical_id) with canonical = min id per group.
    Only (hash, id) pairs shuffle."""
    c = F.col(text_col)
    if normalize:
        c = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    h = F.sha2(c, 256).alias("_h")
    ids = df.select(F.col(id_col), h)
    canon = ids.groupBy("_h").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        ids.join(canon, "_h")
        .filter(F.col("group_size") > 1)
        .select(id_col, "canonical_id", "group_size")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _affine_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


def minhash_signature(
    text_col: Column | str, num_hashes: int = 64, shingle_k: int = 3, seed: int = 42
) -> Column:
    """Array<long> MinHash signature.  One xxhash64 per shingle, then
    ``num_hashes`` affine rehashes (a*h+b mod p) of that single hash —
    standard universal-hashing MinHash, all JVM expression math."""
    base = F.transform(
        word_shingles(text_col, shingle_k), lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE))
    )
    def rehash(a: int, b: int):
        # factory: a 1-arg lambda per (a, b) — defaults in the lambda would
        # capture pyspark's implicit index argument instead
        return lambda h: F.pmod(a * h + b, F.lit(_MERSENNE))

    sig = [
        F.array_min(F.transform(base, rehash(a, b)))
        for a, b in _affine_params(num_hashes, seed)
    ]
    return F.array(*sig)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard ≥ threshold).

    shingle → minhash → band → bucket-join → verify: candidates come from
    same-(band, hash) buckets; true Jaccard is then verified on candidates
    only (LSH gives no false positives through to the output)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature(text_col, num_hashes, shingle_k, seed)
    with_sig = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(text_col, shingle_k).alias("_sh"),
        sig.alias("_sig"),
    ).filter(F.size("_sh") > 0)

    banded = with_sig.select(
        "_id",
        "_sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",", F.transform(
                                F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            )
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("bk"),
    ).select("_id", "_sh", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("sh_a"),
            F.col("b._sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted-index candidates)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share ≥1 shingle.

    ``max_shingle_freq`` drops shingles present in more than that many docs
    from candidate GENERATION (not from the jaccard itself) — the classic
    inverted-index frequency cap that keeps the self-join from exploding on
    boilerplate shingles.  With the cap, candidate volume is
    Σ_shingle min(freq, cap)² instead of Σ freq²."""
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(text_col, shingle_k).alias("_sh")
    ).filter(F.size("_sh") > 0)
    sh = sh.withColumn("_n", F.size("_sh"))

    inv = sh.select("_id", "_n", F.explode("_sh").alias("s"))
    freq = inv.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    inv = inv.join(freq.filter(F.col("df") <= max_shingle_freq), "s")

    a = inv.alias("a")
    b = inv.alias("b")
    shared = (
        a.join(b, "s")
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("n_a"),
            F.col("b._n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.round(
        F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6
    )
    return (
        shared.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_RET = T.LongType()


@F.pandas_udf(_SIMHASH_RET)
def _simhash_from_hashes(hs: pd.Series) -> pd.Series:
    """token-hash arrays → 64-bit simhash (bit vote).  Arrow-batched; the
    per-row work is numpy bit unpacking, no Python per token."""
    out = np.empty(len(hs), dtype=np.int64)
    for i, arr in enumerate(hs):
        if arr is None or len(arr) == 0:
            out[i] = 0
            continue
        a = np.asarray(arr, dtype=np.int64).view(np.uint64)
        bits = ((a[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(a)
        word = np.uint64(0)
        for bit_idx in np.nonzero(votes > 0)[0]:
            word |= np.uint64(1) << np.uint64(bit_idx)
        out[i] = word.astype(np.int64) if hasattr(word, "astype") else np.int64(word)
    return pd.Series(out)


def simhash64(text_col: Column | str) -> Column:
    """64-bit SimHash: token hashes computed JVM-side (xxhash64), bit vote
    in one vectorized pandas UDF."""
    th = F.transform(tokens(text_col), lambda t: F.xxhash64(F.lower(t)))
    return _simhash_from_hashes(th)


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via 4×16-bit banding:
    any pair with ≤3 differing bits agrees on ≥1 of 4 bands (pigeonhole),
    so the bucket join finds all of them without an O(n²) compare."""
    s = df.select(F.col(id_col).alias("_id"), simhash64(text_col).alias("_sim"))
    banded = s.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("_sim"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bh"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_sim", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a._sim").bitwiseXOR(F.col("b._sim")))
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
