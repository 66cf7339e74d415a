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

from pyspark.sql import Column, DataFrame, functions as F

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


def _shingled(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int
) -> DataFrame:
    """(_id, _sh) shingle-set frame — the shared front of every MinHash
    path (empty-shingle docs can never near-dup, so they are dropped)."""
    return df.select(
        F.col(id_col).alias("_id"),
        word_shingles(text_col, shingle_k).alias("_sh"),
    ).filter(F.size("_sh") > 0)


def _band_rows(
    with_sh: DataFrame, num_hashes: int, bands: int, seed: int
) -> DataFrame:
    """(_id, band, bh) LSH band rows from a ``_shingled`` frame — the
    candidate-generation relation, 3 scalars per row, all map-side JVM
    expression math (one xxhash64 per shingle, H affine rehashes, banded
    signature re-hash).  Shared by the one-shot ``minhash_lsh_candidates``
    and the persisted ``MinHashLshIndex`` so band values are identical
    across batches by construction."""
    from airbyte_custom_spark.functions.text import let

    rows_per_band = num_hashes // bands

    def rehash(a: int, b: int):
        return lambda h: F.pmod(a * h + b, F.lit(_MERSENNE))

    def sig_of(base: F.Column) -> F.Column:
        # base is LET-BOUND: captured as a subtree, each of the H affine
        # rehash transforms re-evaluates the xxhash of every shingle —
        # H× the hashing work per document (see text.let)
        return F.array(
            *[
                F.array_min(F.transform(base, rehash(a, b)))
                for a, b in _affine_params(num_hashes, seed)
            ]
        )

    sig = let(
        F.transform(F.col("_sh"), lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE))),
        sig_of,
    )
    with_sig = with_sh.select("_id", sig.alias("_sig"))
    return with_sig.select(
        "_id",
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
    ).select("_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))


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
    only (LSH gives no false positives through to the output).

    Shuffle discipline (the 100-TB concern): the ×bands explode and the
    band self-join carry ONLY (id, band, band_hash) — never the shingle
    arrays.  Shingles are joined back by id exactly twice, onto the
    already-deduplicated candidate pairs (round-1 shipped the full shingle
    set through the explode and both join sides, replicating every
    document ×bands through the shuffle)."""
    with_sh = _shingled(df, id_col, text_col, shingle_k)
    banded = _band_rows(with_sh, num_hashes, bands, seed)

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = with_sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    sh_b = with_sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    cand = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# incremental MinHash+LSH (persisted band index)
# ---------------------------------------------------------------------------


class MinHashLshIndex:
    """Persisted LSH band index for INCREMENTAL near-duplicate detection.

    The 100-TB motivation: in a continuously-ingesting corpus (exactly the
    CDC shape this engine loads), re-running LSH over the whole corpus for
    every new batch is O(corpus) per batch.  This index persists exactly
    the candidate-generation relation — (doc_id, band, bh), three scalars
    per row, ``bands`` rows per document, no text / shingles / signatures —
    so each new batch:

      * computes band rows for ITS OWN documents only (map-side JVM math,
        identical values to the one-shot path by construction — shared
        ``_band_rows``);
      * joins them against the index: the shuffle carries O(new×bands)
        rows plus only the index buckets actually hit;
      * verifies TRUE Jaccard on candidate pairs only, reading corpus text
        through a semi-join on the candidate ids (the corpus is never
        shingled wholesale — only rows that appear in some candidate);
      * appends its own band rows (``add``) so the next batch sees it.

    Hash parameters are pinned in ``_lsh_meta.json`` at ``create`` time and
    re-read by ``open`` — band compatibility across batches is structural,
    not by caller convention.  Same false-negative bound per pair as
    ``minhash_lsh_candidates`` at equal parameters ((1-t^r)^b).
    """

    _META = "_lsh_meta.json"
    _BANDS = "bands"

    def __init__(self, spark, index_dir: str, meta: dict):
        self.spark = spark
        self.index_dir = index_dir
        self.num_hashes = int(meta["num_hashes"])
        self.bands = int(meta["bands"])
        self.shingle_k = int(meta["shingle_k"])
        self.seed = int(meta["seed"])
        self.id_col = meta["id_col"]
        self.text_col = meta["text_col"]

    @classmethod
    def create(
        cls,
        spark,
        index_dir: str,
        *,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_k: int = 3,
        seed: int = 42,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "MinHashLshIndex":
        import json
        import os

        if num_hashes % bands != 0:
            raise ValueError(
                f"num_hashes={num_hashes} must be divisible by bands={bands}"
            )
        os.makedirs(index_dir, exist_ok=False)
        meta = {
            "num_hashes": num_hashes,
            "bands": bands,
            "shingle_k": shingle_k,
            "seed": seed,
            "id_col": id_col,
            "text_col": text_col,
        }
        with open(os.path.join(index_dir, cls._META), "w") as f:
            json.dump(meta, f, indent=1)
        return cls(spark, index_dir, meta)

    @classmethod
    def open(cls, spark, index_dir: str) -> "MinHashLshIndex":
        import json
        import os

        with open(os.path.join(index_dir, cls._META)) as f:
            return cls(spark, index_dir, json.load(f))

    # -- internals ---------------------------------------------------------

    def _bands_path(self) -> str:
        import os

        return os.path.join(self.index_dir, self._BANDS)

    def _new_bands(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        sh = _shingled(df, self.id_col, self.text_col, self.shingle_k)
        return sh, _band_rows(sh, self.num_hashes, self.bands, self.seed)

    def _indexed_bands(self) -> DataFrame | None:
        import os

        p = self._bands_path()
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    # -- public ------------------------------------------------------------

    def add(self, df: DataFrame) -> None:
        """Append the batch's (doc_id, band, bh) rows.  Idempotence is the
        CALLER's batch contract (pair a call with the pipeline's batch-id
        manifest, as everywhere else in this engine); re-adding the same
        ids only duplicates candidate generation, never output pairs
        (pairs dedup before verification)."""
        _sh, bands_df = self._new_bands(df)
        bands_df.write.mode("append").parquet(self._bands_path())

    def pairs_against(
        self,
        new_df: DataFrame,
        corpus_df: DataFrame,
        jaccard_threshold: float = 0.8,
    ) -> DataFrame:
        """Near-dup pairs (id_a < id_b, jaccard ≥ threshold) TOUCHING the
        new batch: new×indexed plus new×new.  ``corpus_df`` must provide
        (id_col, text_col) for every id in the index — it is read only
        through a semi-join on the candidate ids.  Docs present in both
        ``new_df`` and ``corpus_df`` are verified from the new side."""
        new_sh, new_bands = self._new_bands(new_df)
        old_bands = self._indexed_bands()

        nn = (
            new_bands.alias("a")
            .join(new_bands.alias("b"), ["band", "bh"])
            .filter(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        )
        if old_bands is not None:
            cross = (
                new_bands.alias("n")
                .join(old_bands.alias("o"), ["band", "bh"])
                .filter(F.col("n._id") != F.col("o._id"))
                .select(
                    F.least("n._id", "o._id").alias("id_a"),
                    F.greatest("n._id", "o._id").alias("id_b"),
                )
            )
            cand = nn.unionByName(cross)
        else:
            cand = nn
        cand = cand.dropDuplicates(["id_a", "id_b"])

        # shingles for verification: new ids from the already-shingled new
        # frame; indexed ids from corpus text narrowed BY SEMI-JOIN to the
        # candidate ids (never a wholesale corpus shingle pass)
        cand_ids = (
            cand.select(F.col("id_a").alias("_id"))
            .unionByName(cand.select(F.col("id_b").alias("_id")))
            .dropDuplicates(["_id"])
        )
        old_needed = corpus_df.join(
            cand_ids,
            corpus_df[self.id_col] == cand_ids["_id"],
            "leftsemi",
        )
        old_sh = _shingled(
            old_needed, self.id_col, self.text_col, self.shingle_k
        ).join(new_sh.select("_id"), "_id", "left_anti")
        sh = new_sh.unionByName(old_sh)

        sh_a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
        sh_b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
        verified = cand.join(sh_a, "id_a").join(sh_b, "id_b")
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size(F.array_union("sh_a", "sh_b"))
        return (
            verified.withColumn("jaccard", F.round(inter / union, 6))
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

SIMHASH_BITS = 48  # 4 bands × 12 bits; packed value stays well inside int64


def simhash_params(
    n_bits: int = SIMHASH_BITS, seed: int = 7
) -> tuple[list[int], list[int]]:
    """Per-bit affine constants (a_i, b_i) over the shared 2^31-1 prime —
    exported so the DuckDB oracle can inline the SAME constants and
    reproduce signatures bit-for-bit."""
    rng = random.Random(seed)
    a = [rng.randrange(1, _MERSENNE) for _ in range(n_bits)]
    b = [rng.randrange(0, _MERSENNE) for _ in range(n_bits)]
    return a, b


def simhash48(text_col: Column | str, seed: int = 7) -> Column:
    """48-bit SimHash, pure JVM expressions end-to-end (round-1 used an
    Arrow pandas UDF for the bit vote; this replaces it entirely).

    bit_i(token) = ((a_i * h31(lower(token)) + b_i) mod 2^31-1) mod 2;
    signature bit i is the majority vote over the token multiset.  Every
    operation is engine-portable integer arithmetic, so the DuckDB oracle
    computes identical signatures (h31 + simhash_params are shared)."""
    from airbyte_custom_spark.functions.text import h31, let

    a_consts, b_consts = simhash_params(seed=seed)
    a_lit = F.lit([*map(int, a_consts)]).cast("array<long>")
    b_lit = F.lit([*map(int, b_consts)]).cast("array<long>")
    zero = F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS)
    powers = F.lit([1 << i for i in range(SIMHASH_BITS)])

    def body(th: F.Column) -> F.Column:
        # th is LET-BOUND (text.let): the majority-vote lambda below
        # references n = size(th) per bit — captured as a subtree it
        # would re-tokenize and re-hash the whole document once per
        # signature bit (48×; measured 135s → 11.2s on sf0.1 docs)
        n = F.size(th)
        votes = F.aggregate(
            th,
            zero,
            lambda acc, h: F.zip_with(
                acc,
                F.zip_with(
                    a_lit, b_lit,
                    lambda a, b: ((a * h + b) % F.lit(_MERSENNE)) % F.lit(2),
                ),
                lambda x, y: x + y,
            ),
        )
        return F.aggregate(
            F.zip_with(
                votes,
                powers,
                lambda v, p: F.when(v * 2 > n, p).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return let(F.transform(tokens(text_col), lambda t: h31(F.lower(t))), body)


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via 4×12-bit banding:
    any pair with ≤3 differing bits agrees on ≥1 of 4 bands (pigeonhole),
    so the bucket join finds ALL of them without an O(n²) compare — which
    also makes the output equal to the oracle's exhaustive pair scan."""
    s = df.select(F.col(id_col).alias("_id"), simhash48(text_col).alias("_sim"))
    band_bits = SIMHASH_BITS // 4
    banded = s.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("_sim"), i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
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


# ---------------------------------------------------------------------------
# connected components (pair → cluster → canonical doc)
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Distributed connected components over a duplicate-pair edge list —
    the final stage of large-scale dedup: pair candidates (MinHash/SimHash/
    n-gram Jaccard) become CLUSTERS, and "keep one per cluster" becomes a
    single filter on ``id == component``.

    Algorithm: min-label propagation with pointer-jumping shortcut
    (hash-to-min + shortcutting, cf. Rastogi et al., "Finding Connected
    Components in Map-Reduce in Logarithmic Rounds", ICDE 2013).  Each
    round:

      1. neighbor-min — every node takes min(own label, neighbors'
         labels): one join + one groupBy-min, shuffling ONLY
         (long, long) scalars, never document payload;
      2. shortcut — ``label := label(label)`` via a self-join on the
         label table, which collapses label chains exponentially, so a
         path of length d converges in O(log d) rounds instead of O(d).

    At a fixpoint every edge has equal labels on both ends and the node
    whose id IS the component minimum keeps its own id, so the final
    label is exactly min(id) over the component.  Labels decrease
    monotonically and are bounded below, so a fixpoint is reached; the
    iteration stops at the first round whose label SUM is unchanged —
    valid precisely because labels are monotone non-increasing over a
    fixed id set (any change strictly lowers the sum; decimal(38,0)
    keeps it exact at any scale), one narrow aggregate per round instead
    of a join against the previous round — and raises loudly if
    ``max_iter`` rounds were insufficient rather than returning a
    silently-partial clustering.

    100-TB posture: the working set per round is one (id,label) row per
    node touched by a dup pair — orders of magnitude smaller than the
    corpus — and each round's lineage is truncated with an eager
    ``localCheckpoint`` so the plan does not grow with the iteration
    count.  Reference parity: airbyte-custom has no clustering stage (its
    dedup is key-equality only, base-typing-deduping dedupFinalTable);
    this operator is part of the LLM-training-pipeline surface the brief
    adds on top.
    """
    from pyspark import StorageLevel

    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist(StorageLevel.MEMORY_AND_DISK)

    lab = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    def _label_sum(frame: DataFrame):
        # decimal(38,0): exact at any node count × id magnitude — a long
        # sum could overflow at 100-TB corpus scale
        return frame.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).first()[0]

    prev_sum = _label_sum(lab)
    try:
        for _ in range(max_iter):
            nbr = sym.join(lab, sym["u"] == lab["id"]).select(
                F.col("v").alias("id"), F.col("label")
            )
            stepped = (
                lab.unionByName(nbr).groupBy("id").agg(F.min("label").alias("label"))
            )
            # shortcut: label := label(label).  Every label value is some
            # node's id (min over ids), so the lookup always resolves; the
            # left join + coalesce is belt-and-braces for the root, whose
            # label is itself.
            ptr = stepped.select(
                F.col("id").alias("_pid"), F.col("label").alias("_plabel")
            )
            jumped = (
                stepped.join(ptr, stepped["label"] == ptr["_pid"], "left")
                .select(
                    F.col("id"),
                    F.coalesce(F.col("_plabel"), F.col("label")).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            # fixpoint probe (round 6): labels decrease MONOTONICALLY and
            # the id set is fixed, so "no label changed" ⇔ "sum(label)
            # unchanged" — one narrow aggregate over the just-
            # checkpointed frame instead of a join against the previous
            # round's table (one fewer join job per round; same
            # round-count and identical output by the monotonicity
            # argument).
            new_sum = _label_sum(jumped)
            lab = jumped
            if new_sum == prev_sum:
                return lab.select("id", F.col("label").alias("component"))
            prev_sum = new_sum
    finally:
        sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "with pointer-jumping this needs O(log(longest path)) rounds — "
        "an input this deep is pathological; raise max_iter explicitly"
    )
