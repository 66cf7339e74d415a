"""Training-corpus assembly over transcript final state — the operable
core of the training-export path (shared by the `__spark_entry__`
oracle-checked queries and the `job.py corpus-export` / `refresh-corpus`
CLI, so the CLI ships exactly the semantics the oracles certify).

Scale shape: everything here is ONE conv_id-keyed aggregation plus
map-side JVM work (regex redaction chain, in-group array_sort — never a
global sort), so a 100-TB corpus export shuffles each row once.  The
incremental refresh reads only the post-cursor commits (file-skipped
``read_since``) and re-assembles only the touched conversations (a
semi-join against their DISTINCT conv_ids — broadcast when manifest
rollups bound the changed set small, shuffled sort-merge otherwise).

Reference anchor: the export/refresh composition mirrors the
typing-deduping final-table contract (`DefaultTyperDeduper.java`) turned
into a corpus artifact — final state in, training documents out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from airbyte_custom_spark.functions.text import redact_pii, token_count


def assemble_corpus(
    turns_df: DataFrame,
    *,
    redact: bool = True,
    min_turns: int = 2,
    max_turns: int = 30,
    min_tokens: int = 5,
    sample_rate: float | None = None,
    pack_max_tokens: int | None = None,
) -> DataFrame:
    """Turn rows (``conv_id, turn_idx, role, text``) → gated training
    documents (``conv_id, n_turns, total_tokens, document``).

    PII scrub (optional) → per-conversation assembly (turns sorted
    in-group, ``role: text`` lines) → quality gate (turn-count band +
    token floor on the assembled document).

    ``sample_rate`` keeps that fraction of CONVERSATIONS by the
    deterministic md5 hash threshold (``functions/sampling.py``) — the
    decision depends only on conv_id, so an incremental refresh keeps or
    drops the same conversations as the base export, and the filter is a
    zero-exchange predicate applied BEFORE the assembly shuffle (dropped
    conversations never shuffle at all).

    ``pack_max_tokens`` switches the output to CONTEXT WINDOWS: the same
    gated conversations (turn band + conversation-level token floor —
    gating happens before packing so every turn of every exported
    conversation lands in exactly one window), chunked by cumulative
    token offset (``functions/packing.py``).  Output gains a
    ``window_id`` column; ``n_turns``/``total_tokens``/``document`` are
    then per window.  Still one conv_id-keyed exchange: the gate windows,
    the packing cum-sum, and the per-window aggregation all share it."""
    rows = turns_df.select("conv_id", "turn_idx", "role", "text")
    if sample_rate is not None:
        from airbyte_custom_spark.functions.sampling import keep_fraction

        rows = rows.filter(keep_fraction("conv_id", sample_rate))
    clean = redact_pii("text") if redact else F.col("text")
    if pack_max_tokens is None:
        turns = F.array_sort(
            F.collect_list(F.struct("turn_idx", "role", "clean"))
        )
        docs = (
            rows.withColumn("clean", clean)
            .groupBy("conv_id")
            .agg(
                F.count(F.lit(1)).alias("n_turns"),
                F.array_join(
                    F.transform(
                        turns,
                        lambda s: F.concat_ws(": ", s["role"], s["clean"]),
                    ),
                    "\n",
                ).alias("document"),
            )
            .withColumn("total_tokens", token_count("document"))
        )
        return docs.filter(
            F.col("n_turns").between(min_turns, max_turns)
            & (F.col("total_tokens") >= min_tokens)
        ).select("conv_id", "n_turns", "total_tokens", "document")

    from pyspark.sql.window import Window

    from airbyte_custom_spark.functions.packing import pack_context_windows

    # per-line token counts ARE the document token counts: lines join
    # with '\n' (whitespace), so the whitespace-token total of a window's
    # document equals the sum of its lines' counts
    lined = (
        rows.withColumn("clean", clean)
        .withColumn("line", F.concat_ws(": ", "role", "clean"))
        .withColumn("tok", token_count("line"))
    )
    conv = Window.partitionBy("conv_id")
    gated = (
        lined.withColumn("conv_turns", F.count(F.lit(1)).over(conv))
        .withColumn("conv_tokens", F.sum("tok").over(conv))
        .filter(
            F.col("conv_turns").between(min_turns, max_turns)
            & (F.col("conv_tokens") >= min_tokens)
        )
    )
    packed = pack_context_windows(
        gated, ["conv_id"], "turn_idx", "tok", pack_max_tokens
    )
    win_lines = F.array_sort(F.collect_list(F.struct("turn_idx", "line")))
    return (
        packed.groupBy("conv_id", "window_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.array_join(
                F.transform(win_lines, lambda s: s["line"]), "\n"
            ).alias("document"),
        )
        .withColumn("total_tokens", token_count("document"))
        .select(
            "conv_id", "window_id", "n_turns", "total_tokens", "document"
        )
    )


def refresh_corpus(
    table,
    cursor: int,
    *,
    redact: bool = True,
    min_turns: int = 2,
    max_turns: int = 30,
    min_tokens: int = 5,
    sample_rate: float | None = None,
    pack_max_tokens: int | None = None,
    broadcast_threshold_rows: int = 10_000_000,
) -> DataFrame:
    """Incremental (daily-export) refresh: re-assemble ONLY the
    conversations with a post-``cursor`` winner, through the SAME
    ``assemble_corpus`` transform (and defaults) as the base export — same
    PII scrub, same quality gate, same output schema — so refresh parquet
    unions cleanly with the base export and a document is redacted/gated
    identically whichever path produced it.

    ``read_since(cursor)`` yields the changed keys (file-skipped, O(changed
    data)); their DISTINCT conv_ids gate the full final state with a
    semi-join; the assembly aggregation then shuffles O(touched convs),
    never O(table).  A conversation whose only post-cursor change is a
    tombstone re-assembles without the deleted turn — or drops out
    entirely when nothing is left (or when the re-assembled document no
    longer clears the gate).

    Join strategy mirrors ``LakeTable.changes_since``: the changed-row
    count is bounded FIRST from manifest rollups (rows over files with
    lsn_max past the cursor — zero I/O).  Under
    ``broadcast_threshold_rows`` the conv_id set broadcasts (the daily
    frequent-refresh path); above it — a refresh catching up across a
    wide gap, where a forced broadcast would OOM the driver — it falls
    back to a shuffled sort-merge semi-join, the right plan when
    "changed" is itself big data."""
    cursor = int(cursor)
    changed = table.read_since(cursor).select("conv_id").distinct()
    kept = [
        e
        for e in table.live_files() + table.live_delta_files()
        if e.get("lsn_max") is None or e["lsn_max"] > cursor
    ]
    stats_known = all(
        e.get("lsn_max") is not None and e.get("rows") is not None
        for e in kept
    )
    est_changed = sum(int(e.get("rows") or 0) for e in kept)
    if stats_known and est_changed <= broadcast_threshold_rows:
        touched = table.read().join(
            F.broadcast(changed), "conv_id", "leftsemi"
        )
    else:
        touched = table.read().join(
            changed.hint("merge"), "conv_id", "leftsemi"
        )
    return assemble_corpus(
        touched,
        redact=redact,
        min_turns=min_turns,
        max_turns=max_turns,
        min_tokens=min_tokens,
        sample_rate=sample_rate,
        pack_max_tokens=pack_max_tokens,
    )


def corpus_dup_ids(
    docs: DataFrame,
    id_col: str = "conv_id",
    doc_col: str = "document",
    threshold: float = 0.9,
    shingle_k: int = 3,
    max_shingle_freq: int = 10_000,
) -> DataFrame:
    """Ids of near-duplicate documents to DROP — everything but one
    canonical member per near-dup cluster.  The `q_corpus_dedup`
    composition (n-gram Jaccard pairs → connected components → keep the
    cluster minimum) over ASSEMBLED documents with string ids: the
    component stage shuffles only long scalars, so string ids map through
    ``xxhash64`` first and the drop set maps back by a semi-join on the
    distinct-id table (a 64-bit collision — ~n²/2⁶⁵, a handful in 10¹⁰
    docs — can at worst merge two clusters and drop one extra canonical;
    it can never corrupt the kept documents).

    Scale shape: candidate generation is the frequency-capped inverted
    index (never all-pairs); clustering is O(log d) scalar-only rounds;
    no document text crosses any dedup exchange."""
    from airbyte_custom_spark.functions.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(
        docs,
        id_col=id_col,
        text_col=doc_col,
        shingle_k=shingle_k,
        threshold=threshold,
        max_shingle_freq=max_shingle_freq,
    )

    def nid(c: str):
        return F.xxhash64(F.col(c).cast("string"))

    edges = pairs.select(nid("id_a").alias("id_a"), nid("id_b").alias("id_b"))
    comp = connected_components(edges)
    drop_nids = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("_nid")
    )
    ids = docs.select(id_col).distinct().withColumn("_nid", nid(id_col))
    return ids.join(drop_nids, "_nid", "leftsemi").select(id_col)


def dedup_corpus(
    docs: DataFrame,
    id_col: str = "conv_id",
    doc_col: str = "document",
    threshold: float = 0.9,
    shingle_k: int = 3,
    max_shingle_freq: int = 10_000,
    broadcast_threshold_rows: int = 10_000_000,
) -> DataFrame:
    """Drop near-duplicate documents, keeping one per cluster: a
    left-anti join of the corpus against the drop set from
    ``corpus_dup_ids``.

    The drop set is NOT assumed small: web-corpus dup rates run 30–50%,
    so at scale it is O(corpus) — the same trap the lake's
    ``changes_since`` guards against.  The set is persisted, COUNTED,
    and broadcast only under ``broadcast_threshold_rows`` (ids-only rows
    — 10M conv_id strings ≈ a few hundred MB, inside executor broadcast
    budgets); above that the anti join falls back to a key-only shuffle
    (conv_id scalars on both sides — document text stays map-side either
    way because the anti join needs only the key column from the probe
    side's perspective after pushdown)."""
    drop = corpus_dup_ids(
        docs,
        id_col=id_col,
        doc_col=doc_col,
        threshold=threshold,
        shingle_k=shingle_k,
        max_shingle_freq=max_shingle_freq,
    ).persist()
    try:
        n_drop = drop.count()
        right = F.broadcast(drop) if n_drop <= broadcast_threshold_rows else drop
        # the persist must outlive this frame (the join materializes
        # lazily downstream); blockManager eviction reclaims it, or the
        # caller unpersists after writing the result.
        return docs.join(right, id_col, "left_anti")
    except Exception:
        drop.unpersist()
        raise


def decontaminate_corpus(
    docs_df: DataFrame,
    bench_df: DataFrame,
    *,
    id_col: str = "conv_id",
    text_col: str = "document",
    bench_text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Drop training documents sharing any word ``k``-gram with a held-out
    benchmark set (the GPT-3 appendix-C / PaLM §6 n-gram-overlap filter),
    as the last gate before export.

    Scale shape: the benchmark gram set is bounded by the BENCHMARK's
    size, never the corpus's, so it is built once (one tiny distinct) and
    BROADCAST; candidate grams stream map-side through the broadcast hash
    join, and only the matched doc ids — a vanishing subset — shuffle for
    the distinct + left-anti join.  The corpus itself is never shuffled on
    gram content.  ``k`` defaults to 3 to match the ``decontaminate``
    oracle query (13 in real web-corpus practice — see
    ``__spark_entry__._DECON_K``)."""
    from airbyte_custom_spark.functions.text import positional_ngrams

    bench_grams = (
        bench_df.select(
            F.explode(
                F.array_distinct(positional_ngrams(bench_text_col, k))
            ).alias("g")
        ).distinct()
    )
    hits = (
        docs_df.select(
            id_col,
            F.explode(F.array_distinct(positional_ngrams(text_col, k))).alias(
                "g"
            ),
        )
        .join(F.broadcast(bench_grams), "g")
        .select(id_col)
        .distinct()
    )
    return docs_df.join(hits, id_col, "left_anti")
