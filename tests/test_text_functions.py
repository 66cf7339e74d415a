"""Text analysis + fingerprinting functions over the documents table."""

import os

from pyspark.sql import functions as F

from airbyte_custom_spark.functions.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    mean_word_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    word_shingles,
)


def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_token_count_basic(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("  ",), ("one",)], "text string"
    )
    got = [r[0] for r in df.select(token_count("text")).collect()]
    assert got == [3, 0, 0, 1]


def test_bpe_ish_counts_subunits(spark):
    df = spark.createDataFrame([("hello, world 42!",)], "text string")
    # hello | , | world | 4 | 2 | !  → 6
    assert df.select(bpe_ish_token_count("text")).first()[0] == 6


def test_ratios_bounded(spark, sf_dir):
    d = docs(spark, sf_dir).select(
        stopword_ratio("text").alias("sw"),
        punct_ratio("text").alias("p"),
        mean_word_len("text").alias("m"),
        quality_score("text").alias("q"),
    )
    row = d.agg(
        F.min("sw"), F.max("sw"), F.min("p"), F.max("p"), F.min("q"), F.max("q")
    ).first()
    assert 0.0 <= row[0] <= row[1] <= 1.0
    assert 0.0 <= row[2] <= row[3] <= 1.0
    assert 0.0 <= row[4] <= row[5] <= 1.0


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and it is happy",),
            ("el perro y la casa de que en un dia",),
            ("le chat et les maisons de la ville pour un jour",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(lang_id("text")).collect()]
    assert got[0] == "en" and got[1] == "es" and got[2] == "fr" and got[3] == "und"


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "text string")
    got = [r[0] for r in df.select(word_shingles("text", 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]  # shorter than k → whole text
    assert got[2] == []


def test_fingerprint_robust_to_small_edit(spark):
    # varied words: repeated text collapses to a handful of distinct
    # shingles and makes jaccard meaninglessly coarse
    base = " ".join(f"word{i}" for i in range(60))
    edited = base.replace("word30", "changed", 1)
    df = spark.createDataFrame([(1, base), (2, edited), (3, "unrelated words only")],
                               "id long, text string")
    rows = {r["id"]: set(r["fp"]) for r in df.select("id", doc_fingerprint("text").alias("fp")).collect()}
    sim_edit = len(rows[1] & rows[2]) / len(rows[1] | rows[2])
    sim_unrel = len(rows[1] & rows[3]) / len(rows[1] | rows[3])
    assert sim_edit > 0.5 > sim_unrel


def test_all_functions_run_on_documents(spark, sf_dir):
    d = docs(spark, sf_dir)
    out = d.select(
        "doc_id",
        token_count("text").alias("n_tok"),
        lang_id("text").alias("lang"),
        quality_score("text").alias("q"),
        doc_fingerprint("text").alias("fp"),
    )
    assert out.count() == d.count()
    assert out.filter(F.col("n_tok") <= 0).count() == 0


def test_h31_duckdb_parity_including_non_bmp(spark):
    """h31 / h31_sql are bit-identical across engines on ANY text: non-BMP
    characters (where Spark ascii() yields a UTF-16 surrogate but DuckDB
    unicode() yields the code point) are stripped identically on both
    sides (round-2 ADVICE fix)."""
    import duckdb

    from airbyte_custom_spark.functions.text import h31, h31_sql

    rows = [
        ("plain ascii",),
        ("café naïve",),
        ("emoji 🎉 mix 🚀 end",),
        ("𝕊𝕦𝕡𝕡",),  # entirely non-BMP → hashes as empty on both sides
        ("",),
        ("中文 text",),
    ]
    df = spark.createDataFrame(rows, "s string")
    got = [r[0] for r in df.select(h31("s")).collect()]
    con = duckdb.connect()
    con.execute("create table t(i int, s varchar)")
    for i, (s,) in enumerate(rows):
        con.execute("insert into t values (?, ?)", [i, s])
    want = [r[0] for r in con.execute(f"select {h31_sql('s')} from t order by i").fetchall()]
    assert got == want


def test_redact_pii_masks_and_matches_duckdb(spark):
    """Each PII shape gets its placeholder; transcript-shaped text is left
    untouched; Spark output equals the DuckDB twin (the oracle contract)."""
    import duckdb

    from airbyte_custom_spark.functions.text import redact_pii, redact_pii_sql
    rows = [
        ("mail john.doe+x@example.com now", "<EMAIL>"),
        ("card 4111 1111 1111 1111 ok", "<CARD>"),
        ("ssn 123-45-6789 end", "<SSN>"),
        ("call +1 555 123 4567 pls", "<PHONE>"),
        ("ip 192.168.0.1 seen", "<IP>"),
        ("turn-conv-0:1@rev9880", None),  # transcript text: untouched
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "s string")
    got = [r[0] for r in df.select(redact_pii("s")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {redact_pii_sql('$1')}", [s]).fetchone()[0]
        for s, _ in rows
    ]
    assert got == want
    for (src, placeholder), out in zip(rows, got):
        if placeholder is None:
            assert out == src
        else:
            assert placeholder in out


def test_bpe_vocab_token_count_hand_cases_and_duckdb_twin(spark):
    """The pinned-merge BPE encode: hand-computed counts, and Spark equals
    the DuckDB twin (the oracle contract) on every case — including
    multi-level merges (t+h, th+e, the+r) and merge outputs feeding later
    rules (e+r then er+s)."""
    import duckdb

    from airbyte_custom_spark.functions.text import (
        bpe_vocab_token_count,
        bpe_vocab_token_count_sql,
    )

    # hand-derived under BPE_MERGES priority-iterative semantics
    cases = [
        ("the", 1),            # t h e -> th e -> the
        ("ther", 1),           # ... -> the r -> ther
        ("and", 1),            # a n d -> an d -> and
        ("ers", 1),            # e r s -> er s -> ers
        ("cat", 2),            # c at
        ("cato", 3),           # c at o — (t,o) must NOT fire inside 'at'
        ("ton", 2),            # t on — (o,n) outranks (t,o)
        ("tomato", 4),         # to m at o
        ("the cat sat on the mat", 9),
        ("", 0),
        ("  spaced   out  ", 7),   # s p a c ed (5) + ou t (2)
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = [r[0] for r in df.select(bpe_vocab_token_count("s")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT {bpe_vocab_token_count_sql('s')} FROM (SELECT ? AS s)", [s]
        ).fetchone()[0]
        for s, _ in cases
    ]
    assert got == want  # the oracle contract, every case
    for (src, expect), out in zip(cases, got):
        assert out == expect, (src, out, expect)


def _reference_bpe_count(word: str) -> int:
    """Priority-iterative BPE encode (Sennrich et al. 2016): repeatedly
    merge all leftmost-nonoverlapping occurrences of the present pair with
    the best (lowest) rank, until no rule applies."""
    from airbyte_custom_spark.functions.text import BPE_MERGES

    rank = {pair: i for i, pair in enumerate(BPE_MERGES)}
    syms = list(word)
    while len(syms) > 1:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        best = min((rank[p] for p in pairs if p in rank), default=None)
        if best is None:
            break
        a, b = BPE_MERGES[best]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def test_bpe_replace_chain_equals_reference_bpe(spark):
    """The guarded literal-replace chain (one pass per rule, pinned order)
    must equal the real priority-iterative BPE encoder on this merge
    table — the property that makes 'exact subword token total' a true
    claim, not an approximation.  Randomized words over the table's
    alphabet plus adversarial boundary cases ('cato', 'ton', 'tomato'
    would all diverge under an unguarded replace chain)."""
    import random

    from airbyte_custom_spark.functions.text import bpe_vocab_token_count

    rng = random.Random(42)
    alphabet = "theinorsadlcmgu"
    words = ["cato", "ton", "tomato", "atat", "ttt", "lll", "thethe"] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = [r[0] for r in df.select(bpe_vocab_token_count("s")).collect()]
    want = [_reference_bpe_count(w) for w in words]
    assert got == want, [
        (w, g, e) for w, g, e in zip(words, got, want) if g != e
    ][:10]


def test_bpe_vocab_token_count_null_text_is_zero_like_the_oracle(spark):
    """NULL text counts 0 tokens on BOTH sides of the oracle contract —
    without the coalesce, Spark's aggregate over a NULL array yields NULL
    and poisons any SUM above it while DuckDB's twin sums 0."""
    import duckdb

    from airbyte_custom_spark.functions.text import (
        bpe_vocab_token_count,
        bpe_vocab_token_count_sql,
    )

    df = spark.createDataFrame(
        [("a", None), ("b", "the cat")], "id string, s string"
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", bpe_vocab_token_count("s").alias("n")).collect()
    }
    con = duckdb.connect()
    want_null = con.execute(
        f"SELECT {bpe_vocab_token_count_sql('s')} FROM (SELECT NULL::VARCHAR AS s)"
    ).fetchone()[0]
    assert got["a"] == want_null == 0
    assert got["b"] == 3  # the + c at
    # and a SUM over a group containing the NULL row stays exact
    total = df.agg(F.sum(bpe_vocab_token_count("s")).alias("t")).first()["t"]
    assert total == 3


def test_repetition_stats_known_values(spark):
    """Hand-computed Gopher repetition signals on planted texts."""
    from airbyte_custom_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z"), (3, "q"), (4, ""), (5, "m m m m")],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            repetition_stats("text", 2).alias("r2"),
            repetition_stats("text", 3).alias("r3"),
        ).collect()
    }
    # "a b a b a": 2-grams {a b:2, b a:2} -> top "a b" (lex tie-break),
    # dup chars 2*3 + 2*3; 3-grams {a b a:2, b a b:1} -> dup 2*5
    assert rows[1]["r2"]["top_count"] == 2
    assert rows[1]["r2"]["top_gram"] == "a b"
    assert rows[1]["r2"]["dup_chars"] == 12
    assert rows[1]["r3"]["dup_chars"] == 10
    # all-distinct grams: top run is the lexicographically first gram, cnt 1
    assert rows[2]["r2"]["top_count"] == 1
    assert rows[2]["r2"]["top_gram"] == "x y"
    assert rows[2]["r2"]["dup_chars"] == 0
    # sub-n-gram and empty docs: no grams, all-zero signals
    for i in (3, 4):
        assert rows[i]["r2"] == rows[i]["r3"]
        assert rows[i]["r2"]["top_count"] == 0
        assert rows[i]["r2"]["top_gram"] == ""
        assert rows[i]["r2"]["dup_chars"] == 0
    # "m m m m": 2-grams {m m: 3}; 3-grams {m m m: 2}
    assert rows[5]["r2"]["top_count"] == 3
    assert rows[5]["r2"]["dup_chars"] == 9
    assert rows[5]["r3"]["dup_chars"] == 10


def test_repetition_tie_breaks_to_lexicographically_smallest(spark):
    """Equal-count grams must resolve identically in Spark and the oracle
    (ORDER BY cnt DESC, gram ASC): the sorted-array fold only replaces the
    best gram on a STRICTLY greater run, so the smallest gram wins ties."""
    from airbyte_custom_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "c d a b c d a b")], "id long, text string"
    )
    r = df.select(repetition_stats("text", 2).alias("r")).first()["r"]
    # counts: {c d: 2, d a: 2, a b: 2, b c: 1} -> tie at 2, "a b" smallest
    assert r["top_count"] == 2
    assert r["top_gram"] == "a b"


def test_doc_repetition_plan_is_pure_map(spark, sf_dir):
    """The repetition query must stay a zero-shuffle map stage (scan ->
    project) with no Python — this is what makes it linear at 100 TB."""
    import __spark_entry__ as entry_mod
    from airbyte_custom_spark.plans.inspect import exchange_count, explain_str

    df = entry_mod.queries()["doc_repetition"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert exchange_count(df) == 0, plan
    assert "EvalPython" not in plan, plan


def test_decontaminate_broadcasts_bench_grams(spark, sf_dir):
    """The benchmark gram set is the bounded side: the candidate-vs-bench
    join must be a BroadcastHashJoin (candidate grams never shuffle for
    the join), leaving only the bench-distinct and per-doc-count
    exchanges, both tiny."""
    import __spark_entry__ as entry_mod
    from airbyte_custom_spark.plans.inspect import exchange_count, explain_str

    df = entry_mod.queries()["decontaminate"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert exchange_count(df) <= 2, plan
    assert "EvalPython" not in plan, plan


def test_decontaminate_flags_planted_overlap(spark, tmp_path):
    """A candidate doc sharing a 3-gram with a benchmark doc is flagged
    with the exact overlapping-gram count; clean docs are absent."""
    import os

    import __spark_entry__ as entry_mod

    docs = spark.createDataFrame(
        [
            # doc_id 3 is a benchmark doc (3 % 97 == 3)
            (3, "alpha beta gamma delta", "en", "bench", 22),
            # shares "alpha beta gamma" and "beta gamma delta"
            (10, "alpha beta gamma delta epsilon", "en", "web", 30),
            # no shared 3-gram
            (11, "zeta eta theta iota", "en", "web", 19),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    got = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in entry_mod.queries()["decontaminate"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {10: 2}


def test_line_repetition_stats_known_values(spark):
    """Duplicate-line fold on a planted multi-line document."""
    from airbyte_custom_spark.functions.text import line_repetition_stats

    doc = "user: hi\nassistant: yo\nuser: hi\nuser: hi\nassistant: bye"
    df = spark.createDataFrame([(doc,)], "document string")
    r = df.select(line_repetition_stats("document").alias("r")).first()["r"]
    # "user: hi" appears 3x (8 chars each); other lines unique
    assert r["top_count"] == 3
    assert r["top_gram"] == "user: hi"
    assert r["dup_items"] == 3
    assert r["dup_chars"] == 24
    # single-line doc: no duplicates
    one = spark.createDataFrame([("only line",)], "document string")
    r1 = one.select(line_repetition_stats("document").alias("r")).first()["r"]
    assert r1["dup_items"] == 0 and r1["top_count"] == 1


def test_corpus_repetition_plan_discipline(spark, sf_dir):
    """Line-repetition over assembled conversations adds NO exchange
    beyond the final-state reduce + assembly aggregations — the fold is
    map-side; no global sort, no Python."""
    import __spark_entry__ as entry_mod
    from airbyte_custom_spark.plans.inspect import exchange_count, explain_str

    df = entry_mod.queries()["corpus_repetition"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert exchange_count(df) <= 3, plan
    assert "rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_let_binds_invariants_once(spark):
    """`let` (round 6): the bound value must behave exactly like inlining
    the subtree — same results for scalars, arrays, and NULLs — while
    evaluating it once per row (the quadratic-capture fix for HOF
    lambdas; see text.let docstring)."""
    from pyspark.sql import functions as F

    from airbyte_custom_spark.functions.text import let, tokens

    df = spark.createDataFrame(
        [("a b c d e",), ("",), (None,), ("one",)], "s string"
    )
    # let-bound shingle-style use ≡ direct capture, including NULL/empty
    direct = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tokens("s")) - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(tokens("s"), i + 1, 2)),
    )
    bound = let(
        tokens("s"),
        lambda t: F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(t) - 2, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, 2)),
        ),
    )
    rows = df.select(direct.alias("a"), bound.alias("b")).collect()
    for r in rows:
        assert r["a"] == r["b"], r
    # scalar bind
    out = df.select(let(F.length("s") * 2, lambda v: v + 1).alias("x")).collect()
    assert [r["x"] for r in out] == [19, 1, None, 7]
