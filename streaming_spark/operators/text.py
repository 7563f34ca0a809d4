"""Text-analysis operators for training-data pipelines — all pure column
expressions (whole-stage codegen, no Python in the hot path) except the
rolling-hash fingerprint, which is an Arrow-batch map.

Generalizes the reference's only text processing (TSV string handling and
the csv→binary MNIST parse, reference 4-machine-learning.py:68-96) into
the language-ID / quality-scoring / token-counting surface a 100 TB
corpus pipeline needs.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_spark.operators.stream import ensure_parallelism, stream

# Tiny per-language stopword lists for the n-gram/stopword-vote heuristic.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "es": ("el", "los", "y", "una", "este", "por"),
}


def tokens_col(text: str | Column) -> Column:
    """Whitespace tokenization (empty text → empty array, not ['']).

    NULL text propagates as NULL — deliberately, because every DuckDB
    oracle twin's ``CASE WHEN length(trim(text)) = 0 ... ELSE split``
    does the same (NULL falls through the WHEN and splits to NULL), so
    the engines agree row for row.  A caller whose input admits NULL
    text and needs total metrics must ``coalesce`` BEFORE tokenizing —
    on both sides."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: str | Column) -> Column:
    return F.size(tokens_col(text))


def stopword_hits(tokens: Column, lang: str) -> Column:
    """Count of ``lang`` stopwords in a token-array column."""
    return F.size(
        F.filter(tokens, lambda t: t.isin(*STOPWORDS[lang]))
    ).alias(f"hits_{lang}")


def with_lang_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Add per-language stopword hit counts + predicted language.

    Tie-break order en > de > fr > es > unknown, matching the oracle SQL's
    CASE ordering."""
    out = df.withColumn("__tokens", tokens_col(text_col))
    for lang in STOPWORDS:
        out = out.withColumn(
            f"hits_{lang}", stopword_hits(F.col("__tokens"), lang)
        )
    hits = [F.col(f"hits_{lang}") for lang in STOPWORDS]
    best = F.greatest(*hits)
    pred = F.when(best <= 0, F.lit("unknown"))
    for lang in STOPWORDS:
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return out.withColumn("pred_lang", pred).drop("__tokens")


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-token-length
    quality features, rounded for cross-engine comparison."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    out = (
        df.withColumn("__tokens", toks)
        .withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "punct_ratio",
            F.round(punct / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.expr(f"size(filter(__tokens, t -> t IN ({en})))")
                / F.greatest(n_tokens, F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "mean_token_len",
            F.round(
                F.expr("aggregate(__tokens, 0L, (acc, t) -> acc + length(t))")
                / F.greatest(n_tokens, F.lit(1)),
                6,
            ),
        )
        .drop("__tokens")
    )
    return out


def bpe_ish_token_count(text: str | Column) -> Column:
    r"""Sub-word token-count proxy: each whitespace word contributes
    ceil(len/4) tokens (a cheap stand-in for BPE piece counts; the real
    tokenizer slots in behind the same column contract)."""
    toks = tokens_col(text)
    pieces = F.transform(
        toks, lambda t: F.ceil(F.length(t) / F.lit(4.0)).cast("long")
    )
    return F.aggregate(pieces, F.lit(0).cast("long"), lambda acc, v: acc + v)


def fingerprint(df: DataFrame, text_col: str, id_col: str, width: int = 64) -> DataFrame:
    """Deterministic document fingerprint: polynomial rolling hash (base
    1000003, mod 2^61-1) over the first ``width`` chars + md5 of the
    whole text.  Arrow-batch map — O(len) per row, no shuffle."""
    mod = (1 << 61) - 1

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, rolls, digests = [], [], []
        for doc_id, text in zip(pdf[id_col], pdf[text_col]):
            s = (text or "")[:width]
            acc = 0
            for ch in s:
                acc = (acc * 1000003 + ord(ch)) % mod
            ids.append(doc_id)
            rolls.append(acc)
            digests.append(hashlib.md5((text or "").encode("utf-8")).hexdigest())
        return pd.DataFrame({"id": ids, "rolling_hash": rolls, "md5": digests})

    return stream(
        ensure_parallelism(
            df.select(F.col(id_col).alias(id_col), F.col(text_col).alias(text_col))
        ),
        compute,
        "id BIGINT, rolling_hash BIGINT, md5 STRING",
    )


def window_hashes(
    df: DataFrame, text_col: str, id_col: str, width: int = 40
) -> DataFrame:
    """Rolling hash of EVERY ``width``-char window of each document —
    the candidate-generation pass of exact-substring duplicate-span
    detection (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better": duplicated training spans, not just whole
    duplicated documents, measurably hurt models).

    Emits one (doc_id, pos, h) row per window position (1-based, to
    match SQL ``substring``).  The hash is polynomial (base 1000003)
    mod 2^64 — uint64 wraparound IS the modulus, which unlocks the
    fully VECTORIZED closed form: with prefix sums P[k] = Σ_{j<k}
    ord_j·base^(n−1−j), window i is (P[i+w] − P[i])·base⁻ⁿ⁺ⁱ⁺ʷ, and
    base is odd so its inverse mod 2^64 exists — six numpy ops per
    document instead of a per-character Python loop (measured 12× on
    the compute itself; fixture-scale WALL time is Arrow-transfer-bound
    so it shows there only at higher docs-per-core ratios; equality
    with the O(1)-rolling recurrence is pinned in the unit test).  Arrow-batch map, zero shuffle — at
    100 TB the wide span strings never leave their scan task; only
    16-byte (id, pos, hash) triples flow into the downstream groupBy,
    and hash-equal candidates are re-verified on the exact text
    afterwards so a hash collision can't fabricate a dup."""
    import numpy as np

    base = 1000003
    mask = (1 << 64) - 1
    ibase = pow(base, -1, 1 << 64)  # base is odd => invertible mod 2^64

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        texts = [t or "" for t in pdf[text_col]]
        max_n = max((len(t) for t in texts), default=0)
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int32"),
                "h": pd.Series([], dtype="int64"),
            }
        )
        if max_n < width:
            return empty
        # power tables built once per batch with exact Python ints, then
        # reinterpreted as uint64 (every value already < 2^64)
        pows_l, ipows_l = [1], [1]
        for _ in range(max_n):
            pows_l.append((pows_l[-1] * base) & mask)
            ipows_l.append((ipows_l[-1] * ibase) & mask)
        pows = np.array(pows_l, dtype=np.uint64)
        ipows = np.array(ipows_l, dtype=np.uint64)

        id_chunks, pos_chunks, h_chunks = [], [], []
        for doc_id, s in zip(pdf["doc_id"], texts):
            n = len(s)
            if n < width:
                continue
            m = n - width + 1
            ords = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.uint64)
            terms = ords * pows[n - 1 :: -1][:n]
            prefix = np.zeros(n + 1, dtype=np.uint64)
            np.cumsum(terms, out=prefix[1:])
            diffs = prefix[width:] - prefix[: n - width + 1]
            h = diffs * ipows[n - width :: -1][: n - width + 1]
            id_chunks.append(np.full(m, doc_id, dtype=np.int64))
            pos_chunks.append(np.arange(1, m + 1, dtype=np.int32))
            h_chunks.append(h.view(np.int64))
        if not id_chunks:
            return empty
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(id_chunks),
                "pos": np.concatenate(pos_chunks),
                "h": np.concatenate(h_chunks),
            }
        )

    return stream(
        # explicit full-core fan-out: this map EXPLODES each doc into
        # ~len(text) window rows, so the Arrow serialization of the
        # OUTPUT dominates (≈250× the input bytes at fixture doc
        # lengths) — the size-adaptive default sizes by input bytes and
        # cannot see that
        ensure_parallelism(
            df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias(text_col)),
            df.sparkSession.sparkContext.defaultParallelism,
        ),
        compute,
        "doc_id BIGINT, pos INT, h BIGINT",
    )


def repetition_signals(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher-style within-document repetition signals, zero-shuffle.

    Adds ``n_tokens``, ``dup_word_frac`` (fraction of tokens that are
    repeats of an earlier occurrence) and ``top_word_frac`` (frequency of
    the single most common token).  Instead of the obvious
    explode→groupBy(doc, token) plan — which shuffles one row per
    distinct (doc, token) — this sorts each token array in place and
    folds it with a single ``aggregate`` HOF: equal tokens are adjacent
    after the sort, so one pass tracks run lengths and the distinct
    count.  Pure codegen'd expressions, narrow all the way down: the
    plan that survives 100 TB is the one with NO exchange at all."""
    fold = F.expr(
        """
        aggregate(
          sort_array(__toks),
          struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS maxrun, 0L AS ndist),
          (s, t) -> struct(
            t AS prev,
            IF(s.prev IS NOT NULL AND t = s.prev, s.run + 1L, 1L) AS run,
            GREATEST(s.maxrun,
                     IF(s.prev IS NOT NULL AND t = s.prev, s.run + 1L, 1L)) AS maxrun,
            s.ndist + IF(s.prev IS NOT NULL AND t = s.prev, 0L, 1L) AS ndist),
          s -> struct(s.maxrun AS maxrun, s.ndist AS ndist))
        """
    )
    n = F.size(F.col("__toks")).cast("long")
    safe = F.greatest(n, F.lit(1).cast("long"))
    return (
        df.withColumn("__toks", tokens_col(text_col))
        .withColumn("__fold", fold)
        .withColumn("n_tokens", n)
        .withColumn(
            "dup_word_frac",
            F.round((n - F.col("__fold.ndist")).cast("double") / safe, 6),
        )
        .withColumn(
            "top_word_frac",
            F.when(n == 0, F.lit(0.0)).otherwise(
                F.round(F.col("__fold.maxrun").cast("double") / safe, 6)
            ),
        )
        .drop("__toks", "__fold")
    )


def with_word_ngrams(df: DataFrame, toks_col: str, n: int, out_col: str) -> DataFrame:
    """Add a column of space-joined word ``n``-grams from a token-array
    column (empty when the document has fewer than ``n`` tokens).

    Uses Spark ML's NGram transformer, which builds grams in one JVM
    pass per row.  The two expression formulations were measured and
    rejected: ``transform(sequence(...), i -> array_join(slice(...)))``
    runs interpreted per gram (9 s for 250 k grams single-task at
    sf0.1) and a getItem chain is worse (27 s); NGram does the same
    work in 0.6 s."""
    from pyspark.ml.feature import NGram

    return NGram(n=n, inputCol=toks_col, outputCol=out_col).transform(df)


def normalize_text_col(text: str | Column) -> Column:
    """Canonicalization expression shared by text_normalize and the
    pretraining pipeline: lowercase, strip control chars, collapse
    whitespace runs, trim — all codegen'd string builtins."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[\x00-\x1f\x7f]", ""), r"\s+", " "
        )
    )


def break_into_lines(text: str | Column, words_per_line: int = 10) -> Column:
    """Deterministic line derivation for line-granular rules on the
    single-line fixture docs: normalize whitespace, then insert a
    newline after every ``words_per_line`` words — one codegen'd
    regexp_replace, reproducible verbatim in DuckDB (the oracles use
    the same pattern), so line-level operators stay oracle-checkable.
    On a real crawl corpus the text already carries newlines and this
    derivation is skipped — the downstream operators only see a
    ``line`` column."""
    c = F.col(text) if isinstance(text, str) else text
    flat = F.regexp_replace(F.trim(c), r"\s+", " ")
    pat = r"((\S+ ){%d}\S+) " % (words_per_line - 1)
    return F.regexp_replace(flat, pat, "$1\n")


def derive_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 10,
) -> DataFrame:
    """(id, line_no, line) — one row per derived line, 1-based position.
    posexplode keeps the within-doc order explicit so downstream
    keep-first policies are deterministic."""
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            id_col,
            F.posexplode(
                F.split(break_into_lines(text_col, words_per_line), "\n")
            ).alias("pos0", "line"),
        )
        .select(
            id_col,
            (F.col("pos0") + 1).cast("bigint").alias("line_no"),
            "line",
        )
    )


def c4_quality(
    df: DataFrame,
    text_col: str = "text",
    words_per_line: int = 10,
    min_line_words: int = 5,
    min_lines: int = 3,
    require_terminal_punct: bool = False,
) -> DataFrame:
    """C4 cleaning-rule metrics (Raffel et al. 2020 §2.2 — the rule set
    behind the C4/mC4 corpora): per doc the derived line count, lines
    shorter than ``min_line_words`` words, lines mentioning
    'javascript', lines ending in terminal punctuation, the count of
    KEPT lines (long enough, no 'javascript', and — when
    ``require_terminal_punct`` — punctuation-terminated), plus the
    page-level 'lorem ipsum' and '{' flags and the conjunction
    ``passes`` (>= ``min_lines`` kept lines, no bad substrings).
    ``require_terminal_punct`` defaults off because the fixture corpus
    has no punctuation at all (the flag's count column keeps the rule
    observable); real-crawl profiles turn it on — it's the paper's
    first rule.

    Everything is length arithmetic and cheap per-element HOF lambdas
    over the derived line array — codegen'd, zero shuffle, one narrow
    pass (the same cost shape as gopher_quality)."""
    c = F.col(text_col)
    ls = F.split(break_into_lines(c, words_per_line), "\n")

    def wc(x):  # lines are single-spaced by construction
        return F.length(x) - F.length(F.replace(x, F.lit(" "), F.lit(""))) + 1

    def is_term(x):
        return x.rlike(r'[.!?"]$')

    def is_js(x):
        return F.contains(F.lower(x), F.lit("javascript"))

    def keep(x):
        k = (wc(x) >= min_line_words) & ~is_js(x)
        return k & is_term(x) if require_terminal_punct else k

    flat = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    has_lorem = F.contains(flat, F.lit("lorem ipsum"))
    has_brace = F.contains(c, F.lit("{"))
    n_kept = F.size(F.filter(ls, keep))
    ok_min_lines = n_kept >= min_lines
    return df.filter(F.length(F.trim(c)) > 0).select(
        "doc_id",
        F.size(ls).cast("bigint").alias("n_lines"),
        F.size(F.filter(ls, lambda x: wc(x) < min_line_words))
        .cast("bigint")
        .alias("n_short_lines"),
        F.size(F.filter(ls, is_js)).cast("bigint").alias("n_js_lines"),
        F.size(F.filter(ls, is_term)).cast("bigint").alias("n_term_lines"),
        n_kept.cast("bigint").alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        ok_min_lines.alias("ok_min_lines"),
        (ok_min_lines & ~has_lorem & ~has_brace).alias("passes"),
    )


def line_digests(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 10,
) -> DataFrame:
    """(id, line_no, h) — one 16-byte digest per derived line.  The
    narrow first pass of the line-dedup family: the line text is
    dropped before anything wide happens.  Composes ``derive_lines`` so
    the line derivation (filter, split, 1-based numbering) has exactly
    one definition."""
    return derive_lines(df, text_col, id_col, words_per_line).select(
        id_col, "line_no", F.md5("line").alias("h")
    )


def apply_line_removals(
    df: DataFrame,
    removals: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 10,
) -> DataFrame:
    """Rebuild cleaned text per doc from a removal set — ``removals``
    is (id, removed ARRAY<BIGINT> of line positions, n_rm).  Narrow
    codegen'd positional filter; the removal set (dup-sized) rides as
    a broadcast, so the document text never shuffles."""
    docs = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    ls = F.split(break_into_lines(text_col, words_per_line), "\n")
    removed = F.coalesce(F.col("removed"), F.array().cast("array<bigint>"))
    kept = F.filter(
        ls,
        lambda x, i: ~F.array_contains(removed, (i + 1).cast("bigint")),
    )
    return docs.join(F.broadcast(removals), id_col, "left").select(
        id_col,
        F.size(ls).cast("bigint").alias("n_lines"),
        F.coalesce(F.col("n_rm"), F.lit(0)).cast("bigint").alias("n_removed"),
        F.md5(F.array_join(kept, "\n")).alias("cleaned_hash"),
    )


def line_dedup_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 10,
) -> DataFrame:
    """Cross-document keep-first line dedup (CCNet/RefinedWeb paragraph
    pass): per doc returns ``n_lines``, ``n_removed``, and
    ``cleaned_hash`` = md5 of the doc with later-occurrence duplicate
    lines cut.  The line TEXT never shuffles: pass 1
    (:func:`line_digests`) explodes (id, line_no, md5(line)) triples
    and windows over the 16-byte digests; pass 2
    (:func:`apply_line_removals`) rebuilds the cleaned text narrowly.
    See q_line_dedup for the oracle-checked registration and
    q_streaming_line_index for the incremental first-occurrence-index
    twin."""
    from pyspark.sql import Window

    digests = line_digests(df, text_col, id_col, words_per_line)
    w = Window.partitionBy("h").orderBy(id_col, "line_no")
    removals = (
        digests.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") > 1)
        .groupBy(id_col)
        .agg(
            F.collect_list("line_no").alias("removed"),
            F.count(F.lit(1)).alias("n_rm"),
        )
    )
    return apply_line_removals(df, removals, text_col, id_col, words_per_line)


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    max_symbol_ratio: float = 0.1,
    min_stop: int = 2,
) -> DataFrame:
    """Gopher quality-rule metrics (Rae et al. 2021 §A1.1 — the rule
    set RedPajama/Dolma reimplement): per doc the word count, mean word
    length, alphabetic-word fraction, symbol-to-word ratio ('#' and
    '…'-as-'...'), and distinct-stopword presence, plus one boolean per
    rule and the conjunction ``passes``.  Defaults are the paper's
    thresholds; they're parameters because synthetic corpora need
    recalibration (the fixture's 100-word pool has ≤1 stopword per
    doc).  Line-based rules (bullet/ellipsis line fractions) are
    omitted: the fixture is single-line; they'd be two more
    length-diff expressions in this same select.

    Everything is array HOFs + length arithmetic on the split tokens —
    codegen'd, zero shuffle, one narrow pass (the cheap-per-element
    kind of HOF lambda, not the string-building kind)."""
    c = F.col(text_col)
    toks = F.split(F.trim(c), r"\s+")
    n_words = F.size(toks)
    mean_wl = F.aggregate(
        F.transform(toks, lambda x: F.length(x)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ) / n_words
    alpha_frac = (
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))) / n_words
    )
    sym = (
        (F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit(""))))
        + (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit(""))))
        / F.lit(3)
    ) / n_words
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)), stop_arr
        )
    )
    out = df.filter(F.length(F.trim(c)) > 0).select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        # raw IEEE doubles, deliberately unrounded: each is a division
        # of exact integers, bit-identical across engines (the
        # never-round-row-wise rule — rounding would ADD boundary risk)
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        sym.alias("symbol_ratio"),
        n_stop.cast("bigint").alias("n_stop"),
    )
    r_words = (F.col("n_words") >= min_words) & (
        F.col("n_words") <= max_words
    )
    r_wl = (F.col("mean_word_len") >= min_mean_word_len) & (
        F.col("mean_word_len") <= max_mean_word_len
    )
    # INCLUSIVE boundaries, matching Rae et al.'s removal rules (remove
    # when alpha fraction < 0.8 / symbol ratio > 0.1 → KEEP the exact
    # boundary): a doc with exactly 4/5 alphabetic words (0.8 is an
    # exact double) is kept by the paper and was wrongly dropped by the
    # previous strict comparison; the word-count/word-length rules were
    # already inclusive
    r_alpha = F.col("alpha_frac") >= min_alpha_frac
    r_sym = F.col("symbol_ratio") <= max_symbol_ratio
    r_stop = F.col("n_stop") >= min_stop
    return out.select(
        "*",
        r_words.alias("ok_words"),
        r_wl.alias("ok_word_len"),
        r_alpha.alias("ok_alpha"),
        r_sym.alias("ok_symbols"),
        r_stop.alias("ok_stop"),
        (r_words & r_wl & r_alpha & r_sym & r_stop).alias("passes"),
    )
