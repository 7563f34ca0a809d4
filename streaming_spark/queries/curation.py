"""Dataset-curation queries: sequence packing, chunking, deterministic
sampling, PII scrubbing, audio-style byte framing — the curation surface
of a 100 TB training-data pipeline, over the ``documents`` fixture.

Every query here is a pure-JVM plan (window functions / sequence
explodes / regexp), each with a DuckDB oracle.  The md5-order trick is
the engine's standard deterministic substitute for ``rand()``: stable
under task retry and identical across engines, so sampling and packing
are oracle-checkable exactly rather than statistically.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from streaming_spark.scratch import scratch_dir
from streaming_spark.operators import curation
from streaming_spark.queries.registry import T, query

# the exact whitespace token counter used by text_token_count's oracle
_TOKS_SQL = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)


@query(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_TOKS_SQL} AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS ord
      FROM documents),
    c AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY ord) AS cum
      FROM t)
    SELECT doc_id, source, n_tokens,
           CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack_no
    FROM c
    """,
)
def pack_sequences(spark, sf_dir):
    """Greedy contiguous sequence packing into 512-token context windows,
    parallel per source stratum (one bounded shuffle; no global sort —
    the per-shard packing layout 100 TB pipelines use)."""
    docs = T(spark, sf_dir, "documents")
    return curation.pack_sequences(docs, max_tokens=512)


@query(
    "pack_manifest",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_TOKS_SQL} AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS ord
      FROM documents),
    c AS (
      SELECT doc_id, source, n_tokens, ord,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY ord) AS cum
      FROM t),
    p AS (
      SELECT doc_id, source, n_tokens, ord,
             CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack_no,
             cum - n_tokens AS cum_before
      FROM c),
    o AS (
      SELECT doc_id, source, n_tokens, ord, pack_no,
             cum_before - min(cum_before) OVER (
               PARTITION BY source, pack_no) AS tok_offset
      FROM p)
    SELECT source, pack_no,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           array_to_string(list(doc_id ORDER BY ord), ',') AS doc_ids,
           array_to_string(list(tok_offset ORDER BY ord), ',') AS offsets
    FROM o GROUP BY source, pack_no
    """,
)
def pack_manifest(spark, sf_dir):
    """The PACK MANIFEST — what the training loader actually consumes
    one level below pack_sequences' per-doc assignment: per (source,
    pack), the ordered document list and each document's starting
    TOKEN OFFSET inside the concatenated window (exclusive running
    sum, pack-relative), plus doc/token totals.  Offsets come from
    window arithmetic (cum-before-doc minus the pack's minimum), not a
    per-pack fold, and the ordered lists are verified byte-for-byte by
    the oracle — so the exact concatenation layout is pinned, not just
    the membership.

    Scale: pack_sequences' one keyed shuffle + a second window over
    the SAME partitioning (no new exchange) + a per-pack fold whose
    group size is bounded by max_tokens."""
    docs = T(spark, sf_dir, "documents")
    packed = curation.pack_sequences(docs, max_tokens=512).select(
        "doc_id", "source", "n_tokens", "pack_no"
    )
    order = F.md5(F.col("doc_id").cast("string"))
    w_src = Window.partitionBy("source").orderBy(order)
    w_pack = Window.partitionBy("source", "pack_no")
    with_off = (
        packed.withColumn("ord", order)
        .withColumn(
            "cum_before",
            F.sum("n_tokens").over(w_src) - F.col("n_tokens"),
        )
        .withColumn(
            "offset",
            F.col("cum_before") - F.min("cum_before").over(w_pack),
        )
    )
    return with_off.groupBy("source", "pack_no").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "doc_id"))),
                lambda x: x["doc_id"].cast("string"),
            ),
            ",",
        ).alias("doc_ids"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "offset"))),
                lambda x: x["offset"].cast("string"),
            ),
            ",",
        ).alias("offsets"),
    )


@query(
    "pack_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_TOKS_SQL} AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS ord
      FROM documents),
    c AS (
      SELECT source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY ord) AS cum
      FROM t),
    p AS (
      SELECT source, n_tokens,
             CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS pack_no
      FROM c)
    SELECT source, pack_no, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
    FROM p GROUP BY source, pack_no
    """,
)
def pack_stats(spark, sf_dir):
    """Pack fill statistics (docs + tokens per pack) — the partial-agg
    rollup that monitors packing efficiency."""
    docs = T(spark, sf_dir, "documents")
    packed = curation.pack_sequences(docs, max_tokens=512)
    return curation.pack_stats(packed).select(
        "source",
        "pack_no",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("pack_tokens").cast("bigint").alias("pack_tokens"),
    )


@query(
    "text_chunk_split",
    oracle="""
    SELECT doc_id,
           CAST((gs.start - 1) / 160 AS INT) AS chunk_no,
           substring(text, gs.start, 200) AS chunk
    FROM documents,
    LATERAL (SELECT unnest(generate_series(
               1, greatest(length(text) - 40, 1), 160)) AS start) gs
    WHERE length(text) > 0
    """,
)
def text_chunk_split(spark, sf_dir):
    """Fixed-window document chunking: 200-char chunks, 40-char overlap
    (stride 160) — a JVM sequence explode, zero shuffles."""
    docs = T(spark, sf_dir, "documents")
    return curation.chunk_documents(docs, chunk_chars=200, overlap=40)


@query(
    "sample_stratified",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, lang,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
      FROM documents)
    SELECT doc_id, source, lang FROM r WHERE rn <= 50
    """,
)
def sample_stratified(spark, sf_dir):
    """Deterministic exact-k stratified sample: 50 docs per source by
    md5-of-id order (rerun-stable; one shuffle keyed by stratum)."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return curation.sample_stratified(docs, strata_col="source", k=50)


@query(
    "sample_uniform_hash",
    oracle="""
    SELECT doc_id, source
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <= '19999999'
    """,
)
def sample_uniform_hash(spark, sf_dir):
    """Shuffle-free deterministic ~10% uniform sample by md5 hash
    threshold — the filter pushes into the scan; the 100 TB default
    sampling path (no RNG state, no sort, cluster-size independent)."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    return curation.sample_uniform_hash(docs, fraction=0.1)


@query(
    "text_pii_scrub",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\d{3}[-. ]\d{3}[-. ]\d{4}', '<PHONE>', 'g') AS scrubbed,
             text
      FROM documents)
    SELECT doc_id, scrubbed, (scrubbed <> text) AS had_pii FROM s
    """,
)
def text_pii_scrub(spark, sf_dir):
    """Email/phone scrub with typed placeholders (RE2-safe patterns so
    Spark and DuckDB agree byte for byte); flags touched rows.  Pure
    regexp_replace — codegen'd, no shuffle."""
    docs = T(spark, sf_dir, "documents")
    return curation.scrub_pii(docs, "text").select("doc_id", "scrubbed", "had_pii")


@query(
    "audio_frame_windows",
    oracle="""
    WITH b AS (
      SELECT doc_id AS id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents WHERE doc_id % 20 = 0 AND length(text) > 0)
    SELECT id,
           CAST((gs.start - 1) / 32 AS INT) AS frame_no,
           substring(hx, (gs.start - 1) * 2 + 1, 128) AS frame_hex,
           CAST(length(substring(hx, (gs.start - 1) * 2 + 1, 128)) / 2 AS INT)
             AS frame_len
    FROM b,
    LATERAL (SELECT unnest(generate_series(1, greatest(n - 32, 1), 32)) AS start) gs
    """,
)
def audio_frame_windows(spark, sf_dir):
    """Overlapping byte framing over binary blobs (64-byte frames,
    32-byte hop — the STFT frame/hop shape).  Frames stay opaque bytes;
    the oracle compares hex because DuckDB lacks blob substring.  JVM
    sequence explode, no shuffle, no Python."""
    from streaming_spark.operators import multimodal

    docs = T(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 20 == 0) & (F.length("text") > 0)
    )
    blobs = multimodal.to_blob(docs, text_col="text", id_col="doc_id")
    frames = curation.frame_windows(blobs, frame_bytes=64, hop_bytes=32)
    return frames.select(
        "id",
        "frame_no",
        F.hex("frame").alias("frame_hex"),
        "frame_len",
    )


@query(
    "layout_sorted_write",
    oracle="""
    SELECT CAST(8 AS BIGINT) AS n_files,
           CAST(count(*) AS BIGINT) AS total_rows,
           CAST(true AS BOOLEAN) AS all_disjoint
    FROM lineitem
    """,
)
def layout_sorted_write(spark, sf_dir):
    """Write-side layout optimization end-to-end: lineitem is
    materialized as 8 parquet files range-partitioned + sorted on
    l_orderkey (one sampled range shuffle), then read back and checked —
    every file owns a DISJOINT key range (the property that lets parquet
    footer min/max stats skip whole files on selective range scans).
    The disjointness proof is computed Spark-side over the per-file
    min/max; the oracle pins file count and row conservation."""

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    out_dir = scratch_dir("layout") + "/t"
    curation.write_sorted_layout(li, out_dir, "l_orderkey", n_files=8)
    stats = curation.layout_file_stats(spark, out_dir, "l_orderkey")
    return stats.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("rows").alias("total_rows"),
        F.min("disjoint").alias("all_disjoint"),
    )


@query(
    "sample_domain_mix",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
      FROM documents)
    SELECT source, CAST(count(*) AS BIGINT) AS n FROM r
    WHERE (source = 'src0' AND rn <= 30)
       OR (source = 'src1' AND rn <= 10)
       OR (source = 'src2' AND rn <= 20)
    GROUP BY source
    """,
)
def sample_domain_mix(spark, sf_dir):
    """Domain-mix resampling toward a target mixture (30/10/20 docs from
    three of the fixture's src strata; other sources dropped) — exact-k
    deterministic md5-order draws per stratum, the rebalancing step of a
    training-mixture pipeline."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    mixed = curation.sample_domain_mix(
        docs, {"src0": 30, "src1": 10, "src2": 20}
    )
    return mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n"))


@query(
    "pack_sequences_bpe",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE list_sum(list_transform(
                         string_split_regex(trim(text), '\\s+'),
                         t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) END
               AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS ord
      FROM documents),
    c AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY ord) AS cum
      FROM t)
    SELECT doc_id, source, n_tokens,
           CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS pack_no
    FROM c
    """,
)
def pack_sequences_bpe(spark, sf_dir):
    """Tokenizer-cost sequence packing: same greedy per-stratum packing
    but budgeted in BPE-ish sub-word pieces (ceil(len/4) per word) into
    2048-piece context windows — the packing a real pretraining loader
    does.  A real tokenizer slots in behind the same column contract."""
    from streaming_spark.operators.text import bpe_ish_token_count

    docs = T(spark, sf_dir, "documents")
    return curation.pack_sequences(
        docs, max_tokens=2048, token_counter=bpe_ish_token_count
    )


def _spread16_sql(e: str) -> str:
    """DuckDB-side twin of operators.curation._spread_bits16 — generated
    from the same mask sequence so both engines compute identical Morton
    codes.  The BIGINT cast mirrors the Spark twin's bigint widening:
    without it DuckDB keeps INT32 arithmetic and the final ``<< 1`` of
    the y-dimension hard-errors ("Overflow in left shift") whenever the
    input has bit 15 set (any suppkey domain ≥ 32768 — latent on the
    small fixtures, certain at real TPC-H scale factors)."""
    e = f"(CAST(({e}) & 65535 AS BIGINT))"
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        e = f"(((({e}) << {shift}) | ({e})) & {mask})"
    return e


_Z_SQL = (
    f"({_spread16_sql('l_partkey % 65536')}"
    f" | ({_spread16_sql('l_suppkey % 65536')} << 1))"
)


@query(
    "q_zorder_values",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST({_Z_SQL} AS BIGINT) AS zval
    FROM lineitem
    """,
)
def q_zorder_values(spark, sf_dir):
    """Morton (Z-order) codes over (partkey, suppkey) — exact-integer
    bit interleaving verified cross-engine (the Spark column expression
    and the DuckDB oracle are generated from the same mask sequence).
    This is the sort key behind write_zorder_layout; all codegen, no
    Python."""
    from streaming_spark.operators.curation import zvalue2

    li = T(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zvalue2(F.col("l_partkey") % 65536, F.col("l_suppkey") % 65536)
        .cast("bigint")
        .alias("zval"),
    )


@query("layout_zorder_pruning")  # rows-only: file placement is
# engine-internal; the z-beats-linear locality contract is asserted in
# tests/test_curation.py::test_zorder_clusters_better_than_linear
def layout_zorder_pruning(spark, sf_dir):
    """Why Z-order: lineitem is written twice — 16 files sorted by
    l_partkey alone, and 16 files z-ordered on (partkey, suppkey) — then
    a SUPPKEY-range query (the column the linear layout does NOT serve)
    is run against both and we count how many files hold matches.
    Under the linear layout the matches smear across ~every file; under
    z-order they cluster into ~sqrt(selectivity) of the curve, so
    file-statistics pruning (parquet footer min/max, or a lakehouse
    manifest) can skip most of the data.  Matched-row counts must be
    identical — layout never changes semantics."""

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    base = scratch_dir("zorder")
    lin_dir, z_dir = base + "/linear", base + "/zorder"
    curation.write_sorted_layout(li, lin_dir, "l_partkey", n_files=16)
    curation.write_zorder_layout(
        li, z_dir, "l_partkey", "l_suppkey", n_files=16
    )
    # a ~15%-of-domain suppkey band — selective on the y dim, at any SF
    from streaming_spark.telemetry import scan_files_rows

    mm = li.agg(F.min("l_suppkey").alias("lo"), F.max("l_suppkey").alias("hi")).first()
    span = max(mm.hi - mm.lo, 1)
    lo, hi = mm.lo + int(0.40 * span), mm.lo + int(0.55 * span)

    def probe(path, layout):
        hits = spark.read.parquet(path).filter(
            F.col("l_suppkey").between(lo, hi)
        )
        return scan_files_rows(hits).select(
            F.lit(layout).alias("layout"),
            F.col("files").alias("files_with_matches"),
            F.col("rows").alias("rows_matched"),
        )

    return probe(lin_dir, "linear").unionByName(probe(z_dir, "zorder"))


@query(
    "pipeline_curate_corpus",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, text,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text), '\\s+') END AS toks
      FROM documents),
    h AS (
      SELECT doc_id, source, text, len(toks) AS n_tokens,
             len(list_filter(toks, t -> t IN ('the','a','of','and','to','is'))) AS hits_en,
             len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein'))) AS hits_de,
             len(list_filter(toks, t -> t IN ('le','la','et','les','des','un'))) AS hits_fr,
             len(list_filter(toks, t -> t IN ('el','los','y','una','este','por'))) AS hits_es
      FROM t),
    lang AS (
      SELECT doc_id, source, text, n_tokens,
             CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) <= 0 THEN 'unknown'
                  WHEN hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'en'
                  WHEN hits_de = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'de'
                  WHEN hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'fr'
                  ELSE 'es' END AS pred_lang
      FROM h),
    filtered AS (
      SELECT doc_id, source, text FROM lang
      WHERE pred_lang = 'en' AND n_tokens >= 20),
    deduped AS (
      SELECT doc_id, source, text FROM (
        SELECT doc_id, source, text,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM filtered)
      WHERE rn = 1),
    chunks AS (
      SELECT doc_id, source,
             substring(text, gs.start, 200) AS chunk
      FROM deduped,
      LATERAL (SELECT unnest(generate_series(
                 1, greatest(length(text) - 40, 1), 160)) AS start) gs
      WHERE length(text) > 0)
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_kept,
           count(*) AS n_chunks,
           CAST(sum(length(chunk)) AS BIGINT) AS sum_chunk_chars
    FROM chunks GROUP BY source
    """,
)
def pipeline_curate_corpus(spark, sf_dir):
    """The training-data curation pipeline END TO END, one declarative
    plan: language-ID filter (stopword vote = 'en') → quality gate
    (≥ 20 tokens) → exact dedup keep-one (min doc_id per content
    digest) → 200/40 overlap chunking → per-source rollup.  Every stage
    is also a registered standalone query; composing them stays fully
    oracle-checkable because each stage is deterministic SQL.

    Scale shape: lang-ID + quality are codegen'd scan-stage expressions
    (no shuffle); dedup is ONE shuffle of (digest, id, source, text);
    chunking is a narrow explode that carries source through (no
    join-back — see chunk_documents carry_cols); the rollup
    partial-aggregates to source cardinality.  Total: two shuffles for
    the whole pipeline."""
    from streaming_spark.operators.text import token_count, with_lang_scores

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    en = (
        with_lang_scores(docs, "text")
        .filter(F.col("pred_lang") == "en")
        .filter(token_count("text") >= 20)
        .select("doc_id", "source", "text")
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        en.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    chunks = curation.chunk_documents(
        deduped, chunk_chars=200, overlap=40, carry_cols=("source",)
    )
    return chunks.groupBy("source").agg(
        F.countDistinct("doc_id").alias("docs_kept"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.length("chunk")).alias("sum_chunk_chars"),
    )


@query(
    "text_decontaminate",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text), '\\s+') END AS toks
      FROM documents),
    g AS (
      SELECT doc_id, source,
             list_transform(range(1, len(toks) - 3),
                            i -> array_to_string(toks[i:i+4], ' ')) AS grams
      FROM t),
    b AS (
      SELECT DISTINCT gram
      FROM g, UNNEST(grams) AS u(gram)
      WHERE doc_id % 97 = 0),
    hits AS (
      SELECT g.doc_id, count(DISTINCT gram) AS n_hits
      FROM g, UNNEST(grams) AS u(gram)
      WHERE doc_id % 97 <> 0 AND gram IN (SELECT gram FROM b)
      GROUP BY g.doc_id)
    SELECT g.doc_id, g.source,
           CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(hits.n_hits, 0) > 0 AS contaminated
    FROM g LEFT JOIN hits USING (doc_id)
    WHERE g.doc_id % 97 <> 0
    """,
)
def text_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag corpus documents sharing any word
    5-gram with a held-out benchmark set (here the deterministic
    doc_id % 97 slice stands in for the eval suite).

    Scale plan: the benchmark side is always small (eval suites are
    megabytes against a 100 TB corpus), so its distinct 5-gram set is
    BROADCAST; corpus n-grams are generated in-line (narrow) and probed
    against the broadcast hash — the only exchange is the per-doc hit
    aggregate, which carries (doc_id, gram) for MATCHING grams only.
    Raw text never shuffles."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return decontaminate_flags(docs, F.col("doc_id") % 97 == 0)


def _grams_of(side, n: int = 5):
    """Word n-gram frame (doc_id, grams) — filter callers filter BEFORE
    this NGram transform: the Scala UDF blocks predicate pushdown, so
    filtering the transformed frame would build grams for both sides
    twice."""
    from streaming_spark.operators.text import tokens_col, with_word_ngrams

    return with_word_ngrams(
        side.select("doc_id", tokens_col("text").alias("toks")),
        "toks",
        n,
        "grams",
    ).select("doc_id", "grams")


def benchmark_grams(bench_docs, n: int = 5):
    """Distinct word ``n``-gram set of a benchmark slice — the small
    broadcast side of every decontamination probe (eval suites are
    megabytes against a 100 TB corpus)."""
    return (
        _grams_of(bench_docs, n)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )


def decontaminate_against(corpus, bench_grams, n: int = 5):
    """Flag ``corpus`` docs sharing any word ``n``-gram with the
    prebuilt ``bench_grams`` set (see :func:`benchmark_grams`).  The
    per-doc flags depend only on the doc and the static benchmark set —
    which is what makes the operator INCREMENTAL: any partition of the
    corpus (a micro-batch, an ingest delta) can be flagged
    independently and the union equals the whole-corpus run
    (q_streaming_decontaminate exercises exactly that)."""
    hits = (
        _grams_of(corpus, n)
        .select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_hits"))
    )
    return (
        corpus.select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0).cast("long")) > 0).alias("contaminated"),
        )
    )


def decontaminate_flags(docs, bench_pred, n: int = 5):
    """Decontamination core (see text_decontaminate): flag docs sharing
    any word ``n``-gram with the slice selected by ``bench_pred``."""
    return decontaminate_against(
        docs.filter(~bench_pred), benchmark_grams(docs.filter(bench_pred), n), n
    )


@query(
    "text_normalize",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(
                  regexp_replace(lower(text), '[\\x00-\\x1f\\x7f]', '', 'g'),
                  '\\s+', ' ', 'g')) AS norm_text
      FROM documents)
    SELECT n.doc_id, n.norm_text,
           length(n.norm_text) AS n_chars_norm,
           n.norm_text <> d.text AS changed
    FROM n JOIN documents d USING (doc_id)
    """,
)
def text_normalize(spark, sf_dir):
    """Text normalization: lowercase, strip control characters, collapse
    whitespace runs, trim — the canonical pre-dedup canonicalization pass
    (exact dedup hashes the NORMALIZED text so formatting variants
    collapse).

    All three rewrites are JVM regexp/string builtins — narrow,
    codegen'd, zero shuffle; the plan is a scan→project at any scale.
    (Unicode NFC folding would slot in here too; Spark lacks a builtin,
    so it would ride the same Arrow-batch map as `fingerprint` — left
    out rather than dropping to Python for ASCII fixtures.)"""
    from streaming_spark.operators.text import normalize_text_col

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    norm = normalize_text_col("text")
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).alias("n_chars_norm"),
        (norm != F.col("text")).alias("changed"),
    )


def _es_uniform_key():
    """Efraimidis-Spirakis uniform key, shared by the two weighted
    samplers: the first 8 md5 hex chars of doc_id as a 32-bit fraction,
    floored at 2^-33 so ln(u) stays finite on BOTH engines — DuckDB's
    ln(0) hard-errors while Spark's log(0) null-sorts, so an md5 prefix
    of 8 zero hex chars (p = 2^-32 per doc: latent at fixture scale,
    expected at billions of docs) would crash the oracle while the
    engine silently mis-ranked.  The DuckDB twin (same greatest/2^-33
    floor, exactly representable) is inlined in both queries' oracles —
    keep all three in lockstep."""
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    return F.greatest(u, F.lit(2.0 ** -33))


@query(
    "sample_weighted",
    oracle="""
    WITH k AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS weight,
             greatest(CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                      1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0,
                      power(2.0, -33)) AS u
      FROM documents)
    SELECT doc_id, source, weight
    FROM k
    WHERE weight > 0
    ORDER BY ln(u) / weight DESC, doc_id
    LIMIT 100
    """,
)
def sample_weighted(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    each doc draws a deterministic uniform u from md5(doc_id) and ranks
    by ln(u)/weight — the top-k under that key is an exact weighted
    sample, here weighted by token count (longer docs proportionally
    likelier).

    Deterministic u makes the sample reproducible under retry AND
    oracle-checkable exactly — same reason the engine's uniform sampler
    uses md5 order instead of rand().  Scale plan: no global sort;
    Spark's top-k is TakeOrderedAndProject (per-partition heaps, merge
    of k·partitions rows).  One pass, no shuffle of the data itself."""
    from streaming_spark.operators.text import token_count

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    u = _es_uniform_key()
    keyed = docs.select(
        "doc_id",
        "source",
        token_count("text").alias("weight"),
        u.alias("u"),
    ).filter(F.col("weight") > 0)
    return (
        keyed.orderBy(
            (F.log("u") / F.col("weight")).desc(), F.col("doc_id")
        )
        .select("doc_id", "source", "weight")
        .limit(100)
    )


@query(
    "pipeline_pretraining_sample",
    oracle="""
    WITH n AS (
      SELECT doc_id, source,
             trim(regexp_replace(
                  regexp_replace(lower(text), '[\\x00-\\x1f\\x7f]', '', 'g'),
                  '\\s+', ' ', 'g')) AS text
      FROM documents),
    k AS (
      SELECT doc_id, source, text,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
      FROM n),
    surv AS (SELECT doc_id, source, text FROM k WHERE doc_id = keep_id),
    t AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text), '\\s+') END AS toks
      FROM surv),
    g AS (
      SELECT doc_id, source, len(toks) AS weight,
             list_transform(range(1, len(toks) - 3),
                            i -> array_to_string(toks[i:i+4], ' ')) AS grams
      FROM t),
    b AS (
      SELECT DISTINCT gram FROM g, UNNEST(grams) AS u(gram)
      WHERE doc_id % 97 = 0),
    hits AS (
      SELECT DISTINCT g.doc_id FROM g, UNNEST(grams) AS u(gram)
      WHERE doc_id % 97 <> 0 AND gram IN (SELECT gram FROM b)),
    clean AS (
      SELECT g.doc_id, g.source, g.weight
      FROM g LEFT JOIN hits USING (doc_id)
      WHERE g.doc_id % 97 <> 0 AND hits.doc_id IS NULL AND g.weight > 0),
    keyed AS (
      SELECT doc_id, source, weight,
             greatest(CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                      1, 8)) AS BIGINT) AS DOUBLE) / 4294967296.0,
                      power(2.0, -33)) AS u
      FROM clean)
    SELECT doc_id, source, weight
    FROM keyed
    ORDER BY ln(u) / weight DESC, doc_id
    LIMIT 50
    """,
)
def pipeline_pretraining_sample(spark, sf_dir):
    """End-to-end pretraining-mix pipeline #2, composing the round-2
    curation operators: normalize → exact dedup keep-one (on the
    NORMALIZED text, so formatting variants collapse) → benchmark
    decontamination (drop any survivor sharing a 5-gram with the
    held-out slice) → weighted sample of 50 docs (longer docs
    proportionally likelier, deterministic Efraimidis–Spirakis keys).

    Shuffle budget at 100 TB: dedup's digest window (1 fact shuffle),
    decontamination's matching-grams aggregate (tiny — matching grams
    only, benchmark side broadcast), the final top-k
    (TakeOrderedAndProject, k·partitions rows).  Raw text shuffles
    exactly once (the dedup exchange) and never leaves the cluster."""
    from streaming_spark.operators.text import (
        normalize_text_col,
        token_count,
    )

    docs = T(spark, sf_dir, "documents").select(
        "doc_id", "source", normalize_text_col("text").alias("text")
    )
    w_dig = Window.partitionBy(F.md5("text"))
    surv = (
        docs.withColumn("keep_id", F.min("doc_id").over(w_dig))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "source", "text")
    )
    flags = decontaminate_flags(surv, F.col("doc_id") % 97 == 0)
    clean = flags.filter(~F.col("contaminated")).select("doc_id", "source")
    u = _es_uniform_key()
    keyed = (
        clean.join(surv.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "source",
            token_count("text").alias("weight"),
            u.alias("u"),
        )
        .filter(F.col("weight") > 0)
    )
    return (
        keyed.orderBy((F.log("u") / F.col("weight")).desc(), F.col("doc_id"))
        .select("doc_id", "source", "weight")
        .limit(50)
    )


@query(
    "sample_temperature_mix",
    oracle="""
    WITH counts AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source),
    shares AS (
      SELECT source, n,
             pow(n, 0.5) / sum(pow(n, 0.5)) OVER () AS share
      FROM counts),
    quotas AS (
      SELECT source, n, CAST(round(200 * share) AS BIGINT) AS quota
      FROM shares),
    ranked AS (
      SELECT d.doc_id, d.source,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY md5(CAST(d.doc_id AS VARCHAR)))
               AS rn
      FROM documents d)
    SELECT r.source,
           CAST(count(*) AS BIGINT) AS n_sampled,
           any_value(q.quota) AS quota
    FROM ranked r JOIN quotas q USING (source)
    WHERE r.rn <= q.quota
    GROUP BY r.source
    """,
)
def sample_temperature_mix(spark, sf_dir):
    """Temperature-flattened domain mixture (τ = 0.5): each source's
    quota in a 200-doc sample is proportional to count^τ — the standard
    rebalancing that upweights small domains without drowning large
    ones (τ=1 keeps natural proportions, τ=0 is uniform).  Draws are
    exact-k deterministic md5-order per stratum.

    Scale plan: quotas come from a per-source count aggregate (one
    partial-agg'd shuffle collapsing to |sources| rows, broadcast
    back); the draw is one rank-window shuffle keyed by source.  The
    natural-vs-target mixture never needs a second pass over the
    data."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    total_share = counts.agg(
        F.sum(F.pow("n", 0.5)).alias("denom")
    )
    quotas = (
        counts.crossJoin(F.broadcast(total_share))
        .select(
            "source",
            F.round(200 * F.pow("n", 0.5) / F.col("denom"))
            .cast("long")
            .alias("quota"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    ranked = docs.withColumn("rn", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quotas), "source")
        .filter(F.col("rn") <= F.col("quota"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.first("quota").alias("quota"),
        )
    )


@query("layout_compact")  # rows-only: file counts/bytes depend on
# parquet encoding internals; row preservation + file-count reduction
# are pinned in tests/test_curation.py::test_compact_files_reduces_file_count
def layout_compact(spark, sf_dir):
    """Small-files compaction as a registered maintenance pass: the
    documents table is staged as 24 undersized files (the shape a
    micro-batch sink leaves behind), compacted to ~256 KiB targets, and
    the one-row stats frame reports files/bytes before and after — the
    observability a table-maintenance job emits.  coalesce path (no
    exchange); see operators/curation.py compact_files for the
    shuffle=True variant and the per-partition deployment note."""

    from streaming_spark.operators.curation import compact_files

    base = scratch_dir("compact")
    src, dst = base + "/small", base + "/compacted"
    T(spark, sf_dir, "documents").repartition(24).write.mode(
        "overwrite"
    ).parquet(src)
    return compact_files(spark, src, dst, target_bytes=256 * 1024)


@query("pipeline_tokenizer_pack")  # rows-only: pack budgets come from
# the learned byte-level BPE tokenizer (iterative fixed point, no SQL
# oracle); conservation/determinism contracts in
# tests/test_curation.py::test_pipeline_tokenizer_pack_contracts
def pipeline_tokenizer_pack(spark, sf_dir):
    """Composed pipeline #3 — tokenizer-aware curation: exact-dedup
    keep-one → train a byte-level BPE tokenizer on the SURVIVORS →
    re-count every kept document in real subword tokens → pack into
    512-token context windows budgeted by those counts → per-pack fill
    stats.  This is the shape that turns a raw corpus into training
    batches: packing by whitespace words (pack_sequences' default)
    misbudgets the context window wherever tokenization diverges from
    whitespace; packing by the ACTUAL tokenizer's counts is what the
    training loader needs.

    Scale: dedup is one digest shuffle; BPE training is one word-count
    shuffle + bounded driver merge learning; encode is shuffle-free with
    broadcast ranks; packing is one bounded per-stratum window — four
    exchanges end to end, none carrying raw text except the dedup
    digest pass's ids."""
    from streaming_spark.operators.bpe import bpe_encode_counts, bpe_train
    from streaming_spark.operators.curation import pack_sequences, pack_stats

    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    keep = (
        docs.groupBy(F.md5("text").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = docs.join(keep, "doc_id")
    merges, _ = bpe_train(kept, n_merges=200, max_words=50_000, byte_level=True)
    counts = bpe_encode_counts(kept, merges, byte_level=True).select(
        "doc_id", "n_bpe_tokens"
    )
    with_counts = kept.join(counts, "doc_id")
    packed = pack_sequences(
        with_counts,
        max_tokens=512,
        token_counter=lambda _: F.col("n_bpe_tokens"),
    )
    return pack_stats(packed).orderBy("source", "pack_no")


@query(
    "q_token_budget_plan",
    oracle=f"""
    WITH src AS (
      SELECT source, CAST(sum({_TOKS_SQL}) AS BIGINT) AS total_tokens
      FROM documents GROUP BY source),
    wts AS (
      SELECT source, total_tokens,
             pow(total_tokens, 0.7)
               / sum(pow(total_tokens, 0.7)) OVER () AS weight
      FROM src)
    SELECT source, total_tokens,
           round(weight, 6) AS weight,
           CAST(round(weight * 100000) AS BIGINT) AS target_tokens,
           round(weight * 100000 / total_tokens, 6) AS epochs,
           round(least(weight * 100000 / total_tokens, 1.0), 6)
             AS sample_rate
    FROM wts
    """,
)
def q_token_budget_plan(spark, sf_dir):
    """Training-data recipe planning: given per-source token mass and a
    temperature-flattened target mixture (weight ∝ tokens^0.7, the
    standard upsampling of small high-quality sources), allocate a
    100k-token budget — per source: target tokens, EPOCHS (passes over
    the source; >1 means repetition, the quantity every data-recipe
    review reads first), and the sampling rate a single-pass loader
    would use.  The planning twin of sample_temperature_mix: that query
    draws the documents, this one produces the budget sheet the draw is
    justified by.

    Plan: one partial-agg'd shuffle to per-source token mass (sources
    are few), then the normalizer joins back as a broadcast ONE-ROW
    global aggregate (not a global window — the registry plan gate
    rejects unpartitioned windows over data-derived frames, and the
    single-row cross join is the better plan anyway)."""
    from streaming_spark.operators.text import token_count

    docs = T(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(token_count("text")).alias("total_tokens")
    )
    total = src.agg(
        F.sum(F.pow("total_tokens", 0.7)).alias("__z")
    )
    src = src.crossJoin(F.broadcast(total))
    weight = F.pow("total_tokens", 0.7) / F.col("__z")
    budget = 100_000
    return src.select(
        "source",
        "total_tokens",
        F.round(weight, 6).alias("weight"),
        F.round(weight * budget).cast("bigint").alias("target_tokens"),
        F.round(weight * budget / F.col("total_tokens"), 6).alias("epochs"),
        F.round(
            F.least(weight * budget / F.col("total_tokens"), F.lit(1.0)), 6
        ).alias("sample_rate"),
    )


@query("pipeline_cluster_pack")  # rows-only: the k-means cells inside
# are the fixed point of a distributed iteration (no SQL form); the
# end-to-end contracts (per-cluster quota, pack fill bounds,
# determinism) are pinned in tests/test_curation.py::
# test_pipeline_cluster_pack_contract
def pipeline_cluster_pack(spark, sf_dir):
    """Composed pipeline #4 — SEMANTIC curation: full-corpus spherical
    k-means over the embedding table → cluster-balanced quota sample
    (≤20 docs per cell, md5 order) → real-BPE token recount of the
    sampled documents → pack into 512-token context windows PER CLUSTER
    → per-(cell, pack) fill stats.  The cluster-aware counterpart of
    pipeline_tokenizer_pack: instead of deduping then packing the whole
    corpus, it builds a semantically BALANCED training slice (no domain
    dominates) and packs within each semantic bucket, so a training
    batch drawn from one pack stays topically coherent.

    Scale: k-means passes are shuffle-free partial-sum maps; the quota
    is quota_sample_per_group's two-phase bounded top-k (not a per-cell
    window); the BPE recount is a shuffle-free broadcast-rank encode
    (merges reuse the session-memoized tokenizer); packing windows only
    the ≤ 20-doc per-cell sample; stats are one partial-agg shuffle."""
    from streaming_spark.operators.bpe import bpe_encode_counts
    from streaming_spark.operators.curation import (
        pack_sequences,
        pack_stats,
        quota_sample_per_group,
    )
    from streaming_spark.operators.similarity import spherical_kmeans_full
    from streaming_spark.queries.northstar import _trained_bpe

    emb = T(spark, sf_dir, "embeddings")
    _, assign = spherical_kmeans_full(emb, dim=64, k=8, n_iters=2)
    sampled = quota_sample_per_group(assign, "cell", "vec_id", quota=20).select(
        F.col("vec_id").alias("doc_id"), "cell"
    )
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    picked = docs.join(sampled, "doc_id")
    merges, _ = _trained_bpe(spark, sf_dir)
    counts = bpe_encode_counts(picked, merges).select("doc_id", "n_bpe_tokens")
    with_counts = picked.join(counts, "doc_id")
    packed = pack_sequences(
        with_counts,
        group_col="cell",
        max_tokens=512,
        token_counter=lambda _: F.col("n_bpe_tokens"),
    )
    return pack_stats(packed, group_col="cell").orderBy("cell", "pack_no")


@query("pipeline_span_clean_pack")  # rows-only: dup-span filtering uses
# engine-internal rolling hashes for candidates and the pack budgets
# come from the learned unigram tokenizer (iterative fixed point); the
# filter-exactness / conservation / determinism contracts are in
# tests/test_curation.py::test_pipeline_span_clean_pack_contracts
def pipeline_span_clean_pack(spark, sf_dir):
    """Composed pipeline #5 — span-level curation: measure each
    document's duplicated-span fraction (exact cross-doc 40-char spans,
    northstar._dup_window_positions) → DROP documents that are mostly
    duplicated material (dup fraction > 0.5 — boilerplate/mirror pages,
    the Lee et al. 2022 failure class whole-doc dedup misses) → train
    the unigram-LM tokenizer on the SURVIVORS → re-count in real
    subword tokens → pack into 512-token windows.  Training the
    tokenizer after span cleaning matters: duplicated boilerplate
    otherwise dominates the word-frequency statistic and buys vocabulary
    space for text the filter was about to remove.

    Scale: the span pass is the q_dup_spans plan (rolling hashes, one
    hash groupBy, candidate-only exact verify); the filter is a
    broadcast-size join of flagged doc_ids against the corpus; unigram
    training is one word-count shuffle + bounded driver EM; encode is
    shuffle-free; packing is one bounded per-source window."""
    from streaming_spark.operators.curation import pack_sequences, pack_stats
    from streaming_spark.operators.unigram import (
        unigram_encode_counts,
        unigram_train,
    )
    from streaming_spark.queries.northstar import _dup_window_positions

    width = 40
    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    measurable = docs.filter(F.length("text") >= width)
    dup_counts = (
        _dup_window_positions(measurable.select("doc_id", "text"), width)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    flagged = (
        measurable.join(dup_counts, "doc_id")
        .filter(
            F.col("n_dup")
            > 0.5 * (F.length("text") - width + 1)
        )
        .select("doc_id")
    )
    kept = docs.join(flagged, "doc_id", "left_anti")
    pieces, _ = unigram_train(kept, vocab_size=256)
    counts = unigram_encode_counts(kept, pieces)
    with_counts = kept.join(counts, "doc_id")
    packed = pack_sequences(
        with_counts,
        max_tokens=512,
        token_counter=lambda _: F.col("n_unigram_tokens"),
    )
    return pack_stats(packed).orderBy("source", "pack_no")


@query(
    "q_group_split",
    oracle="""
    WITH tagged AS (
      SELECT user_id, event_id,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 8)
                       <= 'cccccccb'
                  THEN 'train' ELSE 'test' END AS split
      FROM events),
    per_split AS (
      SELECT split, count(DISTINCT user_id) AS n_users,
             count(*) AS n_events
      FROM tagged GROUP BY split),
    leak AS (
      SELECT count(*) AS n_leaked_users FROM (
        SELECT user_id FROM tagged
        GROUP BY user_id HAVING count(DISTINCT split) > 1))
    SELECT p.split, p.n_users, p.n_events, l.n_leaked_users
    FROM per_split p, leak l
    ORDER BY split
    """,
)
def q_group_split(spark, sf_dir):
    """GROUP-aware train/test split: every event of a user lands in the
    same split (~80/20 by md5-of-user threshold) — the leakage-safe
    version of q_train_test_split's row split (row-level splitting puts
    one user's history on both sides, letting a model memorize users
    instead of generalizing).  The split is a pure hash of the GROUP
    key: shuffle-free, RNG-free, cluster-size independent, and stable
    as new events for a known user arrive (an ingest can't migrate a
    user between splits).  The output carries its own audit:
    n_leaked_users counts users seen in both splits and is ZERO by
    construction — checked row-for-row by the oracle."""
    from streaming_spark.queries.registry import events_table

    tagged = events_table(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8)
            <= "cccccccb",
            "train",
        )
        .otherwise("test")
        .alias("split"),
    )
    per_split = tagged.groupBy("split").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    leak = (
        tagged.groupBy("user_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n_leaked_users"))
    )
    return per_split.crossJoin(F.broadcast(leak)).orderBy("split")


@query("layout_partitioned_pruning")  # rows-only: file/directory
# placement is engine-internal; the pruning contract (filtered read
# touches ONLY the matching partition directory, plan shows the
# partition filter) is asserted in tests/test_curation.py::
# test_partitioned_layout_prunes_directories
def layout_partitioned_pruning(spark, sf_dir):
    """Directory (Hive-style) partitioning — the FIRST layout tool at
    100 TB, before z-order or file sorting: events are written
    partitioned by event_type, then one type is read back filtered.
    Partition pruning happens at PLANNING time from directory names —
    the non-matching directories are never listed into the scan, so
    the saving is IO-proportional and needs no file statistics at all
    (z-order/sorted layouts then prune WITHIN what directory
    partitioning left).  Emits, per layout, the files actually touched
    by the filtered read and the matched rows: the unpartitioned
    baseline reads every file; the partitioned read touches only the
    one directory.  Row counts must be identical — layout never
    changes semantics."""

    from streaming_spark.queries.registry import events_table

    ev = events_table(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    base = scratch_dir("hivepart")
    flat_dir, part_dir = base + "/flat", base + "/by_type"
    ev.repartition(8).write.mode("overwrite").parquet(flat_dir)
    (
        ev.repartition("event_type")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(part_dir)
    )
    from streaming_spark.telemetry import scan_files_rows

    target = ev.groupBy("event_type").count().orderBy("event_type").first()[0]

    def probe(path, layout):
        hits = spark.read.parquet(path).filter(
            F.col("event_type") == target
        )
        return scan_files_rows(hits).select(
            F.lit(layout).alias("layout"),
            F.col("files").alias("files_read"),
            F.col("rows").alias("rows_matched"),
        )

    return probe(flat_dir, "flat").unionByName(probe(part_dir, "partitioned"))


@query(
    "q_negative_pairs",
    oracle="""
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    anchors AS (
      SELECT doc_id AS anchor_id FROM documents WHERE doc_id % 25 = 0),
    cand AS (
      SELECT anchor_id, CAST(j.j AS INT) AS j,
             (anchor_id * 2654435761 + j.j * 40503)
               % (SELECT n_docs FROM n) AS neg_id
      FROM anchors, (SELECT unnest(range(0, 3)) AS j) j)
    SELECT anchor_id, j, neg_id
    FROM cand JOIN documents d ON d.doc_id = cand.neg_id
    WHERE neg_id <> anchor_id
    ORDER BY anchor_id, j
    """,
)
def q_negative_pairs(spark, sf_dir):
    """Deterministic NEGATIVE sampling for contrastive training: each
    anchor document draws k=3 pseudo-random partners by multiplicative
    hashing into the document-ID domain — no RNG state, retry-stable,
    and reproducible across engines (the oracle computes the identical
    arithmetic).  Self-collisions are filtered (observable as a
    slightly short pair list for ~1/n of draws — the engine-wide
    observable-loss rule, never silent resampling that would need
    coordination).

    Scale shape: negatives are drawn INTO the key domain and realized
    by one keyed equi-join against the corpus — no per-anchor scan, no
    broadcast of the corpus, skew-free (hash targets are uniform).  On
    a sparse/non-dense ID space the same plan runs against the
    dense_index mapping (operators/stream.py) instead of raw ids."""
    docs = T(spark, sf_dir, "documents")
    n_docs = docs.count()  # bounded scalar (one count job)
    anchors = docs.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("anchor_id")
    )
    cand = anchors.select(
        "anchor_id",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("j"),
    ).select(
        "anchor_id",
        "j",
        (
            (F.col("anchor_id") * F.lit(2654435761) + F.col("j") * F.lit(40503))
            % F.lit(n_docs)
        ).alias("neg_id"),
    )
    return (
        cand.join(docs.select(F.col("doc_id").alias("neg_id")), "neg_id")
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", "j", "neg_id")
        .orderBy("anchor_id", "j")
    )


@query("pipeline_contrastive_dataset")  # rows-only: hard negatives come
# from the ANN stack (engine-internal ranks); the per-type counts /
# disjointness / margin-ordering contracts are in
# tests/test_curation.py::test_pipeline_contrastive_dataset_contract
def pipeline_contrastive_dataset(spark, sf_dir):
    """Composed pipeline #6 — the training-PAIRS dataset a contrastive
    embedding run consumes, built from three primitives this engine
    already verifies separately: POSITIVES are semantic near-duplicates
    (cosine_pairs ≥ 0.35, the oracle-checked dedup primitive, re-keyed
    so each anchor keeps its partners), HARD negatives are the
    anchor's nearest non-positive neighbors (q_hard_negatives' mining
    loop), and RANDOM negatives are q_negative_pairs' hash-into-domain
    draws — one output relation, (anchor_id, partner_id, pair_type,
    cos_sim), types disjoint per anchor by construction.

    The contract the composition must keep (pinned in its test):
    positives score above hard negatives BY CONSTRUCTION (every pair
    at or above the positive threshold IS a positive, so the anti-joined
    hard negatives sit strictly below it), hard negatives above random,
    per anchor type-sets never overlap, and the whole build is
    deterministic.  The BY-CONSTRUCTION margin requires the positive
    leg to be EXACT at every scale, and since round 7 auto mode
    guarantees that: below the broadcast bound it runs the broadcast
    matmul, above it the blocked-exact IVF-cell path
    (cosine_pairs mode='blocked' — triangle-inequality cell-pair
    pruning, recall 1 by construction, no driver collect and no
    all-pairs stage; VERDICT r6 #1 closed the r5 caveat where auto
    silently dropped to LSH recall).  LSH remains explicit opt-in
    only, for callers that accept a recall qualifier.
    Scale: each leg keeps its own bounded plan (exact pair join;
    bounded-anchor top-k scan; keyed domain join) — composition adds
    unions, not new shuffles over the corpus."""
    from streaming_spark.operators.similarity import (
        _cosine_expr,
        cosine_pairs,
        cosine_topk,
    )

    emb = T(spark, sf_dir, "embeddings")
    n_vecs = emb.count()  # bounded scalar
    anchors = emb.filter(F.col("vec_id") % 25 == 0)
    k = 3
    # positives: near-duplicate partners of each anchor (both orders).
    # auto = exact at any scale (broadcast below the bound, blocked-
    # exact IVF cells above) — the margin contract needs recall 1.
    pairs = cosine_pairs(emb, threshold=0.35, mode="auto")
    pos = (
        pairs.select(
            F.col("id_a").alias("anchor_id"),
            F.col("id_b").alias("partner_id"),
            "cos_sim",
        )
        .unionByName(
            pairs.select(
                F.col("id_b").alias("anchor_id"),
                F.col("id_a").alias("partner_id"),
                "cos_sim",
            )
        )
        .join(anchors.select(F.col("vec_id").alias("anchor_id")), "anchor_id")
        .withColumn("pair_type", F.lit("positive"))
    )
    # hard negatives: nearest neighbors that are NOT positives.  Fetch
    # depth is k + the MAX positive count over anchors (one metadata
    # aggregate): the k-th non-positive neighbor has at most max_pos
    # positives ranked ahead of it, so top-(k + max_pos) provably
    # contains all k true hard negatives — the old fixed +8 buffer
    # silently under-supplied anchors inside dense near-dup clusters
    # (> 8 partners above the positive threshold).  cosine_topk already
    # excludes self-matches by contract.
    max_pos = int(
        pos.groupBy("anchor_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()[0]["m"]
        or 0
    )
    hard = (
        cosine_topk(emb, anchors, k=k + max_pos)
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col("neighbor_id").alias("partner_id"),
            F.col("sim").alias("cos_sim"),
        )
        .join(
            pos.select("anchor_id", "partner_id"),
            ["anchor_id", "partner_id"],
            "left_anti",
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("anchor_id").orderBy(
            F.col("cos_sim").desc(), "partner_id"
        )
    )
    hard = (
        hard.withColumn("rk", rk)
        .filter(F.col("rk") <= k)
        .drop("rk")
        .withColumn("pair_type", F.lit("hard_negative"))
    )
    # random negatives: deterministic hash-into-domain draws, minus any
    # id already used as a positive or hard negative for that anchor
    rand = (
        anchors.select(
            F.col("vec_id").alias("anchor_id"),
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
        )
        .select(
            "anchor_id",
            (
                (
                    F.col("anchor_id") * F.lit(2654435761)
                    + F.col("j") * F.lit(40503)
                )
                % F.lit(n_vecs)
            ).alias("partner_id"),
        )
        .filter(F.col("partner_id") != F.col("anchor_id"))
        .join(
            pos.select("anchor_id", "partner_id")
            .unionByName(hard.select("anchor_id", "partner_id")),
            ["anchor_id", "partner_id"],
            "left_anti",
        )
        .distinct()
    )
    a_emb = emb.select(
        F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("a_vec")
    )
    p_emb = emb.select(
        F.col("vec_id").alias("partner_id"), F.col("embedding").alias("p_vec")
    )
    rand = (
        rand.join(a_emb, "anchor_id")
        .join(p_emb, "partner_id")
        .select(
            "anchor_id",
            "partner_id",
            F.round(_cosine_expr("a_vec", "p_vec"), 4).alias("cos_sim"),
            F.lit("random_negative").alias("pair_type"),
        )
    )
    return (
        pos.select("anchor_id", "partner_id", "pair_type", "cos_sim")
        .unionByName(hard.select("anchor_id", "partner_id", "pair_type", "cos_sim"))
        .unionByName(rand.select("anchor_id", "partner_id", "pair_type", "cos_sim"))
        .orderBy("anchor_id", "pair_type", "partner_id")
    )


@query(
    "sample_exact_k",
    oracle="""
    SELECT doc_id, source
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 40
    """,
)
def sample_exact_k(spark, sf_dir):
    """EXACTLY-k deterministic uniform sample — the fixed-budget
    companion of sample_uniform_hash's fixed-RATE filter: order by
    md5-of-id, keep the first k.  Same guarantees (no RNG state,
    retry-stable, engine-independent — the oracle sorts the identical
    hashes), plus the property budget-driven pipelines need: the output
    size is exact, not binomial.

    Scale shape: ORDER BY + LIMIT plans as TakeOrderedAndProject — each
    partition keeps its local top-k (bounded heap, no sort of the
    corpus) and only k·partitions rows reach the driver-side merge; the
    registry plan gate classifies this bounded-by-construction.  A new
    corpus snapshot changes the sample smoothly: ranks are stable, so
    adding documents can only displace the k-th tail, never reshuffle
    the whole sample (the md5-order determinism rule every sampler here
    follows)."""
    return (
        T(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(40)
    )


@query(
    "q_aligned_chunk_pairs",
    oracle="""
    WITH ch AS (
      SELECT doc_id,
             CAST((gs.start - 1) / 160 AS INT) AS chunk_no,
             substring(text, gs.start, 200) AS anchor_chunk
      FROM documents,
      LATERAL (SELECT unnest(generate_series(
                 1, greatest(length(text) - 40, 1), 160)) AS start) gs
      WHERE length(text) > 0)
    SELECT doc_id, chunk_no, anchor_chunk,
           trim(regexp_replace(
                regexp_replace(lower(anchor_chunk),
                               '[\\x00-\\x1f\\x7f]', '', 'g'),
                '\\s+', ' ', 'g')) AS positive_chunk,
           trim(regexp_replace(
                regexp_replace(lower(anchor_chunk),
                               '[\\x00-\\x1f\\x7f]', '', 'g'),
                '\\s+', ' ', 'g')) <> anchor_chunk AS changed
    FROM ch
    """,
)
def q_aligned_chunk_pairs(spark, sf_dir):
    """ALIGNED-VIEW contrastive positives (VERDICT r5 item 7): every
    200-char chunk is paired with a deterministic augmented view of the
    SAME underlying span — its canonical normalization (lowercase,
    control-strip, whitespace-collapse).  Alignment is exact BY
    CONSTRUCTION: both sides of a pair cover identical characters, the
    property parallel-corpus positives (translation pairs, OCR
    re-renders, format variants) provide and that sampled near-dup
    positives only approximate.  The fixtures carry no true parallel
    text (ROADMAP item 10), so the augmentation view is the honest
    stand-in: with a real aligned corpus the identical plan keys the
    positive side on the translation's (doc_id, chunk_no) instead of
    computing it — the join shape and contracts don't change.

    ``changed`` marks the NONTRIVIAL pairs (view differs from anchor)
    — a trainer filters on it so identity pairs don't dilute the loss.

    Scale: chunking is a JVM sequence-explode (no shuffle), the view is
    codegen'd string builtins on the already-exploded rows — the whole
    pair relation is one narrow map over the corpus, zero shuffles."""
    from streaming_spark.operators.text import normalize_text_col

    docs = T(spark, sf_dir, "documents").filter(F.length("text") > 0)
    chunks = curation.chunk_documents(
        docs, chunk_chars=200, overlap=40
    ).withColumnRenamed("chunk", "anchor_chunk")
    pos = normalize_text_col("anchor_chunk")
    return chunks.select(
        "doc_id",
        "chunk_no",
        "anchor_chunk",
        pos.alias("positive_chunk"),
        (pos != F.col("anchor_chunk")).alias("changed"),
    )


@query(
    "pipeline_contrastive_aligned",
    oracle="""
    WITH ch AS (
      SELECT doc_id,
             CAST((gs.start - 1) / 160 AS INT) AS chunk_no,
             substring(text, gs.start, 200) AS chunk
      FROM documents,
      LATERAL (SELECT unnest(generate_series(
                 1, greatest(length(text) - 40, 1), 160)) AS start) gs
      WHERE length(text) > 0),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    pos AS (
      SELECT doc_id AS anchor_id, chunk_no, 'positive' AS pair_type,
             CAST(0 AS BIGINT) AS j, doc_id AS partner_doc_id,
             trim(regexp_replace(
                  regexp_replace(lower(chunk), '[\\x00-\\x1f\\x7f]', '', 'g'),
                  '\\s+', ' ', 'g')) AS partner_text
      FROM ch),
    draws AS (
      SELECT c.doc_id AS anchor_id, c.chunk_no, t.j,
             (c.doc_id * 2654435761 + c.chunk_no * 40503 + t.j * 97)
               % (SELECT n_docs FROM nd) AS neg_doc_id
      FROM ch c, (SELECT unnest(generate_series(0, 1)) AS j) t),
    neg AS (
      SELECT d.anchor_id, d.chunk_no, 'negative' AS pair_type,
             CAST(d.j AS BIGINT) AS j, c0.doc_id AS partner_doc_id,
             c0.chunk AS partner_text
      FROM draws d JOIN ch c0
        ON c0.doc_id = d.neg_doc_id AND c0.chunk_no = 0
      WHERE d.neg_doc_id <> d.anchor_id)
    SELECT * FROM pos UNION ALL SELECT * FROM neg
    """,
)
def pipeline_contrastive_aligned(spark, sf_dir):
    """Composed pipeline #7 — the CHUNK-level contrastive dataset built
    from exact aligned positives: each anchor chunk gets (a) its
    aligned augmented view (q_aligned_chunk_pairs' normalization — the
    parallel-text stand-in, alignment exact by construction) and (b)
    k=2 deterministic random negatives: chunk 0 of other documents
    drawn by multiplicative hashing into the doc-id domain (the
    q_negative_pairs scheme at chunk granularity).  Unlike pipeline #6
    (embedding-space positives, rows-only hard negatives), every leg
    here is closed-form — the WHOLE composed relation is oracle-checked
    row for row.

    Contract (pinned in tests/test_curation.py): positives cover the
    anchor's own span (partner_doc_id = anchor_id), negatives never do,
    draws are deterministic, and lowercase-token Jaccard of positives
    (= 1.0 by construction) dominates negatives.  Self-collisions drop
    via the <> filter and out-of-domain draws via the inner join —
    observable loss, never silent resampling.

    Scale: positives ride the chunk explode (zero shuffle); negatives
    are ONE keyed equi-join of hash draws against the chunk-0 slice —
    no per-anchor scan, no corpus broadcast, uniform keys (skew-free).
    """
    from streaming_spark.operators.text import normalize_text_col

    docs = T(spark, sf_dir, "documents")
    n_docs = docs.count()  # bounded scalar (one count job)
    chunks = curation.chunk_documents(
        docs.filter(F.length("text") > 0), chunk_chars=200, overlap=40
    )
    pos = chunks.select(
        F.col("doc_id").alias("anchor_id"),
        "chunk_no",
        F.lit("positive").alias("pair_type"),
        F.lit(0).cast("bigint").alias("j"),
        F.col("doc_id").alias("partner_doc_id"),
        normalize_text_col("chunk").alias("partner_text"),
    )
    draws = chunks.select(
        F.col("doc_id").alias("anchor_id"),
        "chunk_no",
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("j"),
    ).select(
        "anchor_id",
        "chunk_no",
        "j",
        (
            (
                F.col("anchor_id") * F.lit(2654435761)
                + F.col("chunk_no") * F.lit(40503)
                + F.col("j") * F.lit(97)
            )
            % F.lit(n_docs)
        ).alias("neg_doc_id"),
    )
    chunk0 = chunks.filter(F.col("chunk_no") == 0).select(
        F.col("doc_id").alias("neg_doc_id"),
        F.col("chunk").alias("partner_text"),
    )
    neg = (
        draws.join(chunk0, "neg_doc_id")
        .filter(F.col("neg_doc_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "chunk_no",
            F.lit("negative").alias("pair_type"),
            F.col("j").cast("bigint").alias("j"),
            F.col("neg_doc_id").alias("partner_doc_id"),
            "partner_text",
        )
    )
    return pos.unionByName(neg)


# shared by the DSIR queries and their streaming twin: hashed-unigram
# feature bucket (first 4 hex chars of md5 → 65536 buckets, the
# cross-engine hash idiom) and the Laplace-smoothed log-ratio
_DSIR_BUCKETS = 65536


def dsir_scores(tf_index):
    """Per-doc DSIR weights from the (doc_id, source, bucket, tf)
    sufficient statistic — the ONE place the Laplace smoothing,
    left-join coalesce, and 4-dp rounding live, shared by
    q_dsir_weights (batch tokenize → tf) and q_streaming_dsir_index
    (tf folded from the accumulated ingest sink); the twin pair stays
    bit-identical because divergence is structurally impossible (code
    review r6).

    tf_index is evaluated exactly TWICE: once eagerly for the
    per-bucket counts (one job — both c_r and c_t come from one
    conditional aggregate, and the totals fold from its ≤65536 rows on
    the driver, exact because tf is integral), and once lazily in the
    scoring join.  The r13 shape paid FOUR evaluations (totals job +
    tcnt + rcnt + scoring — at sf0.1 each re-ran the tokenize+md5 scan;
    at 100 TB each is a corpus-sized pass).  The collected frame is
    bounded by the md5-prefix feature space (≤65536 rows) — the same
    model-sized-broadcast contract the ratio table already had."""
    bucket_counts = tf_index.groupBy("bucket").agg(
        F.sum("tf").alias("c_r"),
        F.sum(F.when(F.col("source") == "src0", F.col("tf"))).alias("c_t"),
    )
    rows = bucket_counts.collect()
    # empty input / absent target domain → sum() is NULL; a silent 0
    # would fabricate uniform log-ratios, so fail loudly (ADVICE r6)
    t_counts = [r["c_t"] for r in rows if r["c_t"] is not None]
    if not rows or not t_counts:
        raise ValueError(
            "dsir_scores: tf_index has no "
            + ("rows at all" if not rows else "source='src0' rows")
            + " — the DSIR ratio needs both a raw and a target domain"
        )
    n_r = sum(r["c_r"] for r in rows)
    n_t = sum(t_counts)
    lr = F.log(
        (F.coalesce(F.col("c_t"), F.lit(0)) + 1.0)
        / F.lit(float(n_t + _DSIR_BUCKETS))
    ) - F.log((F.col("c_r") + 1.0) / F.lit(float(n_r + _DSIR_BUCKETS)))
    ratio = (
        tf_index.sparkSession.createDataFrame(rows, schema=bucket_counts.schema)
        .select("bucket", lr.alias("lr"))
    )
    return (
        tf_index.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * F.col("lr")), 4).alias(
                "dsir_weight"
            ),
            F.round(
                F.sum(F.col("tf") * F.col("lr")) / F.sum("tf"), 4
            ).alias("dsir_per_token"),
        )
    )


_DSIR_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, substring(md5(t.tok), 1, 4) AS bucket
      FROM documents,
      LATERAL (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok) t
      WHERE length(trim(text)) > 0),
    tgt_ids AS (SELECT doc_id FROM documents WHERE source = 'src0'),
    tstats AS (
      SELECT count(*) AS n_t FROM toks JOIN tgt_ids USING (doc_id)),
    rstats AS (SELECT count(*) AS n_r FROM toks),
    tcnt AS (
      SELECT bucket, count(*) AS c_t
      FROM toks JOIN tgt_ids USING (doc_id) GROUP BY bucket),
    rcnt AS (
      SELECT bucket, count(*) AS c_r FROM toks GROUP BY bucket),
    ratio AS (
      SELECT r.bucket,
             ln((coalesce(t.c_t, 0) + 1.0)
                / ((SELECT n_t FROM tstats) + {_DSIR_BUCKETS}))
             - ln((r.c_r + 1.0)
                  / ((SELECT n_r FROM rstats) + {_DSIR_BUCKETS})) AS lr
      FROM rcnt r LEFT JOIN tcnt t USING (bucket)),
    dtf AS (
      SELECT doc_id, bucket, count(*) AS tf FROM toks
      GROUP BY doc_id, bucket)
    SELECT d.doc_id, CAST(sum(d.tf) AS BIGINT) AS n_tokens,
           round(sum(d.tf * ratio.lr), 4) AS dsir_weight,
           round(sum(d.tf * ratio.lr) / sum(d.tf), 4) AS dsir_per_token
    FROM dtf d JOIN ratio USING (bucket)
    GROUP BY d.doc_id
"""


@query("q_dsir_weights", oracle=_DSIR_ORACLE)
def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how target-like its hashed-unigram feature distribution is —
    weight(doc) = Σ_tokens [ln p_target(bucket) − ln p_raw(bucket)],
    with Laplace-smoothed bucket probabilities over 65536 hashed
    feature buckets (md5-prefix, the engine's cross-engine hash).  The
    target here is the source='src0' slice — the "domain of interest" a
    pretraining mix up-weights; the raw distribution is the corpus.
    (DSIR uses hashed BIGRAMS; the fixture's ~100-word pool makes
    bigram buckets degenerate, so unigram features carry the real
    semantics — the plan is feature-order agnostic.)

    Scale shape: the ONLY fact-sized shuffle is tokens → per-(doc,
    bucket) tf; both bucket-count tables are ≤65536 rows (model-sized,
    broadcast into the scoring join), and the totals are scalar
    aggregates.  Raw text never shuffles; at 100 TB the bucket stats
    are a reusable artifact — recompute only when the target slice
    changes."""
    docs = T(spark, sf_dir, "documents")
    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    ).select(
        "doc_id", "source", F.substring(F.md5("tok"), 1, 4).alias("bucket")
    )
    dtf = toks.groupBy("doc_id", "source", "bucket").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # Stage the per-(doc, bucket) tf sufficient statistic to scratch and
    # hand dsir_scores the STAGED table (r15, VERDICT r14 #3):
    # dsir_scores evaluates its input twice (eager bucket-count fold +
    # lazy scoring join), and unstaged each evaluation re-ran the
    # tokenize+md5 subtree — a full corpus pass per evaluation at scale.
    # Staged, the corpus tokenizes ONCE (this write job) and both
    # consumers read the much smaller tf table (distinct (doc, bucket)
    # pairs — the scoring plan's scan is scratch, not documents).  tf is
    # an integral count, so the parquet round-trip is value-exact and
    # the oracle hash is unchanged.  pin=True: the returned lazy frame
    # reads these files for an unbounded lifetime the scratch sweep's
    # mtime signal cannot see (exact_nn_topk's staging contract).
    from streaming_spark.scratch import scratch_dir

    d = scratch_dir("dsir_tf", pin=True)
    dtf.write.parquet(d + "/t")
    return dsir_scores(spark.read.parquet(d + "/t"))


@query(
    "pipeline_dsir_resample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, substring(md5(t.tok), 1, 4) AS bucket
      FROM documents,
      LATERAL (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok) t
      WHERE length(trim(text)) > 0),
    tgt_ids AS (SELECT doc_id FROM documents WHERE source = 'src0'),
    tstats AS (
      SELECT count(*) AS n_t FROM toks JOIN tgt_ids USING (doc_id)),
    rstats AS (SELECT count(*) AS n_r FROM toks),
    tcnt AS (
      SELECT bucket, count(*) AS c_t
      FROM toks JOIN tgt_ids USING (doc_id) GROUP BY bucket),
    rcnt AS (
      SELECT bucket, count(*) AS c_r FROM toks GROUP BY bucket),
    ratio AS (
      SELECT r.bucket,
             ln((coalesce(t.c_t, 0) + 1.0)
                / ((SELECT n_t FROM tstats) + {_DSIR_BUCKETS}))
             - ln((r.c_r + 1.0)
                  / ((SELECT n_r FROM rstats) + {_DSIR_BUCKETS})) AS lr
      FROM rcnt r LEFT JOIN tcnt t USING (bucket)),
    dtf AS (
      SELECT doc_id, bucket, count(*) AS tf FROM toks
      GROUP BY doc_id, bucket),
    w AS (
      SELECT d.doc_id,
             round(sum(d.tf * ratio.lr) / sum(d.tf), 4) AS dsir_per_token
      FROM dtf d JOIN ratio USING (bucket)
      GROUP BY d.doc_id)
    SELECT w.doc_id, docs.source, w.dsir_per_token
    FROM w JOIN documents docs ON docs.doc_id = w.doc_id
    ORDER BY w.dsir_per_token DESC, w.doc_id LIMIT 100
    """,
)
def pipeline_dsir_resample(spark, sf_dir):
    """Composed pipeline #8 — DSIR data SELECTION: rank the corpus by
    q_dsir_weights' target-likeness and keep the top-100
    (LENGTH-NORMALIZED weight desc, doc_id tie-break — the raw summed
    weight confounds length with target-likeness when smoothing makes
    the average per-token log-ratio negative, measured on the fixture:
    target docs are longer AND per-token more target-like, and the sum
    ranks them LOWER; the per-token mean is the clean discriminator).
    The paper resamples with Gumbel noise; the engine-wide determinism
    rule (retry-stable, oracle-checkable) substitutes the
    deterministic top-k — the ranking, the part DSIR actually
    contributes, is preserved.

    Scale: everything q_dsir_weights does plus ONE TakeOrderedAndProject
    (per-partition top-100 heaps, no global sort) and a doc-keyed join
    back for metadata."""
    w = q_dsir_weights(spark, sf_dir)
    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        w.join(docs, "doc_id")
        .orderBy(F.col("dsir_per_token").desc(), "doc_id")
        .select("doc_id", "source", "dsir_per_token")
        .limit(100)
    )


# Shared CE scoring CTEs (toks -> tgt -> stats -> per-token nll) — the
# one definition both q_lm_perplexity and pipeline_perplexity_filter
# compose, so the smoothing denominator and tokenization cannot drift
# between the scorer and the filter built on it (code review r6).
_LM_CE_CTES = """
    toks AS (
      SELECT doc_id, t.tok
      FROM documents,
      LATERAL (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok) t
      WHERE length(trim(text)) > 0),
    tgt AS (
      SELECT tok, count(*) AS c FROM toks
      JOIN (SELECT doc_id FROM documents WHERE source = 'src0') s
        USING (doc_id)
      GROUP BY tok),
    stats AS (
      SELECT (SELECT sum(c) FROM tgt) AS n,
             (SELECT count(*) FROM tgt) AS v),
    nll AS (
      SELECT toks.doc_id,
             -ln((coalesce(tgt.c, 0) + 1.0)
                 / ((SELECT n FROM stats) + (SELECT v FROM stats) + 1.0))
               AS nll
      FROM toks LEFT JOIN tgt USING (tok))"""


@query(
    "q_lm_perplexity",
    oracle="""
    WITH"""
    + _LM_CE_CTES
    + """
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(nll), 4) AS cross_entropy
    FROM nll GROUP BY doc_id
    """,
)
def q_lm_perplexity(spark, sf_dir):
    """CCNet-style language-model quality scoring (Wenzek et al. 2020):
    train a unigram LM on the high-quality slice (source='src0',
    add-one smoothing over its vocabulary V with a single OOV bucket:
    p(tok) = (c(tok)+1)/(N+V+1)), then score every document by its
    per-token cross-entropy −avg ln p(tok) — low = target-like, high =
    out-of-domain/noise.  CCNet uses a KenLM 5-gram; the unigram LM is
    the same statistic family computable as ONE distributed count
    (exactly the BPE/unigram-tokenizer sufficient-statistic pattern)
    and keeps the score closed-form for the oracle.

    Scale shape: one tokens → (tok) count over the TARGET slice only
    (vocabulary-sized result, broadcast), then a broadcast probe of the
    corpus token stream + per-doc aggregate — the corpus shuffles once,
    keyed by doc, and the model is a reusable artifact."""
    docs = T(spark, sf_dir, "documents")
    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    )
    tgt_counts = (
        toks.filter(F.col("source") == "src0")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # ONE eager job trains the LM: the vocabulary-sized (tok, c) table
    # comes back to the driver (it was already broadcast-bounded), its
    # totals fold exactly (integral counts), and the scoring join reads
    # the recreated local frame — so the final plan tokenizes the corpus
    # ONCE instead of re-tokenizing the src0 slice a second and third
    # time for the totals job and the lazy tgt branch (r13 shape).
    tgt_rows = tgt_counts.collect()
    if not tgt_rows:
        # empty target slice: say WHICH contract broke instead of a raw
        # TypeError on None arithmetic (same loud-guard discipline as
        # dsir_scores' empty-domain error, ADVICE r6)
        raise ValueError(
            "q_lm_perplexity: target slice source='src0' holds no "
            "non-empty documents — the unigram LM has nothing to train on"
        )
    tgt = spark.createDataFrame(tgt_rows, schema=tgt_counts.schema)
    denom = float(sum(r["c"] for r in tgt_rows) + len(tgt_rows) + 1)
    nll = -F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / F.lit(denom))
    return (
        toks.join(F.broadcast(tgt), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg(nll), 4).alias("cross_entropy"),
        )
    )


@query(
    "pipeline_perplexity_filter",
    oracle="""
    WITH"""
    + _LM_CE_CTES
    + """,
    ce AS (
      SELECT doc_id, round(avg(nll), 4) AS cross_entropy
      FROM nll GROUP BY doc_id),
    thr AS (SELECT round(avg(cross_entropy), 6) AS mean_ce FROM ce)
    SELECT ce.doc_id, d.source, ce.cross_entropy
    FROM ce JOIN documents d ON d.doc_id = ce.doc_id
    WHERE ce.cross_entropy < (SELECT mean_ce FROM thr)
    """,
)
def pipeline_perplexity_filter(spark, sf_dir):
    """Composed pipeline #9 — the CCNet "head" selection: keep the
    documents whose LM cross-entropy (q_lm_perplexity, already rounded
    to 4 dp so the threshold compare is engine-stable) is below the
    corpus mean.  CCNet buckets into head/middle/tail perplexity
    terciles; the below-mean cut is the same shape with one boundary —
    q_quantile_bins supplies the general discretizer when terciles are
    wanted.

    Scale: q_lm_perplexity's plan + one scalar aggregate for the
    threshold (broadcast into the filter) + a doc-keyed metadata join.
    Nothing new shuffles."""
    ce = q_lm_perplexity(spark, sf_dir).select("doc_id", "cross_entropy")
    # the threshold is an AGGREGATE, so it gets the round-aggregates
    # treatment (6 dp): the engines' unrounded means can differ in the
    # last ulp (summation order), and a doc sitting between them would
    # flip classification (code review r6)
    mean_row = ce.agg(F.round(F.avg("cross_entropy"), 6).alias("m")).collect()[0]
    if mean_row["m"] is None:
        raise ValueError(
            "pipeline_perplexity_filter: no scored documents — every "
            "text is empty/whitespace, so no mean threshold exists"
        )
    thr = float(mean_row["m"])
    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        ce.filter(F.col("cross_entropy") < F.lit(thr))
        .join(docs, "doc_id")
        .select("doc_id", "source", "cross_entropy")
    )


_GOPHER_METRICS_SQL = """
    WITH t AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents WHERE length(trim(text)) > 0),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             list_sum(list_transform(toks, x -> length(x)))
               / CAST(len(toks) AS DOUBLE) AS mean_word_len,
             len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
               / CAST(len(toks) AS DOUBLE) AS alpha_frac,
             ((length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '...', ''))) / 3)
               / CAST(len(toks) AS DOUBLE) AS symbol_ratio,
             CAST(len(list_intersect(
                    list_transform(toks, x -> lower(x)),
                    ['the','be','to','of','and','that','have','with']))
                  AS BIGINT) AS n_stop
      FROM t)
    SELECT doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio,
           n_stop,
           (n_words >= 50 AND n_words <= 100000) AS ok_words,
           (mean_word_len >= 3 AND mean_word_len <= 10) AS ok_word_len,
           (alpha_frac >= 0.8) AS ok_alpha,
           (symbol_ratio <= 0.1) AS ok_symbols,
           (n_stop >= {min_stop}) AS ok_stop,
           ((n_words >= 50 AND n_words <= 100000)
            AND (mean_word_len >= 3 AND mean_word_len <= 10)
            AND (alpha_frac >= 0.8) AND (symbol_ratio <= 0.1)
            AND (n_stop >= {min_stop})) AS passes
    FROM m
"""


@query(
    "text_gopher_quality",
    oracle=_GOPHER_METRICS_SQL.format(min_stop=2),
)
def text_gopher_quality(spark, sf_dir):
    """Gopher quality rules (Rae et al. 2021 §A1.1) at the PAPER's
    thresholds: per-doc word count, mean word length, alphabetic-word
    fraction, symbol-to-word ratio, distinct-stopword presence — one
    boolean per rule plus the conjunction.  On this synthetic fixture
    the stopword rule fails everywhere (≤1 of the 8 stopwords per doc
    — a corpus property the metrics make OBSERVABLE, which is the
    point of reporting per-rule flags instead of a bare filter);
    pipeline_gopher_filter applies the fixture-calibrated profile.

    Scale: array HOFs + length arithmetic over the split tokens —
    codegen'd, zero shuffle, one narrow pass over the corpus."""
    from streaming_spark.operators.text import gopher_quality

    return gopher_quality(T(spark, sf_dir, "documents"))


@query(
    "pipeline_gopher_filter",
    oracle="SELECT doc_id, n_words, n_stop FROM ("
    + _GOPHER_METRICS_SQL.format(min_stop=1)
    + ") WHERE passes",
)
def pipeline_gopher_filter(spark, sf_dir):
    """Composed pipeline #10 — the Gopher quality GATE with the
    fixture-calibrated profile (min_stop=1; every other threshold at
    the paper's default — the synthetic 100-word pool yields at most
    one distinct stopword per doc, so the paper's ≥2 would pass zero
    documents and verify nothing).  Survivors are the pretraining-mix
    candidates downstream dedup/packing consume.

    Scale: identical narrow pass; the filter fuses into the scan."""
    from streaming_spark.operators.text import gopher_quality

    return (
        gopher_quality(T(spark, sf_dir, "documents"), min_stop=1)
        .filter(F.col("passes"))
        .select("doc_id", "n_words", "n_stop")
    )


# DuckDB twin of operators.text.break_into_lines(words_per_line=10):
# same whitespace normalization, same break-insertion regex, same split —
# so line-granular queries stay oracle-checked end to end.
_C4_LINES_SQL = """
      SELECT doc_id,
             string_split(
               regexp_replace(
                 regexp_replace(trim(text), '\\s+', ' ', 'g'),
                 '((\\S+ ){9}\\S+) ', '\\1' || chr(10), 'g'),
               chr(10)) AS ls,
             text
      FROM documents WHERE length(trim(text)) > 0
"""


@query(
    "text_c4_rules",
    oracle="""
    WITH t AS ("""
    + _C4_LINES_SQL
    + """)
    SELECT doc_id,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(list_filter(ls, x ->
                (length(x) - length(replace(x, ' ', '')) + 1) < 5))
             AS BIGINT) AS n_short_lines,
           CAST(len(list_filter(ls, x ->
                contains(lower(x), 'javascript'))) AS BIGINT) AS n_js_lines,
           CAST(len(list_filter(ls, x ->
                regexp_matches(x, '[.!?"]$'))) AS BIGINT) AS n_term_lines,
           CAST(len(list_filter(ls, x ->
                (length(x) - length(replace(x, ' ', '')) + 1) >= 5
                AND NOT contains(lower(x), 'javascript')))
             AS BIGINT) AS n_kept_lines,
           contains(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                    'lorem ipsum') AS has_lorem,
           contains(text, '{') AS has_brace,
           (len(list_filter(ls, x ->
                (length(x) - length(replace(x, ' ', '')) + 1) >= 5
                AND NOT contains(lower(x), 'javascript'))) >= 3)
             AS ok_min_lines,
           ((len(list_filter(ls, x ->
                 (length(x) - length(replace(x, ' ', '')) + 1) >= 5
                 AND NOT contains(lower(x), 'javascript'))) >= 3)
            AND NOT contains(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                            'g'), 'lorem ipsum')
            AND NOT contains(text, '{')) AS passes
    FROM t
    """,
)
def text_c4_rules(spark, sf_dir):
    """C4 cleaning rules (Raffel et al. 2020 §2.2) over derived lines:
    per-doc line counts (total / too-short / 'javascript' / terminal-
    punctuation), kept-line count, page-level 'lorem ipsum' and '{'
    flags, and the conjunction — the OTHER canonical crawl-cleaning
    rule set next to Gopher's (text_gopher_quality), at line rather
    than document granularity.  The fixture is single-line prose
    without punctuation, so lines are derived deterministically
    (break_into_lines — 10-word lines, identical expression in the
    oracle) and the terminal-punct rule stays observable-but-off, the
    same calibration posture as the Gopher stopword rule.

    Scale: length arithmetic + cheap HOF lambdas over the line array —
    codegen'd, zero shuffle, one narrow pass."""
    from streaming_spark.operators.text import c4_quality

    return c4_quality(T(spark, sf_dir, "documents"))


@query(
    "pipeline_c4_filter",
    oracle="""
    WITH t AS ("""
    + _C4_LINES_SQL
    + """)
    SELECT doc_id,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(list_filter(ls, x ->
                (length(x) - length(replace(x, ' ', '')) + 1) >= 5
                AND NOT contains(lower(x), 'javascript')))
             AS BIGINT) AS n_kept_lines
    FROM t
    WHERE len(list_filter(ls, x ->
            (length(x) - length(replace(x, ' ', '')) + 1) >= 5
            AND NOT contains(lower(x), 'javascript'))) >= 3
      AND NOT contains(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                       'lorem ipsum')
      AND NOT contains(text, '{')
    """,
)
def pipeline_c4_filter(spark, sf_dir):
    """Composed pipeline #12 — the C4 cleaning GATE: survivors of the
    line-level rule set (>= 3 kept lines after the short-line and
    javascript cuts, no lorem-ipsum, no brace) with their line
    accounting — 425 of 500 fixture docs at sf0.01, the non-vacuous
    crawl-side filter that feeds the same downstream dedup/packing as
    pipeline_gopher_filter feeds from the document side.  The
    terminal-punctuation rule stays off (fixture has no punctuation;
    see text_c4_rules).

    Scale: the filter fuses into the same zero-exchange narrow pass as
    the metrics query."""
    from streaming_spark.operators.text import c4_quality

    return (
        c4_quality(T(spark, sf_dir, "documents"))
        .filter(F.col("passes"))
        .select("doc_id", "n_lines", "n_kept_lines")
    )


_ABLATION_FRACS = (0.125, 0.25, 0.5, 1.0)
_ABLATION_THRESH = {
    f: format(int(f * 0xFFFFFFFF), "08x") for f in _ABLATION_FRACS
}
_ABLATION_TOK_SQL = """CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE list_sum(list_transform(
                    string_split_regex(trim(text), '\\s+'),
                    x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) END"""


@query(
    "q_ablation_subsets",
    oracle="""
    WITH t AS (
      SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS p,
             CAST("""
    + _ABLATION_TOK_SQL
    + """ AS BIGINT) AS n_tokens
      FROM documents)
    """
    + "\n    UNION ALL\n    ".join(
        f"""SELECT CAST({f} AS DOUBLE) AS fraction,
           CAST(sum(CASE WHEN p <= '{_ABLATION_THRESH[f]}' THEN 1
                    ELSE 0 END) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN p <= '{_ABLATION_THRESH[f]}' THEN n_tokens
                    ELSE 0 END) AS BIGINT) AS n_tokens
    FROM t"""
        for f in _ABLATION_FRACS
    ),
)
def q_ablation_subsets(spark, sf_dir):
    """Scaling-law ABLATION subsets: the nested corpus fractions
    (12.5% ⊂ 25% ⊂ 50% ⊂ 100%) a scaling-suite trains on, carved by
    the same md5-threshold rule as sample_uniform_hash — the hash
    prefix is compared against each fraction's 32-bit threshold, so
    the subsets are NESTED by construction (a doc under the 12.5%
    threshold is under every larger one), deterministic across reruns
    and cluster sizes, and need NO materialization: each training run
    applies its fraction's filter at scan time.  Returns per-fraction
    doc and token budgets — the table a scaling-law fit consumes.

    Scale: ONE corpus scan computes all four memberships as
    conditional aggregates (no per-fraction passes, no shuffle beyond
    the final 4-row fold)."""
    from streaming_spark.operators.text import bpe_ish_token_count

    docs = T(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    tok = bpe_ish_token_count("text")
    aggs = []
    for i, f in enumerate(_ABLATION_FRACS):
        cond = prefix <= _ABLATION_THRESH[f]
        aggs.append(F.sum(cond.cast("bigint")).alias(f"n{i}"))
        aggs.append(
            F.sum(F.when(cond, tok).otherwise(0)).cast("bigint").alias(f"t{i}")
        )
    wide = docs.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({f} AS DOUBLE), n{i}, t{i}"
        for i, f in enumerate(_ABLATION_FRACS)
    )
    return wide.select(
        F.expr(
            f"stack({len(_ABLATION_FRACS)}, {stack_args}) "
            "as (fraction, n_docs, n_tokens)"
        )
    )


@query(
    "q_contrastive_batch_assign",
    oracle="""
    WITH RECURSIVE p AS (
      SELECT a.vec_id AS u, b.vec_id AS v
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])) >= 0.35),
    edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
    nodes AS (SELECT DISTINCT u AS n FROM edges),
    reach AS (
      SELECT n AS node, n AS r FROM nodes
      UNION
      SELECT reach.node, e.v AS r FROM reach JOIN edges e ON e.u = reach.r),
    comp AS (SELECT node, min(r) AS rep FROM reach GROUP BY node),
    assigned AS (
      SELECT e.vec_id, coalesce(c.rep, e.vec_id) AS component
      FROM embeddings e LEFT JOIN comp c ON c.node = e.vec_id)
    SELECT vec_id, component,
           CAST(row_number() OVER (PARTITION BY component ORDER BY vec_id)
             AS BIGINT) AS batch_no
    FROM assigned
    """,
)
def q_contrastive_batch_assign(spark, sf_dir):
    """IN-BATCH-SAFE batch assignment for contrastive training: when a
    batch's other members serve as implicit negatives (the InfoNCE
    in-batch trick), two near-duplicate anchors sharing a batch poison
    the loss — each is the other's false negative.  This query makes
    that impossible BY CONSTRUCTION: near-dup components (connected
    components over the exact cosine >= 0.35 pair graph — the same
    oracle-checked primitive the positives leg uses) are numbered
    within-component in vec_id order, and that rank IS the batch
    number, so same-component vectors land in strictly different
    batches while cross-component co-residents are below threshold by
    definition.  Fully oracle-checked against a DuckDB recursive-CTE
    closure + the same rank (the q_dup_span_components pattern on the
    embedding graph).

    Scale: pair generation runs cosine_pairs in auto mode, which is
    EXACT at every scale (broadcast matmul below the bound, the
    blocked-exact IVF-cell path above — recall 1 by construction, so
    the no-false-negative guarantee the batch-safety argument rests on
    survives a 100× corpus); the component/rank spine is unchanged.
    Components auto-route: one driver union-find pass while the edge
    list fits the bounded-collect contract (near-dup edge lists are
    far smaller than the corpus), O(diameter) edge-keyed shuffles
    above it; the rank is one keyed window over (component)."""
    from streaming_spark.operators.dedup import connected_components
    from streaming_spark.operators.similarity import cosine_pairs

    emb = T(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pairs = cosine_pairs(emb, threshold=0.35, mode="auto")
    comp = connected_components(pairs.select("id_a", "id_b"))
    assigned = (
        emb.select("vec_id")
        .join(comp, F.col("vec_id") == F.col("id"), "left")
        .select(
            "vec_id",
            F.coalesce("component", F.col("vec_id")).alias("component"),
        )
    )
    w = Window.partitionBy("component").orderBy("vec_id")
    return assigned.withColumn(
        "batch_no", F.row_number().over(w).cast("bigint")
    )


# shared by q_line_dedup and its streaming twin q_streaming_line_index
# (windows.py) — both must equal the same keep-first surgery exactly.
_LINE_DEDUP_ORACLE = (
    """
    WITH t AS ("""
    + _C4_LINES_SQL
    + """),
    lines AS (
      SELECT doc_id, unnest(ls) AS line,
             unnest(generate_series(1, len(ls))) AS line_no
      FROM t),
    r AS (
      SELECT doc_id, line_no, line,
             row_number() OVER (PARTITION BY md5(line)
                                ORDER BY doc_id, line_no) AS rk
      FROM lines)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           md5(coalesce(
             string_agg(line, chr(10) ORDER BY line_no)
               FILTER (WHERE rk = 1), '')) AS cleaned_hash
    FROM r GROUP BY doc_id
    """
)


@query("q_line_dedup", oracle=_LINE_DEDUP_ORACLE)
def q_line_dedup(spark, sf_dir):
    """Cross-document LINE dedup (the CCNet/RefinedWeb paragraph-hash
    pass, Wenzek et al. 2020): every derived line is keyed by its
    digest; the first occurrence corpus-wide (min doc_id, then line
    position) keeps the line, later occurrences are cut from their
    documents.  Returns per-doc line accounting plus the md5 of the
    CLEANED text, which the oracle recomputes — so the surgery itself
    is verified byte-for-byte, like q_dup_span_removal one granularity
    up.  Non-vacuous on the fixture: ~9% of derived lines are
    cross-doc duplicates at sf0.01.

    Scale shape: the LINE TEXT NEVER SHUFFLES.  Pass 1 explodes
    (doc_id, line_no, digest) triples — the only wide stage is one
    shuffle of those 16-byte digests for the keep-first window (CCNet
    shards exactly this way); the removal set that comes back is
    dup-sized (doc_id, positions) and rides as a broadcast; pass 2
    rebuilds the cleaned text per doc row with a positional filter —
    narrow, codegen'd.  (If the dup rate ever makes removals
    un-broadcastable, the fallback is one doc-keyed shuffle of the
    removal set — still never the text; plan pinned in
    tests/test_plans.py::test_line_dedup_text_never_shuffles.)"""
    from streaming_spark.operators.text import line_dedup_clean

    return line_dedup_clean(T(spark, sf_dir, "documents"), "text")


_RECIPE_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
_RECIPE_BUDGET_MULT = 2.0
# the oracle is GENERATED from the same constants the Spark side
# consumes (the file-wide convention: _TOKS_SQL, _DSIR_BUCKETS,
# _spread16_sql) — editing the mixture or budget cannot drift the twin
_W_VALUES_SQL = ", ".join(f"('{s}', {w})" for s, w in _RECIPE_WEIGHTS.items())
_SRC_LIST_SQL = ", ".join(f"'{s}'" for s in _RECIPE_WEIGHTS)


_RECIPE_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(list_sum(list_transform(
                    string_split_regex(trim(text), '\\s+'),
                    x -> CAST(ceil(length(x) / 4.0) AS BIGINT)))
               AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS ord
      FROM documents
      WHERE source IN ({_SRC_LIST_SQL})
        AND length(trim(text)) > 0),
    w(source, wt) AS (VALUES {_W_VALUES_SQL}),
    tot AS (SELECT source, sum(n_tokens) AS t_d FROM t GROUP BY source),
    g AS (SELECT CAST(sum(t_d) AS DOUBLE) AS g_tot FROM tot),
    plan AS (
      SELECT source, CAST(t_d AS DOUBLE) AS t_d,
             {_RECIPE_BUDGET_MULT} * g_tot * wt AS r_d,
             CAST(ceil({_RECIPE_BUDGET_MULT} * g_tot * wt / CAST(t_d AS DOUBLE)) AS BIGINT)
               AS e_d
      FROM tot JOIN w USING (source) CROSS JOIN g),
    full_epochs AS (
      SELECT doc_id, t.source, n_tokens,
             unnest(generate_series(1, e_d - 1)) AS epoch
      FROM t JOIN plan ON t.source = plan.source),
    last_epoch AS (
      SELECT doc_id, source, n_tokens, e_d AS epoch
      FROM (
        SELECT doc_id, t.source, n_tokens, e_d,
               sum(n_tokens) OVER (PARTITION BY t.source ORDER BY ord)
                 AS cum,
               r_d - (e_d - 1) * t_d AS rem
        FROM t JOIN plan ON t.source = plan.source)
      WHERE CAST(cum - n_tokens AS DOUBLE) < rem)
    SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch, n_tokens
    FROM full_epochs
    UNION ALL
    SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch, n_tokens
    FROM last_epoch
"""


def data_recipe_manifest(spark, docs, weights, budget_mult=2.0):
    """The recipe engine behind pipeline_data_recipe, parameterized on
    mixture ``weights`` and the budget multiple so tests can force the
    e_d == 1 (no-full-epoch) path that fixed weights never reach on the
    fixture."""
    from streaming_spark.operators.text import bpe_ish_token_count

    t = (
        docs.filter(F.col("source").isin(*weights))
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            "source",
            bpe_ish_token_count("text").alias("n_tokens"),
            F.md5(F.col("doc_id").cast("string")).alias("ord"),
        )
    )
    w = spark.createDataFrame(
        list(weights.items()), "source STRING, wt DOUBLE"
    )
    tot = t.groupBy("source").agg(F.sum("n_tokens").alias("t_d"))
    g = tot.agg(F.sum("t_d").cast("double").alias("g_tot"))
    mult = F.lit(float(budget_mult))
    plan = (
        tot.join(F.broadcast(w), "source")
        .crossJoin(F.broadcast(g))
        .select(
            "source",
            F.col("t_d").cast("double").alias("t_d"),
            (mult * F.col("g_tot") * F.col("wt")).alias("r_d"),
            F.ceil(
                mult * F.col("g_tot") * F.col("wt")
                / F.col("t_d").cast("double")
            )
            .cast("bigint")
            .alias("e_d"),
        )
    )
    joined = t.join(F.broadcast(plan), "source")
    # Guard the single-epoch domain: Spark's sequence(1, 0) yields a
    # DESCENDING [1, 0] rather than the empty sequence DuckDB's
    # generate_series(1, 0) produces, which would fabricate a spurious
    # full epoch plus an invalid epoch 0 whenever e_d == 1 (any domain
    # whose token share is >= 2x its weight) — explode of the empty
    # array drops the row instead, matching the oracle.
    full_epochs = joined.select(
        "doc_id",
        "source",
        "n_tokens",
        F.explode(
            F.when(
                F.col("e_d") > 1,
                F.sequence(F.lit(1).cast("bigint"), F.col("e_d") - 1),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("epoch"),
    )
    cum_w = Window.partitionBy("source").orderBy("ord")
    last_epoch = (
        joined.withColumn("cum", F.sum("n_tokens").over(cum_w))
        .withColumn("rem", F.col("r_d") - (F.col("e_d") - 1) * F.col("t_d"))
        .filter((F.col("cum") - F.col("n_tokens")).cast("double") < F.col("rem"))
        .select("doc_id", "source", "n_tokens", F.col("e_d").alias("epoch"))
    )
    return full_epochs.unionByName(last_epoch).select(
        "doc_id", "source", F.col("epoch").cast("bigint").alias("epoch"),
        "n_tokens",
    )


@query("pipeline_data_recipe", oracle=_RECIPE_ORACLE)
def pipeline_data_recipe(spark, sf_dir):
    """Composed pipeline #11 — data-RECIPE materialization: given
    target mixture weights over domains (50/30/20 across three fixture
    sources) and a total token budget (2x the chosen slice, computed
    FROM the data so the recipe scales with sf), emit the epoch plan a
    pretraining loader consumes: every domain is repeated whole for
    floor(required/available) epochs (upsampling — the
    Llama/GPT-3-style 'epochs over Wikipedia' knob) and the final
    partial epoch is trimmed to the remaining budget in deterministic
    md5 order.  Output rows are (doc_id, source, epoch, n_tokens) —
    the training-order manifest, fully oracle-checked including the
    trim boundary.

    Scale: per-domain totals are one partial-agg'd shuffle; the repeat
    is explode(sequence(1, epochs-1)) — output-sized, no join
    amplification beyond the budget itself; the trim is one cumulative
    window per domain in digest order.  The domain plan (3 rows) rides
    as a broadcast join."""
    return data_recipe_manifest(
        spark, T(spark, sf_dir, "documents"), _RECIPE_WEIGHTS, _RECIPE_BUDGET_MULT
    )


@query(
    "pipeline_training_order",
    oracle="""
    WITH recipe AS ("""
    + _RECIPE_ORACLE
    + """)
    SELECT CAST(row_number() OVER (
             ORDER BY md5(CAST(doc_id AS VARCHAR) || ':'
                          || CAST(epoch AS VARCHAR))) AS BIGINT)
             AS global_step,
           doc_id, source, epoch, n_tokens
    FROM recipe
    """,
)
def pipeline_training_order(spark, sf_dir):
    """Composed pipeline #13 — the SHUFFLED GLOBAL TRAINING ORDER: the
    data-recipe manifest (pipeline_data_recipe's epoch plan) is given
    one deterministic global step number in md5(doc_id:epoch) order —
    the "shuffle once, read sequentially" layout every pretraining
    loader wants (hash order interleaves domains and epochs without RNG
    state, so the order is identical on every rerun and resumable from
    any step).  Output: (global_step 1..N, doc_id, source, epoch,
    n_tokens), oracle-checked row for row including the step numbers.

    Scale: the global numbering is dense_index (operators/stream.py) —
    range-partition + per-partition offsets, NEVER a single-task
    row_number window; the only data-sized stage is the one range
    exchange, and the manifest being numbered is budget-sized, not
    corpus-sized."""
    from streaming_spark.operators.stream import dense_index

    recipe = pipeline_data_recipe(spark, sf_dir)
    keyed = recipe.withColumn(
        "ord",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("epoch").cast("string"),
            )
        ),
    )
    return dense_index(keyed, ["ord"], index_col="global_step").select(
        "global_step", "doc_id", "source", "epoch", "n_tokens"
    )


@query("incremental_curation_maintenance")  # rows-only: a composed
# lifecycle probe — the incremental-vs-batch survivor md5 equality is
# visible in the emitted fold row; the composition's exactness is
# additionally pinned (with takedown-free ordered-ingest contract) in
# tests/test_curation_incremental.py and measured flat at 200k/1M in
# scripts/stress_pipeline.py's incremental arm
def incremental_curation_maintenance(spark, sf_dir):
    """The DELTA-BOUND curation tail as a library composition
    (operators/curation_incremental.py — promoted from
    stress_pipeline's incremental arm the same way the digest index was
    promoted from its private helper): quality gate → cross-doc line
    dedup (line-digest index) → exact dedup on the cleaned digest
    (second digest index) → near-dup signature landing
    (neardup_index_append) → decontamination flags, per ingest batch;
    then one metadata-scale fold (components over the MAINTAINED pair
    table → keep-one → minus contaminated).  The witness: the fold's
    survivor id set must be EXACTLY the batch pipeline's over the whole
    corpus — every global stage's keep-first/keep-min-id window splits
    exactly at the batch boundary under ordered ingest.

    Gate-cost discipline (the carried trim rule, VERDICT r13 #3): the
    REGISTERED witness runs only the GLOBAL stages — line dedup, exact
    dedup, near-dup, fold — whose batch-boundary splitting is the
    composition's actual claim; the per-doc-pure stages (quality gate,
    decontamination) commute with any batching by construction and are
    pinned with the full stage set in
    tests/test_curation_incremental.py and measured at 200k/1M in
    scripts/stress_pipeline.py's incremental arm.

    Scale story: per-batch cost is delta-bound (digest probes read only
    the batch's prefix partitions, the banded join runs delta-vs-index
    only, decontamination is per-doc pure) — measured FLAT at 20.8-25.4
    s/batch while the corpus grows 8× at 200k (ROADMAP r13); the batch
    alternative re-runs every global stage over the accumulated corpus
    per refresh."""
    from streaming_spark.operators.curation_incremental import (
        curation_ingest_batch,
        curation_survivors,
    )
    from streaming_spark.operators.dedup import (
        dedup_keep_one,
        minhash_dedup_pairs,
    )
    from streaming_spark.operators.text import line_dedup_clean
    from streaming_spark.queries.northstar import _rows_digest

    # half the fixture (deterministic id slice): the witness semantics
    # are size-independent and the entry is a multi-stage lifecycle
    # probe — gate-cost discipline, same rationale as the other
    # maintenance entries' fixture-sized knobs
    docs = T(spark, sf_dir, "documents").select("doc_id", "text").filter(
        "doc_id < 250"
    )

    cut = int(docs.selectExpr("percentile(doc_id, 0.5)").first()[0])
    work = scratch_dir("curincr")
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    try:
        rows = []
        for b, cond in enumerate(
            (f"doc_id <= {cut}", f"doc_id > {cut}")
        ):
            st: dict = {}
            curation_ingest_batch(
                docs.filter(cond), work, b,
                quality_filter=None,
                digest_kwargs=dict(n_prefixes=2, n_id_buckets=2),
                # fixture-sized minhash (32 perms / 8 bands) — gate-cost
                # discipline; BOTH arms use the same params, so the
                # equality witness is unchanged in meaning
                neardup_kwargs=dict(
                    num_perm=32, bands=8, n_id_buckets=2,
                    n_band_prefixes=2,
                ),
                stats_out=st,
            )
            rows.append((
                f"ingest_{b}", st["rows_in"], st["rows_exact"],
                None, None,
            ))

        incr = curation_survivors(spark, work).localCheckpoint(eager=True)

        # the batch pipeline over the whole corpus, same global stages
        cleaned = line_dedup_clean(docs)
        w = Window.partitionBy("cleaned_hash").orderBy("doc_id")
        keep = (
            cleaned.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("doc_id")
        )
        exact = docs.join(keep, "doc_id")
        pairs = minhash_dedup_pairs(exact, "text", "doc_id", num_perm=32,
                                    bands=8)
        # checkpoint: count() and _rows_digest() both consume the full
        # batch arm (minhash + components) — without this the expensive
        # half of the query runs twice
        clean = (
            dedup_keep_one(exact, pairs, "doc_id")
            .select("doc_id")
            .localCheckpoint(eager=True)
        )

        rows.append((
            "fold", incr.count(), clean.count(),
            _rows_digest(incr, "doc_id"),
            _rows_digest(clean, "doc_id"),
        ))
    finally:
        spark.conf.set(key, prev)
    return spark.createDataFrame(
        rows,
        "phase STRING, rows BIGINT, info BIGINT, "
        "incremental_md5 STRING, batch_md5 STRING",
    )
