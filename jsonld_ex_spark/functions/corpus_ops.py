"""Corpus-curation composites: the end-of-pipeline keep/drop decisions a
training-data pipeline actually ships — composed from the gated signal
operators (text_ops, dedup_ops) so every input is itself oracle-checked.

* corpus_filter — quality gate: per-document keep flag + the FIRST
  failing rule as the reason (filter decisions must be auditable;
  a bare boolean is not).
* sample_stratified — deterministic hash sampling with per-language
  rates (downsample the dominant language): md5-derived byte ∈ [0,256)
  compared against the stratum's threshold.  Re-runs, retries, and
  engines agree row-for-row — no rand() anywhere.

Everything is JVM-side expression work over the existing signal
queries; the composition itself adds no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MIN_TOKENS = 5
MAX_CHARS = 20_000
KEEP_LANG = "en"

# stratum → keep-threshold byte (out of 256): en is downsampled to 50%,
# everything else kept
LANG_RATES = {"en": 128, "de": 256, "es": 256, "fr": 256}


def corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop decision per document with an auditable reason.

    Rules (first failure wins): too_few_tokens (< MIN_TOKENS),
    too_long (≥ MAX_CHARS), wrong_lang (≠ KEEP_LANG), duplicate
    (not the canonical doc of its exact-dup group), else ok.
    """
    from jsonld_ex_spark.functions.dedup_ops import dedup_exact
    from jsonld_ex_spark.functions.text_ops import text_langid, text_tokens

    tokens = text_tokens(spark, sf_dir).select("doc_id", "n_tokens", "n_chars_actual")
    lang = text_langid(spark, sf_dir).select("doc_id", "lang_pred")
    canon = dedup_exact(spark, sf_dir).select(
        "doc_id", (F.col("doc_id") == F.col("canonical_doc_id")).alias("is_canonical")
    )
    joined = tokens.join(lang, "doc_id").join(canon, "doc_id")
    reason = (
        F.when(F.col("n_tokens") < MIN_TOKENS, F.lit("too_few_tokens"))
        .when(F.col("n_chars_actual") >= MAX_CHARS, F.lit("too_long"))
        .when(F.col("lang_pred") != KEEP_LANG, F.lit("wrong_lang"))
        .when(~F.col("is_canonical"), F.lit("duplicate"))
        .otherwise(F.lit("ok"))
    )
    return joined.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling: keep iff the first md5 byte
    of the doc_id is below the stratum's threshold."""
    from jsonld_ex_spark.functions.text_ops import text_langid

    lang = text_langid(spark, sf_dir).select("doc_id", "lang_pred")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast("int")
    expr = None
    for lg, t in sorted(LANG_RATES.items()):
        cond = F.col("lang_pred") == lg
        expr = F.when(cond, F.lit(t)) if expr is None else expr.when(cond, F.lit(t))
    thresh = expr.otherwise(F.lit(256))
    return lang.select(
        "doc_id",
        "lang_pred",
        h.alias("hash_byte"),
        (h < thresh).alias("sampled"),
    )


DECON_N = 4  # n-gram size for contamination detection
EVAL_MOD = 20  # doc_id % EVAL_MOD == 0 → held-out eval set


def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set DECONTAMINATION: flag every training document that
    shares any word n-gram (DECON_N=4) with the held-out eval set
    (doc_id % EVAL_MOD == 0 — a deterministic stand-in for a benchmark
    table).  The standard pre-training hygiene step: contaminated docs
    are dropped so eval results aren't memorization.

    Shuffle shape: the candidate join is keyed on the shingle — the same
    distributed shape as dedup_ngram_jaccard; the eval-shingle side is
    |eval| ≪ |train| and Catalyst broadcasts it at test scale, while at
    web scale AQE picks a shuffle join on the same key (deliberately
    unhinted, same rationale as the dedup DF-cap anti-join).
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    shingles = F.expr(
        f"CASE WHEN size(words) >= {DECON_N} THEN transform(sequence(1, size(words) - {DECON_N - 1}),"
        f" i -> concat_ws(' ', {', '.join(f'words[i-1+{k}]' for k in range(DECON_N))}))"
        " ELSE array() END"
    )
    sh = (
        d.select("doc_id", words.alias("words"))
        .select("doc_id", F.explode(shingles).alias("s"))
        .dropDuplicates(["doc_id", "s"])
    )
    ev = sh.where(F.col("doc_id") % EVAL_MOD == 0).select("s").distinct()
    train_sh = sh.where(F.col("doc_id") % EVAL_MOD != 0)
    hits = (
        train_sh.join(ev, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    train = d.where(F.col("doc_id") % EVAL_MOD != 0).select("doc_id")
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
        (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
    )


CHUNK_TOKENS = 64  # tokens per training chunk
PACK_BUDGET = 256  # tokens per packed sequence


def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document CHUNKING for training prep: split each document's token
    stream into fixed-size chunks (CHUNK_TOKENS), emitting per-chunk
    token counts and a content fingerprint — the step between curation
    and sequence packing.  Pure JVM: tokenization, sequence/slice
    higher-order functions, md5; one row per chunk, no Python."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    chunks = F.expr(
        f"transform(sequence(0, greatest(cast(ceil(size(words) / {CHUNK_TOKENS}.0) as int) - 1, 0)),"
        f" i -> named_struct("
        f"'chunk_idx', i,"
        f"'toks', slice(words, i * {CHUNK_TOKENS} + 1, {CHUNK_TOKENS})))"
    )
    return (
        d.select("doc_id", words.alias("words"))
        .where(F.expr("size(words) > 0"))
        .select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.expr("size(c.toks)").alias("n_tokens"),
            F.md5(F.expr("concat_ws(' ', c.toks)")).alias("chunk_md5"),
        )
    )


def corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic SEQUENCE PACKING: chunks (from text_chunks) are
    laid out in (doc_id, chunk_idx) order and assigned to fixed-budget
    packs by their starting offset in the concatenated token stream —
    pack_id = start_offset div PACK_BUDGET.

    SCALE-SAFE two-pass global running sum (round-3 verdict item #4 —
    the former single global Window.orderBy planned a one-task sort,
    a driver-adjacent bottleneck at 10^12 tokens):

    1. range-repartition on (doc_id, chunk_idx) — partition i holds a
       contiguous slice of the global order; localCheckpoint so the
       partition assignment is computed ONCE and shared by both
       branches below (a recompute could re-sample range boundaries);
    2. per-partition running sums (window PARTITIONED by _pid — N
       parallel sorts, no single-task exchange on the data path);
    3. per-partition totals → prefix offsets via a window over the
       TOTALS ONLY (N rows, one row per partition — bounded by
       parallelism, not data) broadcast-joined back.

    cum = prefix_offset(_pid) + local_cum is identical for ANY range
    boundary placement, so the output is deterministic at every
    parallelism and still reproduced exactly by the oracle's single
    cumulative sum."""
    from pyspark.sql.window import Window

    chunks = text_chunks(spark, sf_dir)
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    c = (
        chunks.repartitionByRange(n_parts, "doc_id", "chunk_idx")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("_pid").orderBy("doc_id", "chunk_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = c.withColumn("lcum", F.sum("n_tokens").over(w_local))
    totals = c.groupBy("_pid").agg(F.sum("n_tokens").alias("ptot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "_pid", F.coalesce(F.sum("ptot").over(w_off), F.lit(0)).alias("off")
    )
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn("cum", F.col("off") + F.col("lcum"))
        .select(
            "doc_id",
            "chunk_idx",
            "n_tokens",
            F.expr(f"(cum - n_tokens) div {PACK_BUDGET}").cast("long").alias("pack_id"),
            F.expr(f"(cum - n_tokens) % {PACK_BUDGET}").cast("long").alias("offset_in_pack"),
        )
    )


def queries():
    return {
        "corpus_filter": corpus_filter,
        "sample_stratified": sample_stratified,
        "corpus_decontaminate": corpus_decontaminate,
        "text_chunks": text_chunks,
        "corpus_pack": corpus_pack,
    }


def oracle_sql():
    from jsonld_ex_spark.functions.dedup_ops import oracle_sql as dedup_oracles
    from jsonld_ex_spark.functions.text_ops import oracle_sql as text_oracles

    tokens_sql = text_oracles()["text_tokens"]
    lang_sql = text_oracles()["text_langid"]
    exact_sql = dedup_oracles()["dedup_exact"]
    return {
        "corpus_filter": f"""
            WITH tok AS ({tokens_sql}),
            lng AS ({lang_sql}),
            can AS (SELECT doc_id, doc_id = canonical_doc_id AS is_canonical FROM ({exact_sql})),
            j AS (
              SELECT t.doc_id, t.n_tokens, t.n_chars_actual, l.lang_pred, c.is_canonical
              FROM tok t JOIN lng l ON l.doc_id = t.doc_id JOIN can c ON c.doc_id = t.doc_id
            ),
            r AS (
              SELECT doc_id,
                     CASE WHEN n_tokens < {MIN_TOKENS} THEN 'too_few_tokens'
                          WHEN n_chars_actual >= {MAX_CHARS} THEN 'too_long'
                          WHEN lang_pred <> '{KEEP_LANG}' THEN 'wrong_lang'
                          WHEN NOT is_canonical THEN 'duplicate'
                          ELSE 'ok' END AS reason
              FROM j
            )
            SELECT doc_id, reason, reason = 'ok' AS keep FROM r""",
        "sample_stratified": f"""
            WITH lng AS ({lang_sql}),
            h AS (
              SELECT doc_id, lang_pred,
                     CAST((strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                        + (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS INT) AS hash_byte
              FROM lng
            )
            SELECT doc_id, lang_pred, hash_byte,
                   hash_byte < CASE lang_pred
                     {" ".join(f"WHEN '{lg}' THEN {t}" for lg, t in sorted(LANG_RATES.items()))}
                     ELSE 256 END AS sampled
            FROM h""",
        "corpus_decontaminate": f"""
            WITH sh AS (
              SELECT DISTINCT doc_id,
                     concat_ws(' ', {", ".join(f"words[i+{k}]" for k in range(DECON_N))}) AS s
              FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS words
                    FROM documents),
                   unnest(CASE WHEN len(words) >= {DECON_N}
                               THEN range(1, len(words) - {DECON_N - 2})
                               ELSE [] END) AS t(i)
            ),
            ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % {EVAL_MOD} = 0),
            hits AS (
              SELECT sh.doc_id, count(*) AS n_shared
              FROM sh JOIN ev USING (s)
              WHERE sh.doc_id % {EVAL_MOD} <> 0
              GROUP BY sh.doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
                   COALESCE(h.n_shared, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
            WHERE d.doc_id % {EVAL_MOD} <> 0""",
        "text_chunks": f"""
            WITH w AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
              FROM documents
            )
            SELECT doc_id,
                   CAST(i AS INT) AS chunk_idx,
                   CAST(len(words[i * {CHUNK_TOKENS} + 1 : i * {CHUNK_TOKENS} + {CHUNK_TOKENS}]) AS INT) AS n_tokens,
                   md5(array_to_string(words[i * {CHUNK_TOKENS} + 1 : i * {CHUNK_TOKENS} + {CHUNK_TOKENS}], ' ')) AS chunk_md5
            FROM w, unnest(range(0, greatest(CAST(ceil(len(words) / {CHUNK_TOKENS}.0) AS INT), 1))) AS t(i)
            WHERE len(words) > 0""",
        "corpus_pack": f"""
            WITH w AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
              FROM documents
            ),
            ch AS (
              SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                     CAST(len(words[i * {CHUNK_TOKENS} + 1 : i * {CHUNK_TOKENS} + {CHUNK_TOKENS}]) AS BIGINT) AS n_tokens
              FROM w, unnest(range(0, greatest(CAST(ceil(len(words) / {CHUNK_TOKENS}.0) AS INT), 1))) AS t(i)
              WHERE len(words) > 0
            ),
            c AS (
              SELECT doc_id, chunk_idx, n_tokens,
                     sum(n_tokens) OVER (ORDER BY doc_id, chunk_idx
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM ch
            )
            SELECT doc_id, chunk_idx, CAST(n_tokens AS INT) AS n_tokens,
                   CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS pack_id,
                   CAST((cum - n_tokens) % {PACK_BUDGET} AS BIGINT) AS offset_in_pack
            FROM c""",
    }
