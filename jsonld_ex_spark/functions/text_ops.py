"""Text analysis for training-data pipelines, over the documents table.

All hot-path logic is JVM-side (regexp / length / md5 — whole-stage
codegen); no Python UDFs.  Counts (not float ratios) are returned so the
DuckDB oracle matches bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_RE = "[A-Za-z0-9]+"
PUNCT_RE = r"[.,;:!?]"
STOPWORDS = "(the|and|of|a|to|in|is|it|for|on)"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace-split words + alnum token regex."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{TOKEN_RE}', 0)")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: length, punctuation count, stopword count,
    mean token length ×100 (integer-exact for the oracle)."""
    d = _docs(spark, sf_dir)
    n_tokens = F.size(F.expr(f"regexp_extract_all(text, '{TOKEN_RE}', 0)"))
    n_punct = F.size(F.expr(f"regexp_extract_all(text, '{PUNCT_RE}', 0)"))
    n_stop = F.size(F.expr(f"regexp_extract_all(lower(text), '\\\\b{STOPWORDS}\\\\b', 0)"))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        (F.length("text") < F.lit(100)).alias("is_short"),
    )


_LANG_MARKERS = {
    "en": "(the|and|is|of)",
    "de": "(der|die|das|und)",
    "es": "(el|la|los|que)",
    "fr": "(le|les|des|est)",
}


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-marker hit counts per language,
    argmax with deterministic tie-break on language code."""
    d = _docs(spark, sf_dir)
    cols = [F.col("doc_id")]
    for lang, pat in _LANG_MARKERS.items():
        cols.append(
            F.size(F.expr(f"regexp_extract_all(lower(text), '\\\\b{pat}\\\\b', 0)")).alias(f"hits_{lang}")
        )
    d = d.select(*cols)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in _LANG_MARKERS])
    pred = F.when(F.lit(False), F.lit(""))
    # deterministic argmax: first language (sorted) achieving the max
    pred = None
    for lang in sorted(_LANG_MARKERS):
        cond = F.col(f"hits_{lang}") == best
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return d.select("doc_id", *[f"hits_{lang}" for lang in _LANG_MARKERS], pred.alias("lang_pred"))


# GPT-2-style pre-tokenizer, minus the trailing-space lookahead
# (`\s+(?!\S)`) — RE2 (DuckDB) has no lookahead, and both Java and RE2
# use leftmost-first alternation, so this subset tokenizes identically
# in both engines.  Counting these pre-tokens is the standard cheap
# proxy for BPE token counts in corpus filtering.
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
_BPE_SPARK = BPE_RE.replace("\\", "\\\\").replace("'", "\\'")
_BPE_DUCK = BPE_RE.replace("'", "''")


def text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: GPT-2 pre-tokenizer segment count plus
    contraction and word-segment counts (all JVM regexp)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{_BPE_SPARK}', 0)")).alias("n_bpe_tokens"),
        F.size(F.expr("regexp_extract_all(text, '\\'(?:s|t|re|ve|m|ll|d)', 0)")).alias("n_contractions"),
        F.size(F.expr("regexp_extract_all(text, ' ?\\\\p{L}+', 0)")).alias("n_word_segments"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercase
    text (exact-dup key), plus a 16-hex-char prefix as a short fp."""
    d = _docs(spark, sf_dir)
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = F.md5(norm)
    return d.select("doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 16).alias("fp16"))


RARE_DF_MAX = 2  # a token is corpus-rare if it appears in ≤ this many docs


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: total tokens,
    distinct tokens, the most-repeated token's count, and the duplicate
    -token percentage (all integers — bit-exact across engines).  The
    explode → per-(doc, token) count → per-doc aggregate shape is the
    scalable one (map-side combine on both aggregates); high
    dup_token_pct is the classic low-quality-document signal."""
    d = _docs(spark, sf_dir)
    tf = (
        d.select(
            "doc_id",
            F.explode(F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("max_tf"),
    )
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        F.coalesce("max_tf", F.lit(0)).alias("max_tf"),
        F.when(
            F.col("n_tokens").isNull() | (F.col("n_tokens") == 0), F.lit(0)
        )
        .otherwise(F.expr("(100 * (n_tokens - n_distinct)) div n_tokens"))
        .cast("long")
        .alias("dup_token_pct"),
    )


def text_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-rarity signal per document: how many of the document's
    distinct tokens appear in ≤ RARE_DF_MAX documents corpus-wide
    (misspellings/garbage markers — the integer-exact stand-in for
    perplexity-style rarity scoring).  Two hash aggregates + one join
    keyed on the token — linear, map-side combinable."""
    d = _docs(spark, sf_dir)
    dt = d.select(
        "doc_id",
        F.explode(F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")).alias("tok"),
    ).dropDuplicates(["doc_id", "tok"])
    df_counts = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    rare = (
        dt.join(df_counts, "tok")
        .where(F.col("df") <= RARE_DF_MAX)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_rare"))
    )
    distinct = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_distinct"))
    return (
        d.select("doc_id")
        .join(distinct, "doc_id", "left")
        .join(rare, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            F.coalesce("n_rare", F.lit(0)).alias("n_rare"),
        )
    )


EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "555-[0-9]{4}"


def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: emails and (toy) phone numbers replaced by
    [EMAIL]/[PHONE] markers, with per-document match counts — the
    standard pre-training scrub, all JVM regexp codegen.

    The synthetic documents carry no PII, so one deterministic email +
    phone is PLANTED per document (same construction in the oracle):
    redaction then rewrites a different position in every row, proving
    the regexes, replacement and counters behave identically per row
    across engines — not just on empty input."""
    d = _docs(spark, sf_dir)
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    with_pii = d.select("doc_id", raw.alias("raw"))
    redacted = F.regexp_replace(
        F.regexp_replace("raw", EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    return with_pii.select(
        "doc_id",
        redacted.alias("redacted"),
        F.size(F.expr(f"regexp_extract_all(raw, '{EMAIL_RE}', 0)")).alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all(raw, '{PHONE_RE}', 0)")).alias("n_phones"),
    )


def queries():
    return {
        "text_tokens": text_tokens,
        "text_tokens_bpe": text_tokens_bpe,
        "text_quality": text_quality,
        "text_langid": text_langid,
        "text_fingerprint": text_fingerprint,
        "text_redact": text_redact,
        "text_repetition": text_repetition,
        "text_rare_tokens": text_rare_tokens,
    }


def oracle_sql():
    markers_hits = ",\n  ".join(
        f"len(regexp_extract_all(lower(text), '\\b{pat}\\b', 0)) AS hits_{lang}"
        for lang, pat in _LANG_MARKERS.items()
    )
    langs = sorted(_LANG_MARKERS)
    greatest = "greatest(" + ", ".join(f"hits_{lang}" for lang in _LANG_MARKERS) + ")"
    argmax = "CASE " + " ".join(
        f"WHEN hits_{lang} = {greatest} THEN '{lang}'" for lang in langs
    ) + " END"
    return {
        "text_tokens": f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{TOKEN_RE}', 0)) AS n_tokens,
                   length(text) AS n_chars_actual
            FROM documents""",
        "text_tokens_bpe": f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{_BPE_DUCK}', 0)) AS n_bpe_tokens,
                   len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)', 0)) AS n_contractions,
                   len(regexp_extract_all(text, ' ?\\p{{L}}+', 0)) AS n_word_segments
            FROM documents""",
        "text_quality": f"""
            SELECT doc_id,
                   length(text) AS n_chars_actual,
                   len(regexp_extract_all(text, '{TOKEN_RE}', 0)) AS n_tokens,
                   len(regexp_extract_all(text, '{PUNCT_RE}', 0)) AS n_punct,
                   len(regexp_extract_all(lower(text), '\\b{STOPWORDS}\\b', 0)) AS n_stopwords,
                   length(text) < 100 AS is_short
            FROM documents""",
        "text_langid": f"""
            WITH h AS (SELECT doc_id, {markers_hits} FROM documents)
            SELECT doc_id, hits_en, hits_de, hits_es, hits_fr, {argmax} AS lang_pred
            FROM h""",
        "text_fingerprint": """
            SELECT doc_id,
                   md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
                   substr(md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))), 1, 16) AS fp16
            FROM documents""",
        "text_repetition": f"""
            WITH tf AS (
              SELECT doc_id, tok, count(*) AS c FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
                FROM documents
              ) GROUP BY doc_id, tok
            ),
            agg AS (
              SELECT doc_id,
                     CAST(sum(c) AS BIGINT) AS n_tokens,
                     count(*) AS n_distinct,
                     CAST(max(c) AS BIGINT) AS max_tf
              FROM tf GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct,
                   COALESCE(a.max_tf, 0) AS max_tf,
                   CAST(CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN 0
                        ELSE (100 * (a.n_tokens - a.n_distinct)) // a.n_tokens
                   END AS BIGINT) AS dup_token_pct
            FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""",
        "text_rare_tokens": f"""
            WITH dt AS (
              SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
                FROM documents
              )
            ),
            dfc AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok),
            rare AS (
              SELECT dt.doc_id, count(*) AS n_rare
              FROM dt JOIN dfc USING (tok) WHERE dfc.df <= {RARE_DF_MAX}
              GROUP BY dt.doc_id
            ),
            dist AS (SELECT doc_id, count(*) AS n_distinct FROM dt GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(di.n_distinct, 0) AS BIGINT) AS n_distinct,
                   CAST(COALESCE(r.n_rare, 0) AS BIGINT) AS n_rare
            FROM documents d
            LEFT JOIN dist di ON di.doc_id = d.doc_id
            LEFT JOIN rare r ON r.doc_id = d.doc_id""",
        "text_redact": f"""
            WITH p AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com or 555-'
                          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
              FROM documents
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(raw, '{EMAIL_RE}', '[EMAIL]', 'g'),
                                  '{PHONE_RE}', '[PHONE]', 'g') AS redacted,
                   CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS INT) AS n_emails,
                   CAST(len(regexp_extract_all(raw, '{PHONE_RE}')) AS INT) AS n_phones
            FROM p""",
    }
