"""Mergeable cardinality sketch (HyperLogLog shape, deterministic).

At 100 TB you don't count distincts with countDistinct — you maintain
MERGEABLE register sketches per partition/day and OR them at rollup
time.  Spark's approx_count_distinct and DuckDB's approx_count_distinct
use different internal hashes, so their outputs can never sit under a
hash-exact gate; this module builds the SAME sketch from md5 (the
repo's established cross-engine hash): register index = first byte of
md5(key), rank = leading-zero count of the next 48 bits + 1.  The
gated output is the REGISTER TABLE — pure integers, bit-exact across
engines; the floating-point harmonic-mean estimate stays in a pytest
(within-15% accuracy assertion), never in the gate (CLAUDE.md: the
driver hashes string renderings).

Register aggregation is one map-side-combined groupBy(register) max —
the same linear, skew-free shape as the rest of the pipeline; merging
two sketches is an element-wise max, which is why the structure
rolls up across days/partitions for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HLL_P = 8                 # 2^8 = 256 registers
HLL_BITS = 48             # rank bits taken from md5 hex chars 3..14
_HEX = "0123456789abcdef"


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """(register, max_rank) rows for the distinct values of key_col.
    register = first byte of md5(key); rank = leading zeros of the
    next HLL_BITS bits + 1 (bit length via bin() — identical string
    semantics in Spark and DuckDB)."""
    hdf = df.select(F.md5(F.col(key_col).cast("string")).alias("h"))
    v = F.conv(F.substring("h", 3, HLL_BITS // 4), 16, 10).cast("long")
    reg = F.conv(F.substring("h", 1, 2), 16, 10).cast("int").alias("register")
    rank = (
        F.when(v == F.lit(0), F.lit(HLL_BITS + 1))
        .otherwise(F.lit(HLL_BITS + 1) - F.length(F.bin(v)))
        .cast("int")
        .alias("rank")
    )
    return (
        hdf.select(reg, rank)
        .groupBy("register")
        .agg(F.max("rank").alias("max_rank"))
    )


def sketch_distinct_convs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: the HLL register table over transcript conv_ids.
    The register values are the sketch — deterministic integers, so the
    DuckDB oracle re-derives every register bit-exactly; the estimate
    accuracy sits in tests/test_sketch.py."""
    from jsonld_ex_spark.sources.transcripts import transcripts_df

    return hll_registers(transcripts_df(spark, sf_dir), "conv_id")


def hll_estimate(registers: dict[int, int], m: int = 2 ** HLL_P) -> float:
    """Classic HLL harmonic-mean estimate (with the small-range
    linear-counting correction) from a {register: max_rank} dict;
    empty registers count as rank 0.  Driver-side math over 256 ints —
    NOT part of any gated output."""
    import math

    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -registers.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    zeros = sum(1 for j in range(m) if registers.get(j, 0) == 0)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


def _sketch_oracle() -> str:
    from jsonld_ex_spark.sources.transcripts import transcripts_oracle_cte

    t = transcripts_oracle_cte("lineitem")
    nib = lambda i: f"(strpos('{_HEX}', substr(h, {i}, 1)) - 1)"  # noqa: E731
    # 48-bit value from hex chars 3..14 (independent derivation: nibble
    # arithmetic instead of Spark's conv())
    val = " + ".join(
        f"CAST({nib(3 + i)} AS BIGINT) * {16 ** (HLL_BITS // 4 - 1 - i)}"
        for i in range(HLL_BITS // 4)
    )
    return f"""
WITH t AS ({t}),
k AS (SELECT DISTINCT conv_id FROM t),
h AS (SELECT md5(conv_id) AS h FROM k),
bits AS (
  SELECT CAST({nib(1)} * 16 + {nib(2)} AS INT) AS register,
         ({val}) AS v
  FROM h
),
ranked AS (
  SELECT register,
         CAST(CASE WHEN v = 0 THEN {HLL_BITS + 1}
              ELSE {HLL_BITS + 1} - length(bin(v)) END AS INT) AS rank
  FROM bits
)
SELECT register, max(rank) AS max_rank FROM ranked GROUP BY register"""


# --- Count-Min Sketch -------------------------------------------------------

CMS_D = 4    # hash rows
CMS_W = 64   # columns per row (256 % 64 == 0 → first-md5-byte mod W unbiased)


def _cms_col(d_col, key_col):
    """Column index for hash row d: first byte of md5(d || ':' || key)
    mod CMS_W — the same cross-engine md5 derivation as HLL."""
    h = F.md5(F.concat(d_col.cast("string"), F.lit(":"), key_col))
    return (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % CMS_W).alias("col")


def cms_registers(df: DataFrame, key_col: str) -> DataFrame:
    """(d, col, cnt) register table of the COUNT-MIN sketch over the
    (bag of) key_col values: each item increments one counter per hash
    row.  Point-query estimate = min over d of register[d, col_d(x)] —
    always >= the true count (overestimates only, by collisions).
    Mergeable by element-wise SUM, so per-partition/per-day sketches
    roll up for free — the heavy-hitter companion to the HLL: one
    map-side-combined groupBy, CMS_D*CMS_W integers total regardless
    of corpus size."""
    k = df.select(F.col(key_col).cast("string").alias("k"))
    kd = k.select(
        "k", F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("d")
    )
    return (
        kd.select(F.col("d").cast("int").alias("d"), _cms_col(F.col("d"), F.col("k")))
        .groupBy("d", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_entity_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: the CMS register table over mention events (each
    detected mention increments the sketch) — deterministic integers,
    re-derived bit-exactly by the DuckDB oracle's nibble arithmetic."""
    from jsonld_ex_spark.operators.kg_queries import kg_mentions

    return cms_registers(kg_mentions(spark, sf_dir), "surface_norm")


N_CMS_PROBES = 10  # point-query the first 10 entity surfaces


def cms_entity_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: CMS point queries vs TRUE counts for the first
    N_CMS_PROBES entity surfaces — (surface_norm, true_count,
    cms_estimate), the estimate being min over hash rows.  Both columns
    integer-exact in both engines; the overestimate-only property is a
    pytest invariant."""
    from jsonld_ex_spark.operators.kg_queries import kg_mentions

    m = kg_mentions(spark, sf_dir)
    regs = cms_registers(m, "surface_norm")
    probes = spark.range(N_CMS_PROBES).select(
        F.format_string("ENT_%04d", F.col("id").cast("int")).alias("k")
    )
    pd_ = probes.select(
        "k", F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("d")
    ).select("k", F.col("d").cast("int").alias("d"), _cms_col(F.col("d"), F.col("k")))
    est = (
        pd_.join(regs, on=["d", "col"], how="left")
        .groupBy("k")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )
    true = m.groupBy(F.col("surface_norm").alias("k")).agg(
        F.count(F.lit(1)).alias("true_count")
    )
    return (
        est.join(true, on="k", how="left")
        .select(
            F.col("k").alias("surface_norm"),
            F.coalesce("true_count", F.lit(0)).alias("true_count"),
            "cms_estimate",
        )
    )


def _cms_mentions_cte() -> str:
    from jsonld_ex_spark.sources.transcripts import transcripts_oracle_cte

    t = transcripts_oracle_cte("lineitem")
    return f"""
t AS ({t}),
m AS (
  SELECT DISTINCT conv_id, turn_idx, mm AS k
  FROM t, unnest(regexp_extract_all(text, 'ENT_[0-9]{{4}}')) AS u(mm)
),
d AS (SELECT unnest(range(0, {CMS_D})) AS d),
cells AS (
  SELECT CAST(d.d AS INT) AS d,
         CAST(((strpos('{_HEX}', substr(md5(concat(d.d, ':', m.k)), 1, 1)) - 1) * 16
             + (strpos('{_HEX}', substr(md5(concat(d.d, ':', m.k)), 2, 1)) - 1)) % {CMS_W} AS INT) AS col
  FROM m CROSS JOIN d
),
regs AS (SELECT d, col, count(*) AS cnt FROM cells GROUP BY d, col)"""


def _cms_registers_oracle() -> str:
    return f"WITH {_cms_mentions_cte()}\nSELECT d, col, cnt FROM regs"


def _cms_estimates_oracle() -> str:
    return f"""
WITH {_cms_mentions_cte()},
probes AS (SELECT printf('ENT_%04d', CAST(i AS INT)) AS k
           FROM unnest(range(0, {N_CMS_PROBES})) AS t2(i)),
pcells AS (
  SELECT p.k, CAST(d.d AS INT) AS d,
         CAST(((strpos('{_HEX}', substr(md5(concat(d.d, ':', p.k)), 1, 1)) - 1) * 16
             + (strpos('{_HEX}', substr(md5(concat(d.d, ':', p.k)), 2, 1)) - 1)) % {CMS_W} AS INT) AS col
  FROM probes p CROSS JOIN d
),
est AS (
  SELECT pc.k, CAST(min(COALESCE(r.cnt, 0)) AS BIGINT) AS cms_estimate
  FROM pcells pc LEFT JOIN regs r ON r.d = pc.d AND r.col = pc.col
  GROUP BY pc.k
),
trues AS (SELECT k, count(*) AS true_count FROM m GROUP BY k)
SELECT e.k AS surface_norm,
       CAST(COALESCE(t2.true_count, 0) AS BIGINT) AS true_count,
       e.cms_estimate
FROM est e LEFT JOIN trues t2 ON t2.k = e.k"""


def queries():
    return {
        "sketch_distinct_convs": sketch_distinct_convs,
        "cms_entity_registers": cms_entity_registers,
        "cms_entity_estimates": cms_entity_estimates,
    }


def oracle_sql():
    return {
        "sketch_distinct_convs": _sketch_oracle(),
        "cms_entity_registers": _cms_registers_oracle(),
        "cms_entity_estimates": _cms_estimates_oracle(),
    }
