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


def queries():
    return {"sketch_distinct_convs": sketch_distinct_convs}


def oracle_sql():
    return {"sketch_distinct_convs": _sketch_oracle()}
