"""Scale-shape guarantees for the dedup operators:

* dedup_embedding_cosine finds planted near-duplicates through the
  banded sign-LSH candidate path (recall machinery actually works —
  the sf testdata has no cos ≥ 0.9 pairs, so the gate alone proves
  only agreement on the empty set);
* no operator module materializes a table on the driver (toPandas /
  collect) — the round-1 scale-killer;
* a planted boilerplate shingle (present in every doc) is dropped by
  the document-frequency cap instead of creating a quadratic
  candidate bucket.
"""

from __future__ import annotations

import inspect
import os

import numpy as np
import pandas as pd
import pytest

from jsonld_ex_spark.functions import ann_ops, dedup_ops, multimodal_ops, relational_ops, text_ops

from tests.spark_fixtures import spark  # noqa: F401

pytestmark = pytest.mark.spark


def test_no_driver_side_materialization_in_function_modules():
    """The operator modules must never collect a table to the driver:
    round 1 shipped a q.toPandas() broadcast build that would OOM the
    driver at 100 TB.  (DataFrame.collect in tests/bench is fine — this
    guards the operator implementations only.)"""
    for mod in (dedup_ops, ann_ops, text_ops, relational_ops, multimodal_ops):
        src = inspect.getsource(mod)
        assert ".toPandas()" not in src, f"{mod.__name__} collects to the driver"
        assert ".collect()" not in src, f"{mod.__name__} collects to the driver"


def _write_embeddings(tmp_path, vecs: np.ndarray) -> str:
    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [v.astype(np.float32).tolist() for v in vecs]}
    )
    pdf.to_parquet(os.path.join(tmp_path, "embeddings.parquet"))
    return str(tmp_path)


def test_embedding_cosine_finds_planted_near_dup(spark, tmp_path):  # noqa: F811
    rng = np.random.RandomState(7)
    dim = 64
    n = 40
    vecs = rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # plant: vec 30 is a tiny perturbation of vec 25 (cosine ≈ 0.999)
    vecs[30] = vecs[25] + 0.01 * rng.normal(size=dim)
    vecs[30] /= np.linalg.norm(vecs[30])
    sf_dir = _write_embeddings(tmp_path, vecs)
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in dedup_ops.dedup_embedding_cosine(spark, sf_dir).collect()
    }
    assert (25, 30) in pairs
    # and no wildly-dissimilar pair sneaks past the exact threshold filter
    for a, b in pairs:
        cos = float(vecs[a] @ vecs[b])
        assert cos >= 0.89, f"pair ({a},{b}) has cosine {cos}"


def _write_documents(tmp_path, texts: list[str]) -> str:
    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts, "n_chars": [len(t) for t in texts]}
    )
    pdf.to_parquet(os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_ngram_jaccard_drops_boilerplate_shingles(spark, tmp_path):  # noqa: F811
    """Every doc shares one boilerplate sentence; without the DF cap the
    shingle self-join would emit all C(n,2) pairs.  With the cap, only
    the genuinely-duplicated docs pair up."""
    boiler = "subscribe to our newsletter for updates"
    n = dedup_ops.SHINGLE_DF_CAP + 50
    texts = [f"{boiler} unique document number {i} about topic {i * 17}" for i in range(n)]
    texts[3] = texts[2]  # one genuine near-dup pair (identical bodies)
    sf_dir = _write_documents(tmp_path, texts)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_ops.dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert (2, 3) in pairs
    # boilerplate alone must NOT pair up the other docs
    assert len(pairs) < 10, f"boilerplate explosion: {len(pairs)} pairs"


def test_shingle_df_cap_filters_hot_shingles(spark, tmp_path):  # noqa: F811
    boiler = "one two three"
    n = dedup_ops.SHINGLE_DF_CAP + 10
    texts = [f"{boiler} filler{i} filler{i} filler{i}" for i in range(n)]
    sf_dir = _write_documents(tmp_path, texts)
    shingles = dedup_ops._shingles(spark, sf_dir)
    assert shingles.where("shingle = 'one two three'").count() == 0


def test_dedup_clusters_transitive_components(spark, tmp_path):  # noqa: F811
    """A chain of successive near-duplicates (B = A + a word, C = B
    verbatim) must land in ONE cluster with the min doc_id canonical —
    clusters deliver the transitive closure that pairwise output can't
    — and an unrelated doc stays a singleton cluster of itself."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        base,                       # 0: A
        base + " lambdaword",       # 1: B ~ A (superset shingles, J≈0.89)
        base + " lambdaword",       # 2: C == B (all bands agree)
        "totally different content about spark plans here now",  # 3: singleton
    ]
    sf_dir = _write_documents(tmp_path, texts)
    rows = {r["doc_id"]: r for r in dedup_ops.dedup_clusters(spark, sf_dir).collect()}
    assert rows[0]["cluster_id"] == rows[1]["cluster_id"] == rows[2]["cluster_id"] == 0
    assert rows[3]["cluster_id"] == 3 and rows[3]["is_canonical"]
    assert rows[0]["is_canonical"] and not rows[1]["is_canonical"] and not rows[2]["is_canonical"]


def test_connected_components_long_chain_converges_logarithmically(spark):  # noqa: F811
    """Pointer-doubling hardening: a planted 1,000-node CHAIN (diameter
    999 — the worst case for plain min-label propagation, which needs
    one superstep per hop) must converge in <= 12 supersteps."""
    from pyspark.sql import functions as F

    from jsonld_ex_spark.functions.dedup_ops import _connected_components

    n = 1000
    nodes = spark.range(n).select(F.col("id").alias("doc_id"), F.col("id").alias("cluster_id"))
    fwd = spark.range(n - 1).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels, used = _connected_components(nodes, edges, max_iters=12)
    rows = labels.collect()
    assert used <= 12
    assert all(r["cluster_id"] == 0 for r in rows)
    assert sum(r["is_canonical"] for r in rows) == 1


def test_connected_components_raises_on_non_convergence(spark):  # noqa: F811
    """Exhausting max_iters without a fixpoint must raise, never return
    partially-propagated labels (curate_corpus drops rows by
    is_canonical — silent corruption is the failure mode)."""
    from pyspark.sql import functions as F

    from jsonld_ex_spark.functions.dedup_ops import _connected_components

    n = 200
    nodes = spark.range(n).select(F.col("id").alias("doc_id"), F.col("id").alias("cluster_id"))
    fwd = spark.range(n - 1).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    with pytest.raises(RuntimeError, match="did not converge"):
        _connected_components(nodes, edges, max_iters=2)


def test_substring_spans_finds_planted_copy(spark, tmp_path):  # noqa: F811
    """A 14-token passage copied between two otherwise-different docs
    must surface with exactly max_span_tokens=14; unrelated docs with
    only short overlaps must not appear."""
    import duckdb

    from jsonld_ex_spark.functions.dedup_ops import (
        SUBSTR_MIN_SPAN,
        dedup_substring_spans,
        oracle_sql,
    )

    passage = " ".join(f"w{i}" for i in range(14))
    rows = [
        (1, f"alpha beta {passage} gamma delta", "en", "s", 0),
        (2, f"one two three {passage} four five six", "en", "s", 0),
        (3, "alpha beta gamma delta one two three four", "en", "s", 0),
        (4, "totally unrelated tokens here nine ten eleven", "en", "s", 0),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        (r["doc_a"], r["doc_b"]): r["max_span_tokens"]
        for r in dedup_substring_spans(spark, d).collect()
    }
    assert out == {(1, 2): 14}
    assert SUBSTR_MIN_SPAN > 8  # docs 1/3 share 2+2 tokens only — excluded
    # oracle agrees on the planted fixture too
    con = duckdb.connect()
    con.execute(
        # Spark writes a directory; DuckDB needs the part-file glob
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    duck = {
        (a, b): s
        for a, b, s in con.execute(oracle_sql()["dedup_substring_spans"]).fetchall()
    }
    assert duck == out


def test_substring_spans_short_and_empty_docs_no_crash(spark, tmp_path):  # noqa: F811
    """Docs shorter than the k-gram width (and empty/null text) must
    contribute zero grams, not crash the transform (Spark's
    sequence(1, 0) DESCENDS; slice(t, 0, k) throws)."""
    from jsonld_ex_spark.functions.dedup_ops import dedup_substring_spans

    rows = [
        (1, "one two", "en", "s", 0),
        (2, "", "en", "s", 0),
        (3, None, "en", "s", 0),
        (4, "a b c d e", "en", "s", 0),  # exactly k-1 tokens
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    assert dedup_substring_spans(spark, d).count() == 0
