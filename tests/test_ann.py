"""ANN quality floor: the banded sign-LSH path must keep recall@k ≥ 0.9
against the exact bruteforce baseline on the fixtures (the config dial
is N_ANN_BANDS × PLANES_PER_BAND — see ann_ops module docstring)."""

from __future__ import annotations

import pytest

from jsonld_ex_spark.functions import ann_ops

from tests.spark_fixtures import spark  # noqa: F401

pytestmark = pytest.mark.spark


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_lsh_recall_at_least_090(spark, sf_dir):  # noqa: F811
    rows = ann_ops.ann_recall(spark, sf_dir).collect()
    assert len(rows) == ann_ops.N_QUERIES
    avg = sum(r["n_hits"] for r in rows) / (len(rows) * ann_ops.TOP_K)
    assert avg >= 0.9, f"recall@{ann_ops.TOP_K} = {avg} at {sf_dir}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ivf_recall_at_least_090(spark, sf_dir):  # noqa: F811
    brute = {(r["query_id"], r["cand_id"]) for r in ann_ops.ann_topk_bruteforce(spark, sf_dir).collect()}
    ivf = {(r["query_id"], r["cand_id"]) for r in ann_ops.ann_ivf_topk(spark, sf_dir).collect()}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.9, f"IVF recall@{ann_ops.TOP_K} = {recall} at {sf_dir}"
