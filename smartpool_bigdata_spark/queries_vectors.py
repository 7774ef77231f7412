"""Similarity-search queries over the ``embeddings`` table: exact
brute-force cosine top-k (the correctness baseline), IVF-style bucketed ANN
(the scale path), and banded random-hyperplane sign-LSH embedding
near-duplicate detection.

All UDF-free: dot products are ``zip_with`` + ``aggregate`` folds whose
sequential order makes the double arithmetic bit-identical to DuckDB's
``list_dot_product`` (validated), so every query gets a full value-hash
oracle — including the ANN variants.

Scale contracts (the 100 TB story):

* Every broadcast side is FIXED-SIZE: centroids and the demo query set are
  deterministic k-row samples (``sample_fixed_k`` — smallest md5(salt||id)),
  so the broadcast is O(k·d) at any corpus size. Round 2 used ``vec_id %
  m`` filters whose size grew O(n) — the textbook non-broadcastable
  "small" side.
* Near-dup never does all-pairs: b bands × r random-hyperplane sign bits,
  one shuffle on (band_idx, band_val); candidates scale with bucket
  collisions. The hyperplanes are pseudo-random integer weights derived
  arithmetically from (band, row, dim), and the vector is quantized to
  int64 (floor(x·10⁶)) first, so the sign sums are exact integer
  arithmetic — bit-identical across engines and immune to float summation
  order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smartpool_bigdata_spark.ops.relational import top_n_per_group
from smartpool_bigdata_spark.ops.vectors import (
    as_double_array,
    assign_ivf_buckets,
    brute_force_knn,
    sample_fixed_k,
    spark_cosine,
    spark_dot,
)
from smartpool_bigdata_spark.queries import query, _ts as _t

_DUCK_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

# Fixed sample sizes — independent of corpus size by design (see module
# docstring). 16 coarse cells keep sf0.01's 500-vector corpus at ~30
# vectors/bucket; at 10⁹ vectors you'd raise k, but it stays YOUR dial,
# not a function of n.
N_CENTROIDS = 16
N_QUERIES = 8


def _duck_cos(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 4)"
    )


def _duck_sample(k: int, salt: str) -> str:
    """DuckDB twin of ops.vectors.sample_fixed_k over the corpus CTE."""
    return (
        f"SELECT vec_id, v FROM corpus "
        f"ORDER BY md5('{salt}' || CAST(vec_id AS VARCHAR)) LIMIT {k}"
    )


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return as_double_array(emb, "embedding", "v").select("vec_id", "v")


_DUCK_KNN_PRELUDE = f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM ({_duck_sample(N_QUERIES, 'q')}))
"""


@query(
    "knn_brute_force",
    oracle=f"""{_DUCK_KNN_PRELUDE},
    sims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, {_duck_cos('qv', 'v')} AS sim
        FROM corpus c JOIN q ON c.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
          FROM sims)
    WHERE rn <= 5
    """,
    description="Exact cosine top-5 ANN baseline: broadcast a FIXED-SIZE "
    "deterministic query sample (8 rows at any corpus size) against the "
    "corpus scan, per-partition window top-k. O(n·q·d) but one corpus "
    "scan, no corpus shuffle; sims rounded to 4dp before ranking with id "
    "tie-break so the ranking is ulp-noise-proof.",
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    qs = sample_fixed_k(corpus, N_QUERIES, salt="q").select(
        F.col("vec_id").alias("query_id"), F.col("v")
    )
    return brute_force_knn(corpus, qs, k=5)


@query(
    "knn_ivf",
    oracle=f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, v AS cv
              FROM ({_duck_sample(N_CENTROIDS, 'c')})),
    scored AS (
        SELECT c.vec_id, c.v, t.centroid_id AS bucket, {_duck_cos('c.v', 't.cv')} AS csim
        FROM corpus c CROSS JOIN cents t
    ),
    assigned AS (
        SELECT vec_id, v, bucket
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, bucket ASC) AS rn
              FROM scored)
        WHERE rn = 1
    ),
    qids AS (SELECT vec_id FROM ({_duck_sample(N_QUERIES, 'q')})),
    q AS (SELECT a.vec_id AS query_id, a.v AS qv, a.bucket
          FROM assigned a JOIN qids USING (vec_id)),
    sims AS (
        SELECT q.query_id, a.vec_id AS neighbor_id, {_duck_cos('q.qv', 'a.v')} AS sim
        FROM assigned a JOIN q ON a.bucket = q.bucket AND a.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
          FROM sims)
    WHERE rn <= 5
    """,
    description="IVF ANN: corpus assigned once to its max-cosine centroid "
    "(scan + O(k·d) broadcast of a FIXED 16-centroid deterministic sample "
    "— constant-size at any corpus scale), each query probes ONLY its "
    "centroid's bucket — candidate count drops ~n_centroids×. The bucket "
    "column doubles as the bucketBy key for a pre-partitioned 100 TB layout. "
    "Recall < 1 by construction; knn_brute_force is the recall oracle.",
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    cents = sample_fixed_k(corpus, N_CENTROIDS, salt="c").select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    assigned = assign_ivf_buckets(corpus, cents).withColumn(
        "__nrm", F.expr(f"sqrt({spark_dot('v', 'v')})")
    )
    qids = sample_fixed_k(corpus, N_QUERIES, salt="q").select("vec_id")
    qs = assigned.join(F.broadcast(qids), "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("__nrm").alias("__qnrm"),
        "bucket",
    )
    # per-row norms precomputed; dot/(qnrm*nrm) is bit-identical to the
    # inline cosine (same fold and grouping) at 1/3 the pairwise cost
    sims = (
        assigned.join(F.broadcast(qs), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(f"round({spark_dot('qv', 'v')} / (__qnrm * __nrm), 4)").alias("sim"),
        )
    )
    return top_n_per_group(
        sims,
        keys=["query_id"],
        order_by=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        n=5,
        method="row_number",
        rank_col="rank",
    )


@query(
    "knn_ivf_multiprobe",
    oracle=f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, v AS cv
              FROM ({_duck_sample(N_CENTROIDS, 'c')})),
    scored AS (
        SELECT c.vec_id, c.v, t.centroid_id AS bucket, {_duck_cos('c.v', 't.cv')} AS csim
        FROM corpus c CROSS JOIN cents t
    ),
    assigned AS (
        SELECT vec_id, v, bucket
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, bucket ASC) AS rn
              FROM scored)
        WHERE rn = 1
    ),
    qids AS (SELECT vec_id FROM ({_duck_sample(N_QUERIES, 'q')})),
    qprobe AS (
        SELECT vec_id AS query_id, v AS qv, bucket
        FROM (SELECT s.*, row_number() OVER (
                  PARTITION BY s.vec_id ORDER BY s.csim DESC, s.bucket ASC) AS rn
              FROM scored s JOIN qids USING (vec_id))
        WHERE rn <= 2
    ),
    sims AS (
        SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id, {_duck_cos('q.qv', 'a.v')} AS sim
        FROM assigned a JOIN qprobe q ON a.bucket = q.bucket AND a.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
          FROM sims)
    WHERE rn <= 5
    """,
    description="IVF with multi-probe (nprobe=2): each query searches its "
    "TWO nearest centroids' buckets — the standard recall lever (candidates "
    "x2, still orders of magnitude under brute force). Near-boundary "
    "queries recover neighbors that fell in the adjacent cell; the recall "
    "test asserts multiprobe recall >= single-probe vs the exact baseline. "
    "Broadcasts: fixed 16 centroids + fixed 8 queries — O(k·d) at any n.",
)
def knn_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    cents = sample_fixed_k(corpus, N_CENTROIDS, salt="c").select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    cents_n = cents.withColumn("__cnrm", F.expr(f"sqrt({spark_dot('cv', 'cv')})"))
    assigned = assign_ivf_buckets(corpus, cents).withColumn(
        "__nrm", F.expr(f"sqrt({spark_dot('v', 'v')})")
    )
    qids = sample_fixed_k(corpus, N_QUERIES, salt="q").select("vec_id")
    qs = corpus.join(F.broadcast(qids), "vec_id").select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    ).withColumn("__qnrm", F.expr(f"sqrt({spark_dot('qv', 'qv')})"))
    qscore = qs.crossJoin(F.broadcast(cents_n)).select(
        "query_id", "qv", "__qnrm",
        F.col("centroid_id").alias("bucket"),
        F.expr(f"round({spark_dot('qv', 'cv')} / (__qnrm * __cnrm), 4)").alias("csim"),
    )
    qbuckets = top_n_per_group(
        qscore,
        keys=["query_id"],
        order_by=[F.col("csim").desc(), F.col("bucket").asc()],
        n=2,
        method="row_number",
    ).select("query_id", "qv", "__qnrm", "bucket")
    sims = (
        assigned.join(F.broadcast(qbuckets), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(f"round({spark_dot('qv', 'v')} / (__qnrm * __nrm), 4)").alias("sim"),
        )
        .distinct()
    )
    return top_n_per_group(
        sims,
        keys=["query_id"],
        order_by=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        n=5,
        method="row_number",
        rank_col="rank",
    )


# ---------------------------------------------------------------------------
# Embedding near-dup: banded random-hyperplane sign-LSH (SRP / SimHash for
# vectors — Charikar STOC'02), replacing round 2's single 16-bit
# axis-aligned band. b=8 bands × r=16 sign bits each:
#
# * A pair at angle θ matches ONE band with p = (1 - θ/π)^16; at cosine
#   0.99 (θ ≈ 0.1415 rad) that's ≈ 0.478 per band, so P(≥1 of 8 bands) ≈
#   1 - (1-0.478)^8 ≈ 0.994 — near-full recall at the threshold.
# * A RANDOM pair (θ ≈ π/2) collides per band with p ≈ 2⁻¹⁶, so expected
#   per-band bucket size is n/65536 with INDEPENDENT pseudo-random
#   hyperplanes per band — unlike axis-aligned sign bits, correlated
#   coordinates can't produce one hot bucket in every band.
# * Exact duplicates quantize identically → identical band values in all
#   8 bands → recall 1.0 for planted dups, regardless of the bound above.
#
# The hyperplane weights are pseudo-random integers derived from the
# (band·bits+row, dim) index pair via a QUADRATIC mix (see _w_expr for
# why affine mixes degenerate), and the vector is quantized to int64
# (floor(x·10⁶)) first, so each sign test is an exact integer dot: no
# float summation order to disagree on between engines, and
# |q|·|W|·dim ≈ 10¹⁴ stays far inside int64.
# ---------------------------------------------------------------------------

from smartpool_bigdata_spark.ops.vectors import (  # noqa: E402
    LSH_BANDS,
    LSH_BITS,
    LSH_QSCALE,
    lsh_band_signatures,
)

_QSCALE = f"{LSH_QSCALE}D"


def _w_expr(b: str, r: str, j: str) -> str:
    """Pseudo-random integer hyperplane weight, identical in both dialects.

    The (plane, dim) index is mixed QUADRATICALLY before the multiply-mod:
    any affine mix ((αh + βj)·M) mod p is separable into f(h)+g(j) mod p —
    with stride p it even cancels h entirely, which made every plane
    identical (two buckets per band, ~n²/4 candidates; caught by the
    bucket-spread test below). m² injects the h·j cross term, so planes
    decorrelate. |W| ≤ 501001, m² ≤ 2.8e14 — all exact in int64.
    """
    m = f"CAST((({b}) * {LSH_BITS} + ({r})) * 131071 + ({j}) AS BIGINT)"
    return f"((((({m}) * ({m})) % 1000003) * 2654435761) % 1000003 - 501001)"


def _spark_band_vals(q: str) -> str:
    w = _w_expr("b", "r", "j")
    return (
        f"transform(sequence(0, {LSH_BANDS - 1}), b -> "
        f"aggregate(sequence(0, {LSH_BITS - 1}), cast(0 as bigint), (acc, r) -> acc + "
        f"CASE WHEN aggregate(sequence(1, size({q})), cast(0 as bigint), "
        f"(s, j) -> s + element_at({q}, j) * {w}) > 0 "
        f"THEN shiftleft(cast(1 as bigint), r) ELSE cast(0 as bigint) END))"
    )


def _duck_band_val(q: str, b: str) -> str:
    w = _w_expr(b, "r", "j")
    return (
        f"list_aggregate(list_transform(range(0, {LSH_BITS}), r -> "
        f"CASE WHEN list_aggregate(list_transform(range(1, len({q}) + 1), j -> "
        f"{q}[j] * {w}), 'sum') > 0 "
        f"THEN (1::BIGINT << r) ELSE 0::BIGINT END), 'sum')"
    )


def _embedding_pairs_cte() -> str:
    """WITH-body producing the verified near-dup ``pairs`` CTE (shared by
    the pairs query and the clustering query's oracle)."""
    band_selects = "\n        UNION ALL\n".join(
        f"        SELECT vec_id, {b} AS band_idx, "
        f"{_duck_band_val('q', str(b))} AS band_val FROM quant"
        for b in range(LSH_BANDS)
    )
    return f"""corpus AS (
        SELECT vec_id, {_DUCK_V} AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, {_DUCK_V} AS v FROM embeddings
        WHERE vec_id % 10 = 1
    ),
    quant AS (
        SELECT vec_id,
               list_transform(v, x -> CAST(floor(x * 1000000) AS BIGINT)) AS q
        FROM corpus
    ),
    banded AS (
{band_selects}
    ),
    cand AS (
        SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
        FROM banded l JOIN banded r
          ON l.band_idx = r.band_idx AND l.band_val = r.band_val
         AND l.vec_id < r.vec_id
    ),
    pairs AS (
        SELECT c.vec_a, c.vec_b, {_duck_cos('a.v', 'b.v')} AS sim
        FROM cand c
        JOIN corpus a ON a.vec_id = c.vec_a
        JOIN corpus b ON b.vec_id = c.vec_b
        WHERE {_duck_cos('a.v', 'b.v')} >= 0.99
    )"""


def _embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    planted = corpus.filter(F.col("vec_id") % 10 == 1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "v"
    )
    full = corpus.union(planted)
    # Band signatures via the vectorized int64-matmul op (bit-identical to
    # the _spark_band_vals expression form — parity-pinned in
    # tests/test_vector_ops.py — and ~100× faster than interpreting 8×16
    # sign sums per row as Catalyst lambdas). persist: the banded frame is
    # referenced twice by the self-join; the barrier also keeps the Python
    # stage from running once per join side.
    sigs = lsh_band_signatures(full, "vec_id", "v").persist()
    banded = sigs.select(
        "vec_id", F.posexplode("bands").alias("band_idx", "band_val")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("vec_a"), F.col("r.vec_id").alias("vec_b"))
        .distinct()
    )
    va = full.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    vb = full.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.expr(f"round({spark_cosine('va', 'vb')}, 4)").alias("sim"),
        )
        .filter(F.col("sim") >= 0.99)
    )


@query(
    "embedding_near_dup",
    oracle=f"""
    WITH {_embedding_pairs_cte()}
    SELECT vec_a, vec_b, sim FROM pairs
    """,
    description="Embedding-cosine near-dup via banded random-hyperplane "
    "sign-LSH: 8 bands × 16 pseudo-random-hyperplane sign bits over the "
    "int64-quantized vector, one shuffle on (band_idx, band_val), "
    "same-bucket pairs verified at cosine >= 0.99, on corpus ∪ planted "
    "duplicates. Per-band collision p≈2^-16 for random pairs with "
    "INDEPENDENT planes per band (no hot axis-aligned buckets); recall "
    "≈0.994 at the 0.99 threshold and exactly 1.0 for identical vectors.",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _embedding_near_dup_pairs(spark, sf_dir)


@query(
    "embedding_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_embedding_pairs_cte()},
    edges AS (
        SELECT vec_a AS a, vec_b AS b FROM pairs
        UNION
        SELECT vec_b AS a, vec_a AS b FROM pairs
    ),
    reach(node, r) AS (
        SELECT DISTINCT a AS node, a AS r FROM edges
        UNION
        SELECT e.b AS node, reach.r FROM reach JOIN edges e ON e.a = reach.node
    ),
    comp AS (
        SELECT node, min(r) AS component FROM reach GROUP BY node
    )
    SELECT component, count(*) AS cluster_size
    FROM comp GROUP BY component
    """,
    description="Embedding near-duplicate CLUSTERING: banded "
    "random-hyperplane sign-LSH pairs (cosine >= 0.99) -> iterative "
    "connected components (HashMin label propagation) -> cluster sizes. "
    "The same pairs-to-keep-list step as doc_dup_clusters, over the vector "
    "modality. Oracle: DuckDB RECURSIVE CTE reachability closure — a full "
    "value-hash check of an iterative distributed algorithm on embeddings.",
    skip_bench=True,  # the pair stage is benched as embedding_near_dup
)
def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.ops.graph import connected_components

    pairs = _embedding_near_dup_pairs(spark, sf_dir)
    cc = connected_components(pairs, src="vec_a", dst="vec_b")
    return cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))


@query(
    "knn_ivf_kmeans",
    oracle=f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    cents0 AS (SELECT vec_id AS centroid_id, v AS cv
               FROM ({_duck_sample(N_CENTROIDS, 'c')})),
    scored0 AS (
        SELECT c.vec_id, c.v, t.centroid_id AS bucket, {_duck_cos('c.v', 't.cv')} AS csim
        FROM corpus c CROSS JOIN cents0 t
    ),
    assigned0 AS (
        SELECT vec_id, v, bucket
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, bucket ASC) AS rn
              FROM scored0)
        WHERE rn = 1
    ),
    ex AS (
        SELECT bucket, unnest(v) AS x, generate_subscripts(v, 1) AS j
        FROM assigned0
    ),
    means AS (
        SELECT bucket, j,
               round(CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE)
                     / count(x), 6) AS m
        FROM ex GROUP BY bucket, j
    ),
    cents AS (
        SELECT bucket AS centroid_id, list(m ORDER BY j) AS cv
        FROM means GROUP BY bucket
    ),
    scored AS (
        SELECT c.vec_id, c.v, t.centroid_id AS bucket, {_duck_cos('c.v', 't.cv')} AS csim
        FROM corpus c CROSS JOIN cents t
    ),
    assigned AS (
        SELECT vec_id, v, bucket
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, bucket ASC) AS rn
              FROM scored)
        WHERE rn = 1
    ),
    qids AS (SELECT vec_id FROM ({_duck_sample(N_QUERIES, 'q')})),
    q AS (SELECT a.vec_id AS query_id, a.v AS qv, a.bucket
          FROM assigned a JOIN qids USING (vec_id)),
    sims AS (
        SELECT q.query_id, a.vec_id AS neighbor_id, {_duck_cos('q.qv', 'a.v')} AS sim
        FROM assigned a JOIN q ON a.bucket = q.bucket AND a.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
          FROM sims)
    WHERE rn <= 5
    """,
    description="IVF with ONE Lloyd refinement of the fixed-k seed "
    "centroids (real IVF training, not just sampling): assign -> "
    "per-bucket decimal-stable element-wise mean (rounded 6dp, so the "
    "refined centroids are bit-identical across engines and "
    "partitionings — a full value-hash oracle over an iterative float "
    "algorithm) -> reassign -> probe own bucket, top-5. Refinement cost "
    "per iteration: one O(k·d) broadcast assign + one explode that "
    "partially aggregates map-side to <= k·d rows per partition; "
    "centroids never exceed O(k·d) anywhere.",
    skip_bench=True,  # same probe plan as knn_ivf; the refine step is the
    # only addition and is exercised at gate scale
)
def knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.ops.vectors import kmeans_refine

    corpus = _corpus(spark, sf_dir)
    seeds = sample_fixed_k(corpus, N_CENTROIDS, salt="c").select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    cents = kmeans_refine(corpus, seeds, iters=1)
    assigned = assign_ivf_buckets(corpus, cents).withColumn(
        "__nrm", F.expr(f"sqrt({spark_dot('v', 'v')})")
    )
    qids = sample_fixed_k(corpus, N_QUERIES, salt="q").select("vec_id")
    qs = assigned.join(F.broadcast(qids), "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("__nrm").alias("__qnrm"),
        "bucket",
    )
    sims = (
        assigned.join(F.broadcast(qs), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(f"round({spark_dot('qv', 'v')} / (__qnrm * __nrm), 4)").alias("sim"),
        )
    )
    return top_n_per_group(
        sims,
        keys=["query_id"],
        order_by=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        n=5,
        method="row_number",
        rank_col="rank",
    )


@query(
    "embedding_dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_embedding_pairs_cte()},
    edges AS (
        SELECT vec_a AS a, vec_b AS b FROM pairs
        UNION
        SELECT vec_b AS a, vec_a AS b FROM pairs
    ),
    reach(node, r) AS (
        SELECT DISTINCT a AS node, a AS r FROM edges
        UNION
        SELECT e.b AS node, reach.r FROM reach JOIN edges e ON e.a = reach.node
    ),
    comp AS (
        SELECT node, min(r) AS component FROM reach GROUP BY node
    ),
    dropped AS (
        SELECT node FROM comp WHERE node != component
    )
    SELECT CASE WHEN c.vec_id >= 1000000 THEN 'planted' ELSE 'original' END AS origin,
           count(*) AS n_survivors
    FROM corpus c
    WHERE c.vec_id NOT IN (SELECT node FROM dropped)
    GROUP BY 1
    """,
    description="End-to-end embedding dedup: banded sign-LSH pairs -> "
    "connected components -> drop every clustered vector except its "
    "cluster's minimum id -> surviving corpus counts by origin. Every "
    "planted duplicate clusters with its original (exact copies share all "
    "bands), so survivors = originals only — the keep-one-representative "
    "step a multimodal training-data pipeline ships, mirroring "
    "doc_dedup_survivors on the vector modality.",
    skip_bench=True,
)
def embedding_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.ops.graph import connected_components

    corpus = _corpus(spark, sf_dir)
    planted = corpus.filter(F.col("vec_id") % 10 == 1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "v"
    )
    full = corpus.union(planted)
    pairs = _embedding_near_dup_pairs(spark, sf_dir)
    cc = connected_components(pairs, src="vec_a", dst="vec_b")
    dropped = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("vec_id")
    )
    survivors = full.join(F.broadcast(dropped), "vec_id", "left_anti")
    return survivors.groupBy(
        F.when(F.col("vec_id") >= 1_000_000, "planted")
        .otherwise("original")
        .alias("origin")
    ).agg(F.count(F.lit(1)).alias("n_survivors"))


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's fine quantizer) — 64 dims as 4 subspaces
# × 16 dims, 16 codes per subspace. A vector compresses to 4 code ids
# (≈4 B vs 256 B of float32): at 10⁹ vectors the encoded corpus fits in
# executor memory where raw vectors cannot, and query-time ADC (asymmetric
# distance computation) replaces d-dim folds per pair with 4 lookups into
# a per-query 4×16 distance table. Codebooks here are deterministic
# fixed-size samples (the sample_fixed_k contract; kmeans_refine is the
# orthogonal quality upgrade, proven separately in knn_ivf_kmeans).
# ---------------------------------------------------------------------------

PQ_SUBSPACES = 4
PQ_SUBDIM = 16
PQ_CODES = 16


def _pq_duck_cb() -> str:
    """Codebook CTE: per subspace, 16 deterministically sampled corpus
    vectors sliced to that subspace; the sampled vec_id IS the code id."""
    blocks = []
    for s in range(PQ_SUBSPACES):
        lo, hi = PQ_SUBDIM * s + 1, PQ_SUBDIM * (s + 1)
        blocks.append(
            f"        SELECT {s} AS sub, vec_id AS code, v[{lo}:{hi}] AS csub\n"
            f"        FROM ({_duck_sample(PQ_CODES, f'pq{s}')})"
        )
    return "\n        UNION ALL\n".join(blocks)


def _pq_duck_subvecs(src: str, idc: str, out: str) -> str:
    blocks = []
    for s in range(PQ_SUBSPACES):
        lo, hi = PQ_SUBDIM * s + 1, PQ_SUBDIM * (s + 1)
        blocks.append(
            f"        SELECT {idc}, {s} AS sub, v[{lo}:{hi}] AS {out} FROM {src}"
        )
    return "\n        UNION ALL\n".join(blocks)


def _dd(a: str, b: str) -> str:
    return f"list_dot_product({a}, {b})"


@query(
    "knn_pq_adc",
    oracle=f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    cb AS (
{_pq_duck_cb()}
    ),
    subvecs AS (
{_pq_duck_subvecs('corpus', 'vec_id', 'sv')}
    ),
    escore AS (
        SELECT vec_id, sub, code,
               round(2 * {_dd('sv', 'csub')} - {_dd('csub', 'csub')}, 4) AS sc
        FROM subvecs JOIN cb USING (sub)
    ),
    encoded AS (
        SELECT vec_id, sub, code
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id, sub ORDER BY sc DESC, code ASC) AS rn
              FROM escore)
        WHERE rn = 1
    ),
    qids AS (SELECT vec_id AS query_id FROM ({_duck_sample(N_QUERIES, 'q')})),
    qsubs AS (
        SELECT query_id, sub, sv AS qsv
        FROM ({_pq_duck_subvecs('corpus', 'vec_id', 'sv')}) t
        JOIN qids ON t.vec_id = qids.query_id
    ),
    qdist AS (
        SELECT query_id, sub, code,
               {_dd('qsv', 'qsv')} - 2 * {_dd('qsv', 'csub')} + {_dd('csub', 'csub')} AS contrib
        FROM qsubs JOIN cb USING (sub)
    ),
    adc AS (
        SELECT d.query_id, e.vec_id AS neighbor_id,
               round(CAST(sum(CAST(contrib AS DECIMAL(38,10))) AS DOUBLE), 4) AS adc_dist
        FROM encoded e JOIN qdist d ON e.sub = d.sub AND e.code = d.code
        WHERE e.vec_id != d.query_id
        GROUP BY d.query_id, e.vec_id
    )
    SELECT query_id, neighbor_id, adc_dist, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id ASC) AS rn
          FROM adc)
    WHERE rn <= 3
    """,
    description="Product quantization with asymmetric distance (IVF-PQ's "
    "fine quantizer): 64-dim vectors encode to 4 code ids (one 16-code "
    "codebook per 16-dim subspace — ≈64× compression, the trick that "
    "fits a billion-vector index in memory), and each query builds a "
    "4×16 lookup table so candidate distance is 4 table lookups instead "
    "of a 64-dim fold. Encoding = argmin L2² via the 2a·b − b·b form "
    "(a·a constant per row), rounded + code-tie-broken so ranking is "
    "ulp-noise-proof; ADC sums per-subspace contributions through exact "
    "DECIMAL so the sum is order-independent. Codebooks are "
    "deterministic fixed-size samples (O(codes·d) broadcast at any "
    "corpus size); kmeans_refine is the orthogonal quality upgrade. "
    "Full value-hash oracle — DuckDB reproduces encode AND ADC "
    "bit-for-bit.",
)
def knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)

    def subspace(df: DataFrame, idc: str, out: str) -> DataFrame:
        # one scan: posexplode over the array of subspace slices (a
        # 4-way union of projections would scan the corpus 4x)
        slices = ", ".join(
            f"slice(v, {PQ_SUBDIM * s + 1}, {PQ_SUBDIM})"
            for s in range(PQ_SUBSPACES)
        )
        return df.select(
            F.col(idc),
            F.posexplode(F.expr(f"array({slices})")).alias("sub", out),
        )

    cb_parts = []
    for s in range(PQ_SUBSPACES):
        cb_parts.append(
            sample_fixed_k(corpus, PQ_CODES, salt=f"pq{s}").select(
                F.lit(s).alias("sub"),
                F.col("vec_id").alias("code"),
                F.expr(f"slice(v, {PQ_SUBDIM * s + 1}, {PQ_SUBDIM})").alias("csub"),
            )
        )
    cb = cb_parts[0]
    for p in cb_parts[1:]:
        cb = cb.union(p)

    # argmax via max_by on the (sc, -code) tuple — same result as the
    # oracle's row_number (sc DESC, code ASC) because code is unique per
    # (vec, sub), but a hash agg with map-side partial combine instead of
    # a full window sort (ops.vectors.pq_encode, shared with the
    # streaming encode maintenance loop)
    from smartpool_bigdata_spark.ops.vectors import pq_encode

    encoded = pq_encode(
        corpus, cb, subspaces=PQ_SUBSPACES, subdim=PQ_SUBDIM
    )

    # slice only the 8 sampled query vectors — exploding the whole corpus
    # into 4x subspace rows and then filtering would discard 99.9% of it
    queries = sample_fixed_k(corpus, N_QUERIES, salt="q").select(
        F.col("vec_id").alias("query_id"), "v"
    )
    qsubs = subspace(queries, "query_id", "qsv")
    qdist = qsubs.join(F.broadcast(cb), "sub").select(
        "query_id",
        "sub",
        "code",
        F.expr(
            f"{spark_dot('qsv', 'qsv')} - 2 * {spark_dot('qsv', 'csub')}"
            f" + {spark_dot('csub', 'csub')}"
        ).alias("contrib"),
    )
    adc = (
        encoded.join(F.broadcast(qdist), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.round(
                F.sum(F.col("contrib").cast("decimal(38,10)")).cast("double"), 4
            ).alias("adc_dist")
        )
    )
    return top_n_per_group(
        adc,
        keys=["query_id"],
        order_by=[F.col("adc_dist").asc(), F.col("neighbor_id").asc()],
        n=3,
        method="row_number",
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("int"))


@query(
    "embedding_prototype_eval",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, CAST(label AS INTEGER) AS label, {_DUCK_V} AS v
        FROM embeddings
    ),
    dims AS (
        SELECT label, d, val
        FROM (SELECT label, unnest(v) AS val,
                     generate_subscripts(v, 1) AS d
              FROM corpus)
    ),
    cdim AS (
        SELECT label, d,
               round(CAST(sum(CAST(val AS DECIMAL(38,10))) AS DOUBLE)
                     / count(val), 6) AS cv
        FROM dims GROUP BY label, d
    ),
    cents AS (
        SELECT label AS proto, list(cv ORDER BY d) AS c FROM cdim GROUP BY label
    ),
    scored AS (
        SELECT corpus.vec_id, corpus.label, cents.proto,
               {_duck_cos('corpus.v', 'cents.c')} AS sim
        FROM corpus CROSS JOIN cents
    ),
    pred AS (
        SELECT vec_id, label, proto AS predicted
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY sim DESC, proto ASC) AS rn
              FROM scored)
        WHERE rn = 1
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CASE WHEN predicted = label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           round(CAST(sum(CASE WHEN predicted = label THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 4) AS accuracy
    FROM pred GROUP BY label
    """,
    description="Nearest-class-prototype evaluation over the embedding "
    "space (the linear-probe-lite embedding-quality check): per-label "
    "centroids via decimal-stable per-dimension means (order-independent "
    "under any partitioning), every vector classified to its max-cosine "
    "prototype (broadcast O(labels*d) — constant at any corpus size), "
    "per-label accuracy out. Label separability under this probe is the "
    "standard quick read on whether an embedding table is healthy "
    "before spending on ANN index builds. Plan: one dim explode + "
    "(label, dim) agg for the prototypes, then a scan against the "
    "broadcast prototype frame with an argmax hash agg — no shuffle of "
    "the corpus after the centroid agg. Oracle replays centroid math "
    "and classification bit-for-bit.",
)
def embedding_prototype_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.functions import stable_avg

    emb = _t(spark, sf_dir, "embeddings")
    corpus = as_double_array(emb, "embedding", "v").select(
        "vec_id", F.col("label").cast("int").alias("label"), "v"
    )
    dims = corpus.select(
        "label", F.posexplode("v").alias("d", "val")
    )
    cdim = dims.groupBy("label", F.col("d")).agg(
        stable_avg("val", 6).alias("cv")
    )
    cents = (
        cdim.groupBy(F.col("label").alias("proto"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(d, cv))), x -> x.cv)"
            ).alias("c")
        )
    )
    scored = corpus.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "proto",
        F.expr(f"round({spark_cosine('v', 'c')}, 4)").alias("sim"),
    )
    # oracle ranks by the ROUNDED sim (rn over sim DESC) — round here too
    pred = scored.groupBy("vec_id", "label").agg(
        F.expr("max_by(proto, struct(sim, -proto))").alias("predicted")
    )
    return pred.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(F.when(F.col("predicted") == F.col("label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.sum(
                F.when(F.col("predicted") == F.col("label"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("accuracy"),
    )


@query(
    "pq_distortion_stats",
    oracle=f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    cb AS (
{_pq_duck_cb()}
    ),
    subvecs AS (
{_pq_duck_subvecs('corpus', 'vec_id', 'sv')}
    ),
    escore AS (
        SELECT vec_id, sub, code,
               round(2 * {_dd('sv', 'csub')} - {_dd('csub', 'csub')}, 4) AS sc,
               {_dd('sv', 'sv')} - 2 * {_dd('sv', 'csub')} + {_dd('csub', 'csub')}
                   AS err
        FROM subvecs JOIN cb USING (sub)
    ),
    chosen AS (
        SELECT vec_id, err
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id, sub ORDER BY sc DESC, code ASC) AS rn
              FROM escore)
        WHERE rn = 1
    ),
    per_vec AS (
        SELECT vec_id,
               round(CAST(sum(CAST(err AS DECIMAL(38,10))) AS DOUBLE) / 64, 6)
                   AS mse
        FROM chosen GROUP BY vec_id
    )
    SELECT CAST(e.label AS INTEGER) AS label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(CAST(sum(CAST(mse AS DECIMAL(38,10))) AS DOUBLE)
                 / count(mse), 6) AS avg_mse,
           round(max(mse), 6) AS max_mse
    FROM per_vec p JOIN embeddings e ON e.vec_id = p.vec_id
    GROUP BY e.label
    """,
    description="PQ quantization-DISTORTION audit — the index-quality "
    "measure beside recall (knn_recall_eval): per-vector reconstruction "
    "MSE of the 4x16 product-quantizer codes (sum over subspaces of "
    "||subvec - chosen codeword||^2, via the same 2a.b - b.b argmin the "
    "encoder uses, so the audited code IS the served code), rolled up "
    "per embedding label. Distortion is what degrades ADC ranking "
    "quality; tracking it per segment is how an index deployment "
    "decides when to retrain codebooks (kmeans_refine) or raise code "
    "counts. Plan: one subspace explode joined to the broadcast "
    "codebook, per-(vec, sub) argmin as a hash agg, decimal-stable MSE "
    "sums; oracle replays encode AND error bit-for-bit.",
)
def pq_distortion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.functions import stable_avg

    corpus = _corpus(spark, sf_dir)
    slices = ", ".join(
        f"slice(v, {PQ_SUBDIM * s + 1}, {PQ_SUBDIM})"
        for s in range(PQ_SUBSPACES)
    )
    subvecs = corpus.select(
        "vec_id", F.posexplode(F.expr(f"array({slices})")).alias("sub", "sv")
    )
    cb_parts = []
    for s in range(PQ_SUBSPACES):
        cb_parts.append(
            sample_fixed_k(corpus, PQ_CODES, salt=f"pq{s}").select(
                F.lit(s).alias("sub"),
                F.col("vec_id").alias("code"),
                F.expr(f"slice(v, {PQ_SUBDIM * s + 1}, {PQ_SUBDIM})").alias("csub"),
            )
        )
    cb = cb_parts[0]
    for p in cb_parts[1:]:
        cb = cb.union(p)
    scored = subvecs.join(F.broadcast(cb), "sub").select(
        "vec_id",
        "sub",
        "code",
        F.expr(
            f"round(2 * {spark_dot('sv', 'csub')} - {spark_dot('csub', 'csub')}, 4)"
        ).alias("sc"),
        F.expr(
            f"{spark_dot('sv', 'sv')} - 2 * {spark_dot('sv', 'csub')}"
            f" + {spark_dot('csub', 'csub')}"
        ).alias("err"),
    )
    # argmin via max_by on (sc, -code) — hash agg with map-side partials,
    # same winner as the oracle's (sc DESC, code ASC) row_number
    chosen = scored.groupBy("vec_id", "sub").agg(
        F.expr("max_by(err, struct(sc, -code))").alias("err")
    )
    per_vec = chosen.groupBy("vec_id").agg(
        F.round(
            F.sum(F.col("err").cast("decimal(38,10)")).cast("double") / 64, 6
        ).alias("mse")
    )
    labels = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("int").alias("label")
    )
    return per_vec.join(labels, "vec_id").groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        stable_avg("mse", 6).alias("avg_mse"),
        F.round(F.max("mse"), 6).alias("max_mse"),
    )


def _ivfpq_duck_cb() -> str:
    """Residual codebook CTE: per subspace, 16 deterministically sampled
    RESIDUAL vectors (v − assigned centroid) sliced to that subspace."""
    blocks = []
    for s in range(PQ_SUBSPACES):
        lo, hi = PQ_SUBDIM * s + 1, PQ_SUBDIM * (s + 1)
        blocks.append(
            f"        SELECT {s} AS sub, vec_id AS code, rv[{lo}:{hi}] AS csub\n"
            f"        FROM (SELECT vec_id, rv FROM withr "
            f"ORDER BY md5('ivfpq{s}' || CAST(vec_id AS VARCHAR)) LIMIT {PQ_CODES})"
        )
    return "\n        UNION ALL\n".join(blocks)


def _ivfpq_duck_subvecs(src: str, idc: str, out: str) -> str:
    blocks = []
    for s in range(PQ_SUBSPACES):
        lo, hi = PQ_SUBDIM * s + 1, PQ_SUBDIM * (s + 1)
        blocks.append(
            f"        SELECT {idc}, bucket, {s} AS sub, rv[{lo}:{hi}] AS {out} "
            f"FROM {src}"
        )
    return "\n        UNION ALL\n".join(blocks)


@query(
    "knn_ivfpq_adc",
    oracle=f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, v AS cv
              FROM ({_duck_sample(N_CENTROIDS, 'c')})),
    scored0 AS (
        SELECT c.vec_id, c.v, t.centroid_id AS bucket, {_duck_cos('c.v', 't.cv')} AS csim
        FROM corpus c CROSS JOIN cents t
    ),
    assigned AS (
        SELECT vec_id, v, bucket
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, bucket ASC) AS rn
              FROM scored0)
        WHERE rn = 1
    ),
    withr AS (
        SELECT a.vec_id, a.bucket,
               list_transform(range(1, len(a.v) + 1), i -> a.v[i] - t.cv[i]) AS rv
        FROM assigned a JOIN cents t ON a.bucket = t.centroid_id
    ),
    cb AS (
{_ivfpq_duck_cb()}
    ),
    subvecs AS (
{_ivfpq_duck_subvecs('withr', 'vec_id', 'sv')}
    ),
    escore AS (
        SELECT vec_id, bucket, sub, code,
               round(2 * {_dd('sv', 'csub')} - {_dd('csub', 'csub')}, 4) AS sc
        FROM subvecs JOIN cb USING (sub)
    ),
    encoded AS (
        SELECT vec_id, bucket, sub, code
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id, sub ORDER BY sc DESC, code ASC) AS rn
              FROM escore)
        WHERE rn = 1
    ),
    qids AS (SELECT vec_id AS query_id FROM ({_duck_sample(N_QUERIES, 'q')})),
    qres AS (
        SELECT w.vec_id, w.bucket, w.rv FROM withr w
        JOIN qids ON w.vec_id = qids.query_id
    ),
    qsubs AS (
{_ivfpq_duck_subvecs('qres', 'vec_id', 'qsv')}
    ),
    qdist AS (
        SELECT vec_id AS query_id, bucket AS qbucket, sub, code,
               {_dd('qsv', 'qsv')} - 2 * {_dd('qsv', 'csub')} + {_dd('csub', 'csub')} AS contrib
        FROM qsubs JOIN cb USING (sub)
    ),
    adc AS (
        SELECT d.query_id, e.vec_id AS neighbor_id,
               round(CAST(sum(CAST(contrib AS DECIMAL(38,10))) AS DOUBLE), 4) AS adc_dist
        FROM encoded e
        JOIN qdist d ON e.sub = d.sub AND e.code = d.code AND e.bucket = d.qbucket
        WHERE e.vec_id != d.query_id
        GROUP BY d.query_id, e.vec_id
    )
    SELECT query_id, neighbor_id, adc_dist, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id ASC) AS rn
          FROM adc)
    WHERE rn <= 3
    """,
    description="The full FAISS-style IVF-PQ index as ONE query — the "
    "composition of the coarse quantizer (knn_ivf) and the fine "
    "quantizer (knn_pq_adc), exactly how billion-scale ANN indexes are "
    "actually built: vectors assign to their max-cosine coarse cell, "
    "RESIDUALS (v − centroid) encode against per-subspace codebooks "
    "sampled from the pooled residual distribution (residual encoding "
    "is what makes shared codebooks tight across cells), and each query "
    "probes ONLY its own cell (nprobe=1), scoring candidates by "
    "asymmetric distance — 4 table lookups per candidate on the query's "
    "residual. Scale: candidates bounded by cell size, codebooks "
    "O(subspaces·codes·subdim) broadcast, the corpus scanned once for "
    "assign and once for encode; the encoded table (vec_id, bucket, 4 "
    "codes ≈ 64× compression) is the entire serving-side state. "
    "Recall < 1 twice over (cell pruning + quantized distance) — "
    "knn_brute_force remains the recall oracle; here the value-hash "
    "oracle locks encode + probe + ADC bit-for-bit in DuckDB.",
)
def knn_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    cents = sample_fixed_k(corpus, N_CENTROIDS, salt="c").select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    assigned = assign_ivf_buckets(corpus, cents)
    withr = (
        assigned.join(
            F.broadcast(
                cents.select(F.col("centroid_id").alias("bucket"), "cv")
            ),
            "bucket",
        )
        .select(
            "vec_id",
            "bucket",
            F.expr("zip_with(v, cv, (x, y) -> x - y)").alias("rv"),
        )
        .localCheckpoint(eager=False)
    )

    def subspace(df: DataFrame, idc: str, out: str) -> DataFrame:
        slices = ", ".join(
            f"slice(rv, {PQ_SUBDIM * s + 1}, {PQ_SUBDIM})"
            for s in range(PQ_SUBSPACES)
        )
        return df.select(
            F.col(idc),
            "bucket",
            F.posexplode(F.expr(f"array({slices})")).alias("sub", out),
        )

    cb_parts = []
    for s in range(PQ_SUBSPACES):
        cb_parts.append(
            sample_fixed_k(withr, PQ_CODES, salt=f"ivfpq{s}").select(
                F.lit(s).alias("sub"),
                F.col("vec_id").alias("code"),
                F.expr(f"slice(rv, {PQ_SUBDIM * s + 1}, {PQ_SUBDIM})").alias(
                    "csub"
                ),
            )
        )
    cb = cb_parts[0]
    for p in cb_parts[1:]:
        cb = cb.union(p)

    subvecs = subspace(withr, "vec_id", "sv")
    escore = subvecs.join(F.broadcast(cb), "sub").select(
        "vec_id",
        "bucket",
        "sub",
        "code",
        F.expr(
            f"round(2 * {spark_dot('sv', 'csub')} - {spark_dot('csub', 'csub')}, 4)"
        ).alias("sc"),
    )
    encoded = escore.groupBy("vec_id", "bucket", "sub").agg(
        F.expr("max_by(code, struct(sc, -code))").alias("code")
    )

    qids = sample_fixed_k(corpus, N_QUERIES, salt="q").select(
        F.col("vec_id").alias("query_id")
    )
    qres = withr.join(
        F.broadcast(qids), withr["vec_id"] == qids["query_id"]
    ).select(F.col("query_id").alias("vec_id"), "bucket", "rv")
    qsubs = subspace(qres, "vec_id", "qsv")
    qdist = qsubs.join(F.broadcast(cb), "sub").select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket").alias("qbucket"),
        "sub",
        "code",
        F.expr(
            f"{spark_dot('qsv', 'qsv')} - 2 * {spark_dot('qsv', 'csub')}"
            f" + {spark_dot('csub', 'csub')}"
        ).alias("contrib"),
    )
    adc = (
        encoded.join(
            F.broadcast(qdist),
            (encoded["sub"] == qdist["sub"])
            & (encoded["code"] == qdist["code"])
            & (encoded["bucket"] == qdist["qbucket"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.round(
                F.sum(F.col("contrib").cast("decimal(38,10)")).cast("double"), 4
            ).alias("adc_dist")
        )
    )
    return top_n_per_group(
        adc,
        keys=["query_id"],
        order_by=[F.col("adc_dist").asc(), F.col("neighbor_id").asc()],
        n=3,
        method="row_number",
        rank_col="rank",
    ).withColumn("rank", F.col("rank").cast("int"))


@query(
    "embedding_semdedup",
    oracle=f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    full_c AS (
        SELECT vec_id, v FROM corpus
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, v FROM corpus WHERE vec_id % 10 = 1
    ),
    cents0 AS (SELECT vec_id AS centroid_id, v AS cv
               FROM ({_duck_sample(N_CENTROIDS, 'c')})),
    scored0 AS (
        SELECT c.vec_id, c.v, t.centroid_id AS bucket,
               {_duck_cos('c.v', 't.cv')} AS csim
        FROM corpus c CROSS JOIN cents0 t
    ),
    assigned0 AS (
        SELECT vec_id, v, bucket
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, bucket ASC) AS rn
              FROM scored0)
        WHERE rn = 1
    ),
    ex AS (
        SELECT bucket, unnest(v) AS x, generate_subscripts(v, 1) AS j
        FROM assigned0
    ),
    means AS (
        SELECT bucket, j,
               round(CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE)
                     / count(x), 6) AS m
        FROM ex GROUP BY bucket, j
    ),
    cents AS (
        SELECT bucket AS centroid_id, list(m ORDER BY j) AS cv
        FROM means GROUP BY bucket
    ),
    scored AS (
        SELECT f.vec_id, f.v, t.centroid_id AS bucket,
               {_duck_cos('f.v', 't.cv')} AS csim
        FROM full_c f CROSS JOIN cents t
    ),
    assigned AS (
        SELECT vec_id, v, bucket
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, bucket ASC) AS rn
              FROM scored)
        WHERE rn = 1
    ),
    pruned AS (
        SELECT DISTINCT a.vec_id
        FROM assigned a JOIN assigned b
          ON a.bucket = b.bucket AND a.vec_id > b.vec_id
        WHERE {_duck_cos('a.v', 'b.v')} >= 0.99
    )
    SELECT a.bucket,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pruned,
           round(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS pruned_frac
    FROM assigned a LEFT JOIN pruned p USING (vec_id)
    GROUP BY a.bucket
    """,
    description="SemDeDup (Abbas et al. 2023): SEMANTIC deduplication by "
    "k-means clustering the embedding space (the gate's deterministic "
    "seed + one Lloyd refinement, same dual-dialect k-means as "
    "knn_ivf_kmeans) and pruning, within each cluster only, the "
    "later-id member of every cosine >= 0.99 pair — never a global "
    "all-pairs: candidate comparisons are bounded by cluster size, the "
    "clustering IS the blocking. Run on corpus ∪ planted duplicates so "
    "the prune set is non-trivially verified (identical vectors land in "
    "the same cluster by construction of the argmax assignment). "
    "Complements the sign-LSH near-dup family: LSH blocks on random "
    "projections, SemDeDup blocks on learned cluster structure — the "
    "recipe used to dedup LAION/web-scale image-text corpora.",
)
def embedding_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.ops.vectors import kmeans_refine, semdedup_prune

    # r13 (guide §5, verdict #9): the parsed-vector corpus feeds FOUR
    # consumers (seed sample, the Lloyd refinement's assign, the planted
    # duplicates, and the full union) — lazily checkpoint so the
    # embeddings scan + array parse run once inside the timed action
    corpus = _corpus(spark, sf_dir).localCheckpoint(eager=False)
    planted = corpus.filter(F.col("vec_id") % 10 == 1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "v"
    )
    full = corpus.union(planted)
    seeds = sample_fixed_k(corpus, N_CENTROIDS, salt="c").select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    cents = kmeans_refine(corpus, seeds, iters=1)
    assigned = assign_ivf_buckets(full, cents).localCheckpoint(eager=False)
    # no cap here: the gate's cluster sizes are bounded by construction
    # and the oracle is exact; the hot-cluster guard (max_cluster_size=N
    # sub-blocks giant clusters by a sign-LSH band) is the documented
    # skew dial for real corpora — skew-tested in tests/test_vector_ops.py
    pruned = semdedup_prune(assigned, threshold=0.99).withColumn(
        "is_pruned", F.lit(1)
    )
    # the pruned-id set grows WITH the corpus (it is a fraction of all
    # vectors), so a broadcast hint here was a linear forced broadcast
    # (caught by the r11 three-tier audit at sf1); shuffle_hash is the
    # strategy that is right at every scale for this growing right side
    # (no sort, no OOM — the returned_item_losses precedent)
    return (
        assigned.join(pruned.hint("shuffle_hash"), "vec_id", "left")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum(F.coalesce("is_pruned", F.lit(0))).cast("bigint").alias(
                "n_pruned"
            ),
            F.round(
                F.sum(F.coalesce("is_pruned", F.lit(0)))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("pruned_frac"),
        )
    )


_COV_DIM = 64

_COV_ORACLE = f"""
    WITH ex AS (
        SELECT u.i AS i, u.x AS x FROM (
            SELECT unnest(list_transform(range(1, len(embedding) + 1),
                   i -> {{'i': i, 'x': embedding[i]}})) AS u
            FROM embeddings)
    ),
    m AS (
        SELECT i,
               CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE)
                   / count(x) AS m
        FROM ex GROUP BY i
    ),
    marr AS (
        SELECT list(m ORDER BY i) AS marr FROM m
    ),
    n AS (
        SELECT count(*) AS n FROM embeddings
    ),
    prods AS (
        SELECT p.i AS i, p.j AS j, p.v AS v FROM (
            SELECT unnest(flatten(list_transform(range(1, {_COV_DIM} + 1), i ->
                   list_transform(range(i, {_COV_DIM} + 1), j ->
                   {{'i': i, 'j': j,
                    'v': (CAST(embedding[i] AS DOUBLE) - marr[i])
                       * (CAST(embedding[j] AS DOUBLE) - marr[j])}})))) AS p
            FROM embeddings, marr)
    )
    SELECT i, j,
           round(CAST(sum(CAST(v AS DECIMAL(38,10))) AS DOUBLE)
                 / (SELECT n - 1 FROM n), 6) AS cov
    FROM prods GROUP BY i, j
    """


@query(
    "embedding_covariance",
    oracle=_COV_ORACLE,
    description="Distributed d x d sample covariance of the embedding "
    "distribution (upper triangle, 2080 rows at d=64) — the substrate "
    "for PCA/whitening-based embedding-space analysis (ops/vectors.py: "
    "pca_components eigendecomposes this driver-side and pca_project "
    "broadcasts the components back as plan literals; invariants "
    "pytest-locked in tests/test_vector_ops.py). Single-pass shapes: "
    "means = one agg riding back as a broadcast array; centered products "
    "generated in-row by a nested sequence transform (no self-join), one "
    "shuffle on (i, j); decimal-stable sums so the value hash holds "
    "under any partitioning. At d in the thousands the d^2/2 fan-out "
    "dominates and the swap is a mapInPandas partial X^T X per Arrow "
    "batch (docstring).",
    skip_bench=False,
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.ops.vectors import covariance_matrix

    emb = _t(spark, sf_dir, "embeddings")
    cov = covariance_matrix(emb, "embedding", dim=_COV_DIM)
    return cov.select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        F.round("cov", 6).alias("cov"),
    )


@query(
    "embedding_covariance_partial",
    oracle=_COV_ORACLE,
    description="Disclosed TWIN of embedding_covariance through the "
    "large-d scale path (ops/vectors.py:covariance_matrix_partial): "
    "centered partial X^T X per Arrow batch via mapInPandas (one d x d "
    "float64 matmul per batch, d(d+1)/2 rows per PARTITION), then one "
    "tiny decimal-stable (i, j) reduce — at d in the thousands this "
    "replaces the exact form's per-ROW d^2/2 fan-out with a per-"
    "partition one, the difference between a 100 TB shuffle and a few "
    "GB. Same oracle as the exact twin: centering by the true means "
    "keeps per-batch float sums cancellation-free, so both forms agree "
    "to ~1e-12 (property-locked in tests/test_vector_ops.py) and round "
    "identically at 6 decimals.",
)
def embedding_covariance_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.ops.vectors import covariance_matrix_partial

    emb = _t(spark, sf_dir, "embeddings")
    cov = covariance_matrix_partial(emb, "embedding", dim=_COV_DIM)
    return cov.select(
        F.col("i").cast("bigint").alias("i"),
        F.col("j").cast("bigint").alias("j"),
        F.round("cov", 6).alias("cov"),
    )


_PCA_K = 8


@query(
    "embedding_pca_whitened",
    oracle=f"""
    WITH trace AS (
        SELECT round(CAST(sum(v) AS DOUBLE), 4) AS trace FROM (
            SELECT var_samp(CAST(embedding[i] AS DOUBLE)) AS v
            FROM embeddings, range(1, {_COV_DIM} + 1) AS t(i)
            GROUP BY i))
    SELECT CAST(a.axis AS BIGINT) AS axis,
           CAST(1.0 AS DOUBLE) AS whitened_var,
           CAST(0.0 AS DOUBLE) AS max_abs_crosscov,
           trace
    FROM range(1, {_PCA_K} + 1) AS a(axis), trace
    """,
    description="Value-lock of the FULL covariance -> eigh -> project "
    "path as one query: embeddings are whitening-projected onto the "
    "top-8 principal components (ops/vectors.py:pca_components / "
    "pca_project — covariance distributed, d x d eigendecomposition a "
    "driver-side constant, projection a codegen fold). The oracle is "
    "the mathematical SPEC plus one independently-computed data "
    "coupling: per-axis whitened variance must be exactly 1 (locks each "
    "eigenvalue against the realized variance along its eigenvector), "
    "max |cross-axis covariance| must be 0 (locks eigenvector "
    "orthogonality/decorrelation), and the eigenvalue SUM must equal "
    "the trace, which DuckDB recomputes from raw data as the sum of "
    "per-dimension variances — a wrong covariance, eigensolve, or "
    "projection breaks at least one column. Sign/tie ambiguity is "
    "immaterial: every output is rotation-sign-invariant by "
    "construction.",
)
def embedding_pca_whitened(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.ops.vectors import pca_components, pca_project

    emb = _t(spark, sf_dir, "embeddings")
    comps_all, vals_all = pca_components(emb, "embedding", k=_COV_DIM, dim=_COV_DIM)
    comps, vals = comps_all[:_PCA_K], vals_all[:_PCA_K]
    proj = pca_project(emb, comps, "embedding", eigenvalues=vals)
    axis_stats = (
        proj.select(F.posexplode("projected").alias("axis0", "v"))
        .groupBy("axis0")
        .agg(F.round(F.var_samp("v"), 4).alias("whitened_var"))
        .select(
            (F.col("axis0") + 1).cast("bigint").alias("axis"), "whitened_var"
        )
    )
    cross = proj.agg(
        F.round(
            F.greatest(
                *[
                    F.abs(
                        F.covar_samp(
                            F.element_at("projected", i),
                            F.element_at("projected", j),
                        )
                    )
                    for i in range(1, _PCA_K + 1)
                    for j in range(i + 1, _PCA_K + 1)
                ]
            ),
            4,
        ).alias("max_abs_crosscov")
    )
    trace_row = spark.range(1).select(
        F.round(F.lit(float(sum(vals_all))), 4).alias("trace")
    )
    return axis_stats.crossJoin(F.broadcast(cross)).crossJoin(
        F.broadcast(trace_row)
    )


@query(
    "stream_pq_codes",
    oracle=f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    cb AS (
{_pq_duck_cb()}
    ),
    subvecs AS (
{_pq_duck_subvecs('corpus', 'vec_id', 'sv')}
    ),
    escore AS (
        SELECT vec_id, sub, code,
               round(2 * {_dd('sv', 'csub')} - {_dd('csub', 'csub')}, 4) AS sc
        FROM subvecs JOIN cb USING (sub)
    ),
    encoded AS (
        SELECT vec_id, sub, code
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id, sub ORDER BY sc DESC, code ASC) AS rn
              FROM escore)
        WHERE rn = 1
    )
    SELECT sub, code,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(vec_id) AS BIGINT) AS min_vec_id,
           CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
    FROM encoded GROUP BY sub, code
    """,
    description="PQ code maintenance CLOSED AS A STREAM — the fine-"
    "quantizer twin of stream_ivf_assignments, completing incremental "
    "upkeep of the full IVF-PQ serving state: half the corpus is PQ-"
    "encoded one-shot against the frozen per-subspace codebooks, the "
    "other half arrives as a rate-limited file stream through "
    "foreachBatch + pq_encode + an (id, sub)-keyed MERGE into the codes "
    "table. Per-batch cost O(batch · subspaces · codes), the base "
    "corpus never re-encodes, replays are idempotent (checkpoint-restart "
    "pytest-locked in tests/test_streaming.py). Oracle: the "
    "ONE-SHOT DuckDB encode of the full corpus grouped by (sub, code) — "
    "the stream/base split must not change a single code. "
    "streaming/runner.py:start_pq_encode.",
    skip_bench=True,  # staging writes + stream startup dominate
)
def stream_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from smartpool_bigdata_spark.ops.vectors import pq_encode
    from smartpool_bigdata_spark.streaming import file_stream
    from smartpool_bigdata_spark.streaming.runner import start_pq_encode

    corpus = _corpus(spark, sf_dir)
    cb_parts = []
    for s in range(PQ_SUBSPACES):
        cb_parts.append(
            sample_fixed_k(corpus, PQ_CODES, salt=f"pq{s}").select(
                F.lit(s).alias("sub"),
                F.col("vec_id").alias("code"),
                F.expr(f"slice(v, {PQ_SUBDIM * s + 1}, {PQ_SUBDIM})").alias(
                    "csub"
                ),
            )
        )
    cb = cb_parts[0]
    for p in cb_parts[1:]:
        cb = cb.union(p)
    cb = cb.localCheckpoint(eager=True)  # frozen codebook, not per-batch work

    base = corpus.filter(F.col("vec_id") % 2 == 0)
    new = corpus.filter(F.col("vec_id") % 2 == 1)
    stage = tempfile.mkdtemp(prefix="spark_pqstream_")
    try:
        codes_path = os.path.join(stage, "codes")
        src = os.path.join(stage, "new_vecs")
        ckpt = os.path.join(stage, "ckpt")
        pq_encode(base, cb, subspaces=PQ_SUBSPACES, subdim=PQ_SUBDIM).write.parquet(
            codes_path
        )
        new.repartition(4).write.parquet(src)
        stream = file_stream(spark, src, new.schema, max_files_per_trigger=1)
        q = start_pq_encode(
            stream,
            cb,
            codes_path,
            ckpt,
            subspaces=PQ_SUBSPACES,
            subdim=PQ_SUBDIM,
            trigger={"availableNow": True},
            query_name="pq_maintenance",
        )
        if not q.awaitTermination(300):
            q.stop()
        codes = spark.read.parquet(codes_path)
        out = codes.groupBy("sub", "code").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.min("vec_id").cast("bigint").alias("min_vec_id"),
            F.sum("vec_id").cast("bigint").alias("sum_vec_id"),
        )
        return out.localCheckpoint(eager=True)  # materialize before cleanup
    finally:
        shutil.rmtree(stage, ignore_errors=True)


@query(
    "stream_ivf_assignments",
    oracle=f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, v AS cv
              FROM ({_duck_sample(N_CENTROIDS, 'c')})),
    scored AS (
        SELECT c.vec_id, t.centroid_id AS bucket, {_duck_cos('c.v', 't.cv')} AS csim
        FROM corpus c CROSS JOIN cents t
    ),
    assigned AS (
        SELECT vec_id, bucket
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, bucket ASC) AS rn
              FROM scored)
        WHERE rn = 1
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(min(vec_id) AS BIGINT) AS min_vec_id,
           CAST(max(vec_id) AS BIGINT) AS max_vec_id,
           CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
    FROM assigned GROUP BY bucket
    """,
    description="IVF index maintenance CLOSED AS A STREAM (the "
    "incremental-ingest loop applied to the ANN family, mirroring "
    "stream_incremental_near_dup): half the corpus is assigned one-shot "
    "to the frozen 16-centroid coarse quantizer, the other half arrives "
    "as a file stream in rate-limited micro-batches (maxFilesPerTrigger="
    "1) through foreachBatch + assign_ivf_buckets + a vec_id-keyed MERGE "
    "into the assignment table — per-batch cost is O(batch · k·d), the "
    "base corpus is never re-assigned, replays are idempotent "
    "(checkpoint-restart pytest-locked in tests/test_streaming.py). "
    "Oracle: the ONE-SHOT DuckDB assignment of the full corpus grouped "
    "by bucket — batch boundaries and the base/stream split must not "
    "change a single assignment. streaming/runner.py:"
    "start_ivf_assignment.",
    skip_bench=True,  # staging writes + stream startup dominate
)
def stream_ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from smartpool_bigdata_spark.streaming import file_stream
    from smartpool_bigdata_spark.streaming.runner import start_ivf_assignment

    corpus = _corpus(spark, sf_dir)
    cents = (
        sample_fixed_k(corpus, N_CENTROIDS, salt="c")
        .select(F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv"))
        .localCheckpoint(eager=True)  # frozen quantizer, not per-batch work
    )
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    new = corpus.filter(F.col("vec_id") % 2 == 1)
    stage = tempfile.mkdtemp(prefix="spark_ivfstream_")
    try:
        asg_path = os.path.join(stage, "assignments")
        src = os.path.join(stage, "new_vecs")
        ckpt = os.path.join(stage, "ckpt")
        assign_ivf_buckets(base, cents).select("vec_id", "bucket").write.parquet(
            asg_path
        )
        new.repartition(4).write.parquet(src)
        stream = file_stream(spark, src, new.schema, max_files_per_trigger=1)
        q = start_ivf_assignment(
            stream,
            cents,
            asg_path,
            ckpt,
            trigger={"availableNow": True},
            query_name="ivf_maintenance",
        )
        if not q.awaitTermination(300):
            q.stop()
        asg = spark.read.parquet(asg_path)
        out = asg.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.min("vec_id").cast("bigint").alias("min_vec_id"),
            F.max("vec_id").cast("bigint").alias("max_vec_id"),
            F.sum("vec_id").cast("bigint").alias("sum_vec_id"),
        )
        return out.localCheckpoint(eager=True)  # materialize before cleanup
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _lsh_hamming_oracle() -> str:
    bands_list = ", ".join(
        _duck_band_val("q", str(b)) for b in range(LSH_BANDS)
    )
    ham = " + ".join(
        f"bit_count(xor(s.bands[{b + 1}], qs.qb[{b + 1}]))"
        for b in range(LSH_BANDS)
    )
    return f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    quant AS (
        SELECT vec_id,
               list_transform(v, x -> CAST(floor(x * 1000000) AS BIGINT)) AS q
        FROM corpus
    ),
    sigs AS (SELECT vec_id, [{bands_list}] AS bands FROM quant),
    qids AS (SELECT vec_id FROM ({_duck_sample(N_QUERIES, 'q')})),
    qs AS (SELECT s.vec_id AS query_id, s.bands AS qb
           FROM sigs s JOIN qids ON qids.vec_id = s.vec_id),
    ham AS (
        SELECT qs.query_id, s.vec_id AS neighbor_id,
               CAST({ham} AS BIGINT) AS hamming
        FROM sigs s CROSS JOIN qs
        WHERE s.vec_id != qs.query_id
    ),
    cand AS (
        SELECT query_id, neighbor_id, hamming
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY hamming ASC, neighbor_id ASC) AS rn
              FROM ham)
        WHERE rn <= 30
    ),
    verified AS (
        SELECT c.query_id, c.neighbor_id, c.hamming,
               {_duck_cos('a.v', 'b.v')} AS sim
        FROM cand c
        JOIN corpus a ON a.vec_id = c.query_id
        JOIN corpus b ON b.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, hamming, sim, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
          FROM verified)
    WHERE rn <= 5
    """


@query(
    "knn_lsh_hamming",
    oracle=_lsh_hamming_oracle(),
    description="Binary-hash ANN tier (SRP/SimHash for vectors, ranked by "
    "HAMMING distance): each vector's 8x16-bit random-hyperplane sign "
    "signature (the same int64-matmul signatures the near-dup LSH uses) "
    "is scanned with bit_count(xor) against the broadcast query "
    "signatures — a 128-bit XOR instead of a d-dim float dot, the "
    "memory-bandwidth trick behind billion-scale binary-hash indexes — "
    "then the top-30 Hamming candidates are re-ranked by exact cosine "
    "into a top-5. Completes the similarity-search taxonomy: inverted "
    "lists (IVF), compressed codes (PQ/ADC), binary hashes (this). "
    "Signatures are exact integer arithmetic, so the oracle replays the "
    "scan AND the re-rank bit-for-bit. Scale: signature scan is "
    "row-local against broadcast query rows; at index scale the same "
    "signatures shard into multi-index Hamming buckets (the banded "
    "near-dup join IS that layout, already gated).",
)
def knn_lsh_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    sigs = lsh_band_signatures(corpus, "vec_id", "v").localCheckpoint(
        eager=False
    )  # referenced for both the corpus scan and the query side
    qids = sample_fixed_k(corpus, N_QUERIES, salt="q").select("vec_id")
    qsigs = sigs.join(F.broadcast(qids), "vec_id").select(
        F.col("vec_id").alias("query_id"), F.col("bands").alias("qb")
    )
    ham_terms = " + ".join(
        f"bit_count(element_at(bands, {b + 1}) ^ element_at(qb, {b + 1}))"
        for b in range(LSH_BANDS)
    )
    ham = (
        sigs.crossJoin(F.broadcast(qsigs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(f"CAST({ham_terms} AS BIGINT)").alias("hamming"),
        )
    )
    cand = top_n_per_group(
        ham,
        keys=["query_id"],
        order_by=[F.col("hamming").asc(), F.col("neighbor_id").asc()],
        n=30,
        method="row_number",
        rank_col="__hrn",
    ).drop("__hrn")
    # query-vector frame RESTRICTED to the fixed-k query ids before the
    # hint: broadcasting the full corpus aliased as va was a
    # linear-in-corpus forced broadcast (caught by the r11 three-tier
    # audit at sf1 — invisible at the driver SFs where the embeddings
    # table is tiny); the semi-joined frame is bounded at N_QUERIES rows
    va = corpus.join(F.broadcast(qids), "vec_id").select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    vb = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
    verified = (
        cand.join(F.broadcast(va), "query_id")
        .join(vb, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            F.expr(f"round({spark_cosine('qv', 'nv')}, 4)").alias("sim"),
        )
    )
    return top_n_per_group(
        verified,
        keys=["query_id"],
        order_by=[F.col("sim").desc(), F.col("neighbor_id").asc()],
        n=5,
        method="row_number",
        rank_col="rank",
    )


@query(
    "knn_recall_eval",
    oracle=f"""{_DUCK_KNN_PRELUDE},
    bsims AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, {_duck_cos('qv', 'v')} AS sim
        FROM corpus c JOIN q ON c.vec_id != q.query_id
    ),
    truth AS (
        SELECT query_id, neighbor_id
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
              FROM bsims)
        WHERE rn <= 5
    ),
    cents AS (SELECT vec_id AS centroid_id, v AS cv
              FROM ({_duck_sample(N_CENTROIDS, 'c')})),
    scored AS (
        SELECT c.vec_id, c.v, t.centroid_id AS bucket, {_duck_cos('c.v', 't.cv')} AS csim
        FROM corpus c CROSS JOIN cents t
    ),
    assigned AS (
        SELECT vec_id, v, bucket
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, bucket ASC) AS rn
              FROM scored)
        WHERE rn = 1
    ),
    iq AS (SELECT a.vec_id AS query_id, a.v AS qv, a.bucket
           FROM assigned a JOIN (SELECT query_id AS vec_id FROM q) s
           USING (vec_id)),
    isims AS (
        SELECT iq.query_id, a.vec_id AS neighbor_id, {_duck_cos('iq.qv', 'a.v')} AS sim
        FROM assigned a JOIN iq ON a.bucket = iq.bucket AND a.vec_id != iq.query_id
    ),
    approx AS (
        SELECT query_id, neighbor_id
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rn
              FROM isims)
        WHERE rn <= 5
    )
    SELECT t.query_id,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
           round(CAST(count(a.neighbor_id) AS DOUBLE) / 5, 4) AS recall_at_5
    FROM truth t LEFT JOIN approx a
      ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
    GROUP BY t.query_id
    """,
    description="ANN recall measurement IN the engine ('measure, don't "
    "guess' as a first-class query): exact brute-force cosine top-5 is "
    "the ground truth, the IVF nprobe=1 path is the candidate, and "
    "recall@5 is computed per query by joining the two neighbor lists — "
    "the evaluation loop an ANN deployment runs on every index/parameter "
    "change (nprobe, centroid count, quantizer). Both paths are the "
    "registered operators themselves, so the measured recall is the "
    "production plan's, not a replica's. Plan: both sides broadcast the "
    "fixed query/centroid samples; the final compare joins two tiny "
    "top-k frames. Oracle replays truth AND candidate exactly, so the "
    "recall numbers are value-locked, not approximated.",
)
def knn_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = knn_brute_force(spark, sf_dir).select("query_id", "neighbor_id")
    approx = knn_ivf(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("hit_id")
    )
    return (
        truth.join(
            F.broadcast(approx),
            (truth.query_id == approx.query_id)
            & (truth.neighbor_id == approx.hit_id),
            "left",
        )
        .select(truth.query_id, "hit_id")
        .groupBy("query_id")
        .agg(
            F.count("hit_id").cast("bigint").alias("n_hit"),
            F.round(F.count("hit_id").cast("double") / 5, 4).alias("recall_at_5"),
        )
    )


@query(
    "embedding_dim_profile",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, {_DUCK_V} AS v FROM embeddings
    ),
    dims AS (
        SELECT d, val
        FROM (SELECT unnest(v) AS val, generate_subscripts(v, 1) AS d
              FROM corpus)
    ),
    stats AS (
        SELECT d,
               CAST(count(*) AS BIGINT) AS n_vals,
               percentile_cont(0.25) WITHIN GROUP (ORDER BY val) AS q1,
               percentile_cont(0.5)  WITHIN GROUP (ORDER BY val) AS med,
               percentile_cont(0.75) WITHIN GROUP (ORDER BY val) AS q3,
               round(CAST(sum(CAST(val AS DECIMAL(38,10))) AS DOUBLE)
                     / count(val), 6) AS mean_val
        FROM dims GROUP BY d
    ),
    flagged AS (
        SELECT dims.d, val, n_vals, med, q3 - q1 AS iqr, mean_val,
               CASE WHEN val < med - 3 * (q3 - q1)
                      OR val > med + 3 * (q3 - q1) THEN 1 ELSE 0 END AS o
        FROM dims JOIN stats ON dims.d = stats.d
    )
    SELECT d AS dim, n_vals,
           round(med, 6) AS median_val,
           round(iqr, 6) AS iqr,
           mean_val,
           CAST(sum(o) AS BIGINT) AS n_outliers
    FROM flagged GROUP BY d, n_vals, med, iqr, mean_val
    """,
    description="Per-dimension robust profile of the embedding space: "
    "exact quartiles (median, IQR), decimal-stable mean, and the count "
    "of values outside median ± 3·IQR for each of the d dimensions — "
    "the feature-space QA pass (dead dims, clipped dims, heavy-tailed "
    "dims) a pipeline runs before trusting distances for dedup or ANN. "
    "Plan: one dim explode -> per-dim exact percentile agg (d rows), "
    "then the O(d) bounds frame BROADCAST back over the value stream "
    "for the outlier count — two passes, no corpus shuffle beyond the "
    "uniform dim key, broadcast side constant-size at any corpus. Both "
    "engines evaluate the identical interpolated-percentile formula on "
    "identical doubles, so bounds comparisons agree bit-for-bit; means "
    "sum in DECIMAL(38,10) (order-independent).",
)
def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.functions import stable_avg

    emb = _t(spark, sf_dir, "embeddings")
    corpus = as_double_array(emb, "embedding", "v")
    dims = corpus.select(F.posexplode("v").alias("d0", "val")).select(
        (F.col("d0") + 1).alias("d"), "val"
    )
    stats = dims.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vals"),
        F.expr("percentile(val, 0.25D)").alias("q1"),
        F.expr("percentile(val, 0.5D)").alias("med"),
        F.expr("percentile(val, 0.75D)").alias("q3"),
        stable_avg("val", 6).alias("mean_val"),
    )
    bounds = stats.select(
        "d",
        "n_vals",
        "med",
        (F.col("q3") - F.col("q1")).alias("iqr"),
        "mean_val",
    )
    flagged = dims.join(F.broadcast(bounds), "d").select(
        "d",
        "n_vals",
        "med",
        "iqr",
        "mean_val",
        F.when(
            (F.col("val") < F.col("med") - 3 * F.col("iqr"))
            | (F.col("val") > F.col("med") + 3 * F.col("iqr")),
            1,
        )
        .otherwise(0)
        .alias("o"),
    )
    return flagged.groupBy("d", "n_vals", "med", "iqr", "mean_val").agg(
        F.sum("o").cast("bigint").alias("n_outliers")
    ).select(
        F.col("d").cast("bigint").alias("dim"),
        "n_vals",
        F.round("med", 6).alias("median_val"),
        F.round("iqr", 6).alias("iqr"),
        "mean_val",
        "n_outliers",
    )


_MRL_DIMS = (8, 16, 32)


def _duck_trunc_topk(dims: int) -> str:
    """Top-5 by cosine over the first ``dims`` dimensions (oracle side)."""
    return f"""
        SELECT query_id, neighbor_id, {dims} AS dims
        FROM (SELECT q.query_id, c.vec_id AS neighbor_id,
                     {_duck_cos(f'q.qv[1:{dims}]', f'c.v[1:{dims}]')} AS sim,
                     row_number() OVER (
                         PARTITION BY q.query_id
                         ORDER BY {_duck_cos(f'q.qv[1:{dims}]', f'c.v[1:{dims}]')}
                             DESC, c.vec_id ASC) AS rn
              FROM corpus c JOIN q ON c.vec_id != q.query_id)
        WHERE rn <= 5"""


@query(
    "embedding_matryoshka_recall",
    oracle=f"""{_DUCK_KNN_PRELUDE},
    truth AS (
        SELECT query_id, neighbor_id
        FROM (SELECT q.query_id, c.vec_id AS neighbor_id,
                     row_number() OVER (
                         PARTITION BY q.query_id
                         ORDER BY {_duck_cos('q.qv', 'c.v')} DESC,
                                  c.vec_id ASC) AS rn
              FROM corpus c JOIN q ON c.vec_id != q.query_id)
        WHERE rn <= 5
    ),
    trunc AS ({' UNION ALL '.join(_duck_trunc_topk(d) for d in _MRL_DIMS)})
    SELECT tr.query_id, CAST(tr.dims AS INTEGER) AS dims,
           CAST(count(t.neighbor_id) AS BIGINT) AS n_hits,
           round(count(t.neighbor_id) / 5.0, 4) AS recall
    FROM trunc tr LEFT JOIN truth t
      ON tr.query_id = t.query_id AND tr.neighbor_id = t.neighbor_id
    GROUP BY tr.query_id, tr.dims
    """,
    description="Matryoshka-truncation retrieval evaluation: recall@5 of "
    "cosine top-5 using only the first 8/16/32 embedding dimensions "
    "against the full-dimension exact top-5 — the measurement behind "
    "MRL-style adaptive retrieval (serve a cheap prefix scan, rerank "
    "with full vectors), answering 'how many dims can this corpus "
    "afford to drop'. Same ulp-proof ranking discipline as "
    "knn_brute_force (sims rounded to 4dp before ranking, id "
    "tie-break). Scale: each evaluation is the brute-force pattern — "
    "broadcast fixed-size query sample x corpus scan, per-partition "
    "window top-k — and the truncated passes touch proportionally "
    "fewer floats (that is the point being measured); the recall join "
    "compares O(queries x k) frames.",
)
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    qs = sample_fixed_k(corpus, N_QUERIES, salt="q").select(
        F.col("vec_id").alias("query_id"), F.col("v")
    )
    truth = (
        brute_force_knn(corpus, qs, k=5)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    parts = []
    for dims in _MRL_DIMS:
        c_t = corpus.select("vec_id", F.slice("v", 1, dims).alias("v"))
        q_t = qs.select("query_id", F.slice("v", 1, dims).alias("v"))
        parts.append(
            brute_force_knn(c_t, q_t, k=5).select(
                "query_id",
                "neighbor_id",
                F.lit(dims).cast("int").alias("dims"),
            )
        )
    trunc = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return (
        trunc.join(F.broadcast(truth), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id", "dims")
        .agg(
            F.count("hit").cast("bigint").alias("n_hits"),
            F.round(F.count("hit") / F.lit(5.0), 4).alias("recall"),
        )
    )


@query(
    "embedding_cluster_quality",
    oracle=f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, v AS cv
              FROM ({_duck_sample(N_CENTROIDS, 'c')})),
    scored AS (
        SELECT c.vec_id, t.centroid_id, {_duck_cos('c.v', 't.cv')} AS csim,
               row_number() OVER (PARTITION BY c.vec_id
                   ORDER BY {_duck_cos('c.v', 't.cv')} DESC,
                            t.centroid_id ASC) AS rn
        FROM corpus c CROSS JOIN cents t
    ),
    per_vec AS (
        SELECT vec_id,
               max(CASE WHEN rn = 1 THEN centroid_id END) AS cluster,
               max(CASE WHEN rn = 1 THEN csim END) AS own,
               max(CASE WHEN rn = 2 THEN csim END) AS other
        FROM scored WHERE rn <= 2 GROUP BY vec_id
    )
    SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
           round(CAST(sum(CAST(own AS DECIMAL(38,10))) AS DOUBLE)
                 / count(*), 4) AS cohesion,
           round(CAST(sum(CAST(other AS DECIMAL(38,10))) AS DOUBLE)
                 / count(*), 4) AS nearest_other,
           round(CAST(sum(CAST(own - other AS DECIMAL(38,10))) AS DOUBLE)
                 / count(*), 4) AS margin
    FROM per_vec GROUP BY cluster
    """,
    description="Clustering-quality metrics for the IVF coarse quantizer "
    "(centroid-silhouette form): per cluster, mean cosine to the OWN "
    "centroid (cohesion), mean cosine to the NEAREST OTHER centroid, "
    "and their margin — the 'should I retrain / re-seed' health check "
    "beside knn_recall_eval (serving recall) and pq_distortion_stats "
    "(code fidelity); a cluster whose margin approaches 0 is leaking "
    "neighbors into other cells, which is exactly what degrades "
    "nprobe=1 recall. TRUE silhouette is all-pairs; the centroid form "
    "is its O(n·k) surrogate — one broadcast-centroid scan, both best "
    "and second-best from the SAME window pass (rn<=2), per-cluster "
    "decimal-stable means. Scale: identical plan shape to IVF "
    "assignment itself.",
)
def embedding_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    cents = sample_fixed_k(corpus, N_CENTROIDS, salt="c").select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    sim = F.round(
        F.expr(spark_dot("v", "cv"))
        / (
            F.sqrt(F.expr(spark_dot("v", "v")))
            * F.sqrt(F.expr(spark_dot("cv", "cv")))
        ),
        4,
    )
    scored = (
        corpus.crossJoin(F.broadcast(cents))
        .select("vec_id", "centroid_id", sim.alias("csim"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id").asc()
    )
    per_vec = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("vec_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("centroid_id"))).alias(
                "cluster"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("csim"))).alias("own"),
            F.max(F.when(F.col("rn") == 2, F.col("csim"))).alias("other"),
        )
    )
    dec = "decimal(38,10)"
    return per_vec.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.round(
            F.sum(F.col("own").cast(dec)).cast("double") / F.count(F.lit(1)), 4
        ).alias("cohesion"),
        F.round(
            F.sum(F.col("other").cast(dec)).cast("double") / F.count(F.lit(1)),
            4,
        ).alias("nearest_other"),
        F.round(
            F.sum((F.col("own") - F.col("other")).cast(dec)).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("margin"),
    )


@query(
    "hybrid_rrf_retrieval",
    oracle=f"""{_DUCK_KNN_PRELUDE},
    dt AS (
        SELECT doc_id,
               list_distinct(string_split_regex(trim(text), '\\s+')) AS s
        FROM documents
    ),
    qt AS (SELECT q.query_id, dt.s AS qs
           FROM q JOIN dt ON dt.doc_id = q.query_id),
    lex AS (
        SELECT query_id, doc_id, rn AS r FROM (
            SELECT qt.query_id, dt.doc_id,
                   row_number() OVER (PARTITION BY qt.query_id ORDER BY
                       round(CAST(len(list_intersect(dt.s, qt.qs)) AS DOUBLE)
                             / (len(dt.s) + len(qt.qs)
                                - len(list_intersect(dt.s, qt.qs))), 4) DESC,
                       dt.doc_id ASC) AS rn
            FROM dt JOIN qt ON dt.doc_id != qt.query_id)
        WHERE rn <= 20
    ),
    dense AS (
        SELECT query_id, neighbor_id AS doc_id, rn AS r FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY q.query_id ORDER BY
                       {_duck_cos('q.qv', 'c.v')} DESC, c.vec_id ASC) AS rn
            FROM corpus c JOIN q ON c.vec_id != q.query_id)
        WHERE rn <= 20
    ),
    contrib AS (
        SELECT query_id, doc_id, 'lex' AS tag, r FROM lex
        UNION ALL
        SELECT query_id, doc_id, 'dense' AS tag, r FROM dense
    ),
    fused AS (
        SELECT query_id, doc_id,
               sum(1.0 / (60 + r)) AS rrf,
               CAST(max(CASE WHEN tag = 'lex' THEN r END) AS BIGINT) AS r_lex,
               CAST(max(CASE WHEN tag = 'dense' THEN r END) AS BIGINT)
                   AS r_dense
        FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, r_lex, r_dense,
           round(rrf, 6) AS rrf_score, CAST(rn AS INTEGER) AS fused_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY rrf DESC, doc_id ASC) AS rn
          FROM fused)
    WHERE rn <= 10
    """,
    description="Hybrid retrieval with reciprocal-rank fusion: for each "
    "query document, a LEXICAL ranking (token-set Jaccard against the "
    "query doc, rounded 4dp + id tie-break) and a DENSE ranking "
    "(embedding cosine, the knn_brute_force discipline) each produce a "
    "top-20; RRF fuses them as sum(1/(60+rank)) over list memberships "
    "and keeps the top-10 — the standard BM25+ANN fusion serving "
    "pattern (k=60 per Cormack et al.). The fuse is a tagged UNION + "
    "one hash aggregate on (query, doc) — deliberately NOT a full-outer "
    "join, which Spark would have to sort-merge. Scale: both rankings "
    "are broadcast-fixed-query x corpus scans with salted two-phase "
    "top-k; fusion touches only O(queries x 40) rows; RRF arithmetic "
    "is the same rational double sequence in both engines.",
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.ops import text as T

    docs = _t(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id",
        F.array_distinct(F.expr(T.spark_tokens("text"))).alias("s"),
    )
    corpus = _corpus(spark, sf_dir)
    qs = sample_fixed_k(corpus, N_QUERIES, salt="q").select(
        F.col("vec_id").alias("query_id"), F.col("v")
    )
    qt = dt.join(
        F.broadcast(qs.select("query_id")),
        dt.doc_id == F.col("query_id"),
    ).select("query_id", F.col("s").alias("qs"))
    inter = F.expr("cast(size(array_intersect(s, qs)) as bigint)")
    lex_scored = (
        dt.join(F.broadcast(qt), dt.doc_id != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(
                inter.cast("double")
                / (F.size("s") + F.size("qs") - inter),
                4,
            ).alias("sim"),
        )
    )
    lex = top_n_per_group(
        lex_scored,
        keys=["query_id"],
        order_by=[F.col("sim").desc(), F.col("doc_id")],
        n=20,
        rank_col="r",
        low_cardinality=True,
    ).select("query_id", "doc_id", F.col("r").cast("bigint").alias("r"))
    dense = brute_force_knn(corpus, qs, k=20).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("bigint").alias("r"),
    )
    contrib = lex.withColumn("tag", F.lit("lex")).unionByName(
        dense.withColumn("tag", F.lit("dense"))
    )
    fused = contrib.groupBy("query_id", "doc_id").agg(
        F.sum(F.lit(1.0) / (F.lit(60) + F.col("r"))).alias("rrf"),
        F.max(F.when(F.col("tag") == "lex", F.col("r")))
        .cast("bigint")
        .alias("r_lex"),
        F.max(F.when(F.col("tag") == "dense", F.col("r")))
        .cast("bigint")
        .alias("r_dense"),
    )
    top = top_n_per_group(
        fused,
        keys=["query_id"],
        order_by=[F.col("rrf").desc(), F.col("doc_id")],
        n=10,
        rank_col="fused_rank",
        low_cardinality=True,
    )
    return top.select(
        "query_id",
        "doc_id",
        "r_lex",
        "r_dense",
        F.round("rrf", 6).alias("rrf_score"),
        F.col("fused_rank").cast("int").alias("fused_rank"),
    )


# Re-apply the gate-priority order now this family is fully registered —
# covers direct imports of this module, which enter queries.py circularly
# before these decorators have run (see queries._apply_gate_priority).
from smartpool_bigdata_spark.queries import _apply_gate_priority as __reorder  # noqa: E402

__reorder()


@query(
    "embedding_dbscan_2d",
    oracle="""
    WITH RECURSIVE pts AS (
        SELECT vec_id AS id,
               CAST(embedding[1] AS DOUBLE) AS x,
               CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings
    ),
    prs AS (
        SELECT a.id AS ia, b.id AS ib
        FROM pts a JOIN pts b
          ON a.id != b.id
         AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             <= 0.03 * 0.03
    ),
    cnt AS (SELECT ia AS id, count(*) + 1 AS n FROM prs GROUP BY 1),
    roles AS (
        SELECT p.id, coalesce(c.n, 1) >= 8 AS is_core
        FROM pts p LEFT JOIN cnt c ON c.id = p.id
    ),
    cedges AS (
        SELECT ia AS a, ib AS b FROM prs
        WHERE ia IN (SELECT id FROM roles WHERE is_core)
          AND ib IN (SELECT id FROM roles WHERE is_core)
    ),
    reach(node, r) AS (
        SELECT DISTINCT a AS node, a AS r FROM cedges
        UNION
        SELECT e.b AS node, reach.r FROM reach JOIN cedges e
          ON e.a = reach.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    core_comp AS (
        SELECT ro.id, coalesce(comp.component, ro.id) AS component
        FROM roles ro LEFT JOIN comp ON comp.node = ro.id
        WHERE ro.is_core
    ),
    border AS (
        SELECT p.ia AS id, min(cc.component) AS component
        FROM prs p
        JOIN roles ro ON ro.id = p.ia AND NOT ro.is_core
        JOIN core_comp cc ON cc.id = p.ib
        GROUP BY p.ia
    ),
    assigned AS (
        SELECT id, 'core' AS role, component FROM core_comp
        UNION ALL
        SELECT id, 'border' AS role, component FROM border
    )
    SELECT CAST(id AS BIGINT) AS id, role,
           CAST(component AS BIGINT) AS component
    FROM assigned
    UNION ALL
    SELECT CAST(p.id AS BIGINT) AS id, 'noise' AS role,
           CAST(-1 AS BIGINT) AS component
    FROM pts p WHERE p.id NOT IN (SELECT id FROM assigned)
    """,
    description="Exact 2-D DBSCAN (eps=0.03, minPts=8) over the first "
    "two embedding dimensions — DENSITY-based clustering with explicit "
    "noise, the family k-means/IVF can't express (arbitrary-shape "
    "clusters; outliers stay unassigned instead of polluting a "
    "centroid). Spark plan: ops.vectors.dbscan_2d — the O(n²) "
    "neighbor search becomes a grid-cell equi-join (side-eps cells, "
    "9-cell probe explode, exact squared distance as the residual — "
    "the same bucketize-then-residual rewrite as the range join; "
    "plain multiplies, never pow(), so the predicate is bit-identical "
    "cross-engine), then counts/roles are hash aggregates and "
    "clusters reuse connected_components with min-id borders. The "
    "oracle replays the FULL per-point assignment (role + component "
    "for every vector) via the naive quadratic join + recursive-CTE "
    "closure.",
)
def embedding_dbscan_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.ops.vectors import dbscan_2d

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    out = dbscan_2d(emb, id_col="vec_id", x="x", y="y", eps=0.03, min_pts=8)
    return out.select(
        F.col("id").cast("bigint").alias("id"),
        "role",
        F.col("component").cast("bigint").alias("component"),
    )


__reorder()
