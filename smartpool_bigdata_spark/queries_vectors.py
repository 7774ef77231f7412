"""Similarity-search queries over the ``embeddings`` table: exact
brute-force cosine top-k (the correctness baseline), IVF-style bucketed ANN
(the scale path), and sign-LSH embedding near-duplicate detection.

All UDF-free: dot products are ``zip_with`` + ``aggregate`` folds whose
sequential order makes the double arithmetic bit-identical to DuckDB's
``list_dot_product`` (validated), so every query gets a full value-hash
oracle — including the ANN variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from smartpool_bigdata_spark.ops.relational import top_n_per_group
from smartpool_bigdata_spark.ops.vectors import (
    as_double_array,
    assign_ivf_buckets,
    brute_force_knn,
    spark_cosine,
    spark_dot,
)
from smartpool_bigdata_spark.queries import query, _ts as _t

_DUCK_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _duck_cos(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 4)"
    )


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return as_double_array(emb, "embedding", "v").select("vec_id", "v")


@query(
    "knn_brute_force",
    oracle=f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM corpus WHERE vec_id % 100 = 7),
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
    description="Exact cosine top-5 ANN baseline: broadcast the (1%) query "
    "set against the corpus scan, per-partition window top-k. O(n·q·d) but "
    "one corpus scan, no corpus shuffle; sims rounded to 4dp before ranking "
    "with id tie-break so the ranking is ulp-noise-proof.",
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    qs = corpus.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("v")
    )
    return brute_force_knn(corpus, qs, k=5)


@query(
    "knn_ivf",
    oracle=f"""
    WITH corpus AS (SELECT vec_id, {_DUCK_V} AS v FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, v AS cv FROM corpus WHERE vec_id % 50 = 3),
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
    q AS (SELECT vec_id AS query_id, v AS qv, bucket
          FROM assigned WHERE vec_id % 100 = 7),
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
    "(scan + broadcast, no corpus shuffle), each query probes ONLY its "
    "centroid's bucket — candidate count drops ~n_centroids×. The bucket "
    "column doubles as the bucketBy key for a pre-partitioned 100 TB layout. "
    "Recall < 1 by construction; knn_brute_force is the recall oracle.",
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    cents = corpus.filter(F.col("vec_id") % 50 == 3).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    assigned = assign_ivf_buckets(corpus, cents).withColumn(
        "__nrm", F.expr(f"sqrt({spark_dot('v', 'v')})")
    )
    qs = assigned.filter(F.col("vec_id") % 100 == 7).select(
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
    cents AS (SELECT vec_id AS centroid_id, v AS cv FROM corpus WHERE vec_id % 50 = 3),
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
    qprobe AS (
        SELECT vec_id AS query_id, v AS qv, bucket
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY csim DESC, bucket ASC) AS rn
              FROM scored WHERE vec_id % 100 = 7)
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
    "test asserts multiprobe recall >= single-probe vs the exact baseline.",
)
def knn_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    cents = corpus.filter(F.col("vec_id") % 50 == 3).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    cents_n = cents.withColumn("__cnrm", F.expr(f"sqrt({spark_dot('cv', 'cv')})"))
    assigned = assign_ivf_buckets(corpus, cents).withColumn(
        "__nrm", F.expr(f"sqrt({spark_dot('v', 'v')})")
    )
    qs = corpus.filter(F.col("vec_id") % 100 == 7).select(
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


_SIGN_BITS = 16


def _spark_sign_bucket(v: str, bits: int = _SIGN_BITS) -> str:
    terms = [
        f"(CASE WHEN element_at({v}, {j + 1}) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def _duck_sign_bucket(v: str, bits: int = _SIGN_BITS) -> str:
    terms = [
        f"(CASE WHEN {v}[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


@query(
    "embedding_dup_clusters",
    oracle=f"""
    WITH RECURSIVE corpus AS (
        SELECT vec_id, {_DUCK_V} AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, {_DUCK_V} AS v FROM embeddings
        WHERE vec_id % 10 = 1
    ),
    bucketed AS (
        SELECT vec_id, v, {_duck_sign_bucket('v')} AS bucket FROM corpus
    ),
    pairs AS (
        SELECT l.vec_id AS a, r.vec_id AS b
        FROM bucketed l JOIN bucketed r
          ON l.bucket = r.bucket AND l.vec_id < r.vec_id
        WHERE {_duck_cos('l.v', 'r.v')} >= 0.99
    ),
    edges AS (
        SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
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
    description="Embedding near-duplicate CLUSTERING: sign-LSH candidate "
    "pairs (cosine >= 0.99) -> iterative connected components (HashMin "
    "label propagation) -> cluster sizes. The same pairs-to-keep-list "
    "step as doc_dup_clusters, over the vector modality. Oracle: DuckDB "
    "RECURSIVE CTE reachability closure — a full value-hash check of an "
    "iterative distributed algorithm on embeddings.",
    skip_bench=True,  # the pair stage is benched as embedding_near_dup
)
def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from smartpool_bigdata_spark.ops.graph import connected_components

    corpus = _corpus(spark, sf_dir)
    planted = corpus.filter(F.col("vec_id") % 10 == 1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "v"
    )
    bucketed = corpus.union(planted).withColumn(
        "bucket", F.expr(_spark_sign_bucket("v"))
    )
    left = bucketed.alias("l")
    right = bucketed.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.expr(f"round({spark_cosine('l.v', 'r.v')}, 4)").alias("sim"),
        )
        .filter(F.col("sim") >= 0.99)
    )
    cc = connected_components(pairs, src="vec_a", dst="vec_b")
    return cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))


@query(
    "embedding_near_dup",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, {_DUCK_V} AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, {_DUCK_V} AS v FROM embeddings
        WHERE vec_id % 10 = 1
    ),
    bucketed AS (
        SELECT vec_id, v, {_duck_sign_bucket('v')} AS bucket FROM corpus
    )
    SELECT l.vec_id AS vec_a, r.vec_id AS vec_b, {_duck_cos('l.v', 'r.v')} AS sim
    FROM bucketed l JOIN bucketed r
      ON l.bucket = r.bucket AND l.vec_id < r.vec_id
    WHERE {_duck_cos('l.v', 'r.v')} >= 0.99
    """,
    description="Embedding-cosine near-dup via sign-LSH (first-16-dims sign "
    "quantization buckets — an SRP sketch with axis-aligned planes): "
    "same-bucket pairs only, cosine >= 0.99, on corpus ∪ planted duplicates. "
    "Never all-pairs; identical vectors always share a bucket (recall 1.0 "
    "for exact dups), random pairs collide with p≈2^-16.",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    planted = corpus.filter(F.col("vec_id") % 10 == 1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "v"
    )
    bucketed = corpus.union(planted).withColumn(
        "bucket", F.expr(_spark_sign_bucket("v"))
    )
    left = bucketed.alias("l")
    right = bucketed.alias("r")
    return (
        left.join(
            right,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("r.vec_id").alias("vec_b"),
            F.expr(f"round({spark_cosine('l.v', 'r.v')}, 4)").alias("sim"),
        )
        .filter(F.col("sim") >= 0.99)
    )
