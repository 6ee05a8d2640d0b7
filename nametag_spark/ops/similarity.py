"""Similarity search over embedding columns (task brief §ops).

- brute-force cosine top-k: the exact baseline, one broadcast of the query
  set, JVM-side dot products via zip_with/aggregate (no Python UDF)
- IVF-bucketed top-k: the scale path — deterministic coarse centroids,
  nprobe-bucket search; recall measured against the brute-force baseline in
  tests
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, vec_id, cosine).

    queries is expected to be small -> broadcast; the corpus scan is a single
    pass, ranking is a per-query window. Ties break by vec_id ascending."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))

    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def ivf_centroids(corpus: DataFrame, n_centroids: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic coarse centroids: the n lowest-id vectors, refined by
    one Lloyd iteration (mean of assigned vectors). Returns a list of
    (centroid_id, vector) suitable for broadcasting in a literal plan."""
    seeds = [
        (i, [float(x) for x in r[vec_col]])
        for i, r in enumerate(corpus.orderBy(id_col).limit(n_centroids).collect())
    ]
    spark = corpus.sparkSession
    cdf = spark.createDataFrame(seeds, ["cid", "cvec"])
    assigned = _assign(corpus, cdf, id_col, vec_col)
    means = (
        assigned.join(corpus.select(F.col(id_col), F.col(vec_col)), id_col)
        .groupBy("cid")
        .agg(
            F.array(
                *[
                    F.avg(F.element_at(_as_double(F.col(vec_col)), d + 1)).alias(f"d{d}")
                    for d in range(len(seeds[0][1]))
                ]
            ).alias("cvec")
        )
    )
    return [(r["cid"], list(r["cvec"])) for r in means.collect()]


def _assign(corpus: DataFrame, centroids_df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    scored = c.crossJoin(F.broadcast(centroids_df)).withColumn(
        "sim", _dot(F.col("_v"), F.col("cvec")) / (_norm(F.col("_v")) * _norm(F.col("cvec")))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).select(id_col, "cid")
    )


def rp_lsh_buckets(
    corpus: DataFrame,
    n_planes: int = 12,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (sign) LSH bucket per vector: bucket id packs the
    sign bit of the dot product with n_planes seeded Gaussian hyperplanes.
    Cosine-similar vectors collide with probability (1 - theta/pi)^n.
    Hyperplanes are driver-generated (deterministic) literal arrays — tiny,
    so they inline into the plan; no shuffle until the bucket groupBy."""
    import numpy as np

    first = corpus.select(vec_col).first()
    if first is None:
        return corpus.select(F.col(id_col), F.lit(0).cast("long").alias("bucket"))
    dim = len(first[vec_col])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)

    v = _as_double(F.col(vec_col))
    bucket = None
    for b in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        bit = (_dot(v, plane) > 0).cast("long") * (1 << b)
        bucket = bit if bucket is None else bucket + bit
    return corpus.select(F.col(id_col), bucket.alias("bucket"))


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k searching only the query's LSH bucket (single-probe;
    recall grows with fewer planes / multiple tables). The scale path when
    the corpus is bucketed+persisted once and queried many times."""
    cb = rp_lsh_buckets(corpus, n_planes, seed, id_col, vec_col)
    qb = rp_lsh_buckets(
        queries.select(F.col(query_id_col).alias(id_col), F.col(vec_col)), n_planes, seed, id_col, vec_col
    ).select(F.col(id_col).alias("query_id"), F.col("bucket"))

    bucketed = corpus.join(cb, id_col)
    cand = bucketed.join(qb, "bucket").select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        "query_id",
    )
    q = queries.select(F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
    scored = cand.join(q, "query_id").withColumn(
        "cosine", _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: search only the nprobe nearest centroid buckets.

    At scale the assignment is computed once and persisted (partitioned by
    cid); queries then touch nprobe/n_centroids of the corpus."""
    spark = corpus.sparkSession
    cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    cdf = spark.createDataFrame(cents, ["cid", "cvec"])

    assignment = _assign(corpus, cdf, id_col, vec_col)
    bucketed = corpus.join(assignment, id_col)

    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    qc = q.crossJoin(F.broadcast(cdf)).withColumn(
        "sim", _dot(F.col("qv"), F.col("cvec")) / (_norm(F.col("qv")) * _norm(F.col("cvec")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cid"))
    probes = qc.withColumn("rn", F.row_number().over(wq)).where(F.col("rn") <= nprobe).select(
        "query_id", "cid"
    )

    cand = bucketed.join(probes, "cid").select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        "query_id",
    )
    scored = cand.join(q, "query_id").withColumn(
        "cosine", _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cosine", 6).alias("cosine"))
    )
