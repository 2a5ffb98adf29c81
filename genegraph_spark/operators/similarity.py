"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and an IVF-style partitioned variant (scale path).

Engine capability beyond the reference (its nearest analog is the Lucene
suggester index, ``src/genegraph/suggest/``); required for training-data
pipelines. Dot products run JVM-side via ``zip_with``/``aggregate`` —
no Python in the scoring loop.

Scale notes: brute-force broadcasts the (small) query set against the
corpus — map-only, no shuffle, linear scan; right for reranking or small
query batches. The IVF variant shuffles the corpus once on a centroid
assignment and probes only the closest partitions per query — the
standard recall/throughput trade."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, vec_id, cosine, rank).

    Self-matches (same id) are excluded. Deterministic tie-break on
    neighbor id. The query side is broadcast — corpus never shuffles."""
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine_expr(F.col("qvec"), F.col("cvec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def default_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-K deterministic centroid selection: hash every id into one of
    ``n_centroids`` buckets (md5 — engine-reproducible) and take the
    min-id vector per bucket as the representative.

    K is a constant independent of corpus size, so the centroid broadcast
    in :func:`ivf_assign` stays O(K) at any scale (the round-1
    every-31st-row sample grew linearly with the corpus and would explode
    the broadcast at 10^9 rows). The bucket-min is a map-side partial
    aggregation — no sort, one tiny shuffle. In production the centroids
    come from a k-means fit; the interface is identical."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("bigint")
        % n_centroids
    )
    reps = (
        corpus.select(bucket.alias("_bkt"), F.col(id_col))
        .groupBy("_bkt")
        .agg(F.min(id_col).alias("centroid_id"))
    )
    return corpus.join(
        F.broadcast(reps), F.col(id_col) == F.col("centroid_id")
    ).select("centroid_id", F.col(vec_col))


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (one broadcast join +
    window argmax; the 'coarse quantizer'). Returns corpus + centroid_id."""
    cen = centroids.select(F.col(centroid_id_col), F.col(vec_col).alias("cenvec"))
    # 6dp-rounded score before the argmax so the assignment is
    # reproducible across engines/float-op orders (ties break on id)
    scored = corpus.join(F.broadcast(cen)).select(
        "*", F.round(cosine_expr(F.col(vec_col), F.col("cenvec")), 6).alias("_cscore")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_cscore"), F.asc(centroid_id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_cscore", "cenvec")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame | None = None,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style ANN: partition the corpus by nearest centroid; each query
    scans only its ``n_probe`` closest partitions. Approximate — recall
    depends on n_probe/centroid quality. Centroids default to
    :func:`default_centroids` (fixed K, deterministic, engine-
    reproducible); at scale, a k-means fit.
    """
    if centroids is None:
        centroids = default_centroids(corpus, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    # queries pick their n_probe nearest centroids (rounded score —
    # same determinism contract as the assignment)
    cen = centroids.select("centroid_id", F.col(vec_col).alias("cenvec"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("qvec"))
    qc = q.join(F.broadcast(cen)).select(
        query_id_col, "qvec", "centroid_id",
        F.round(cosine_expr(F.col("qvec"), F.col("cenvec")), 6).alias("_s"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.desc("_s"), F.asc("centroid_id"))
    probes = qc.withColumn("_rn", F.row_number().over(wq)).where(F.col("_rn") <= n_probe).drop(
        "_rn", "_s"
    )
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine_expr(F.col("qvec"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
