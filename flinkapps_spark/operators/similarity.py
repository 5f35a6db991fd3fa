"""Similarity search over embedding columns (beyond-reference).

- Brute-force cosine top-k: the exactness baseline. Queries are broadcast;
  the corpus streams past them in one pass (no corpus shuffle); ranking
  shuffles only (query × corpus-partition) partial top-k rows.
- LSH-bucketed ANN (random hyperplanes): the 100 TB path — candidates only
  within matching sign-buckets; probes grow recall.

Cosine math uses double-cast sequential folds (functions/vectors.py) so
DuckDB mirrors the arithmetic exactly; ranking keys round to 6 decimals
with a unique id tiebreak so ulp noise can never flip an ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flinkapps_spark.functions.vectors import cosine_similarity

# deterministic "random" hyperplanes: plane p component i =
# sin(p*10007 + i*101) — reproducible anywhere, no RNG state.
N_PLANES = 8


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def knn_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries must be small (it is broadcast); corpus is never shuffled until
    the final per-query rank of partial candidates.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      _as_double(F.col(vec_col)).alias("cv"))
    joined = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "vec_id",
        F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine", "rank"))


def _hyperplane(p: int, dim: int):
    return F.array(*[F.sin(F.lit(float(p * 10007 + i * 101)))
                     for i in range(dim)])


def bucket_signature(vec, dim: int):
    """Sign-pattern bucket id over N_PLANES deterministic hyperplanes."""
    bits = []
    for p in range(N_PLANES):
        plane = _hyperplane(p, dim)
        d = F.aggregate(F.zip_with(vec, plane, lambda x, y: x * y),
                        F.lit(0.0), lambda a, v: a + v)
        bits.append(F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def knn_lsh(corpus: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            dim: int = 64, multi_probe: bool = True) -> DataFrame:
    """ANN top-k: candidates restricted to the query's hyperplane bucket.

    multi_probe=True probes all buckets at hamming distance ≤ 1 from the
    query's signature (flip each of the N_PLANES bits → N_PLANES+1 probe
    buckets): candidates grow ~(P+1)/2^P of the corpus, recall roughly
    doubles vs single-probe. The corpus is bucketed ONCE; probing only
    fans out the (small, broadcast) query side.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      _as_double(F.col(vec_col)).alias("cv")) \
        .withColumn("c_bucket", bucket_signature(F.col("cv"), dim))
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv")) \
        .withColumn("q_bucket", bucket_signature(F.col("qv"), dim))
    if multi_probe:
        probes = F.array(F.col("q_bucket"),
                         *[F.col("q_bucket").bitwiseXOR(F.lit(1 << p))
                           for p in range(N_PLANES)])
        q = q.select("query_id", "qv",
                     F.explode(probes).alias("q_bucket"))
    joined = c.join(F.broadcast(q),
                    (F.col("c_bucket") == F.col("q_bucket"))
                    & (F.col("vec_id") != F.col("query_id")))
    scored = joined.select(
        "query_id", "vec_id",
        F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine", "rank"))


def embedding_neardup_pairs(df: DataFrame, threshold: float = 0.99,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    Fixture-scale: cross join (corpus is small). 100 TB path: bucket with
    knn_lsh's signatures first, cross join only within buckets.
    """
    a = df.select(F.col(id_col).alias("id_a"),
                  _as_double(F.col(vec_col)).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"),
                  _as_double(F.col(vec_col)).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(cosine_similarity(F.col("va"), F.col("vb")), 6)
                .alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def knn_ivf(corpus: DataFrame, queries: DataFrame, k: int = 5,
            n_centroids: int = 16, n_probe: int = 3,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 42) -> DataFrame:
    """IVF (inverted-file) ANN: KMeans-partition the corpus, search only
    the n_probe nearest centroid cells per query — the standard
    billion-vector scale path (coarse quantizer + cell scan).

    Uses Spark MLlib KMeans (fixed seed) for the coarse quantizer; cell
    assignment is a one-pass map, and each query's candidate set is
    n_probe/n_centroids of the corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(F.col(id_col).alias("vec_id"),
                      _as_double(F.col(vec_col)).alias("cv"))
    ml_input = c.withColumn("features", array_to_vector("cv"))
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features") \
        .fit(ml_input)
    assigned = model.transform(ml_input) \
        .select("vec_id", "cv", F.col("prediction").alias("cell"))

    centers = [[float(x) for x in ctr] for ctr in model.clusterCenters()]
    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(
        [(i, ctr) for i, ctr in enumerate(centers)],
        "cell int, center array<double>")

    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    # nearest n_probe cells per query: tiny cross join (queries × centroids)
    qc = q.crossJoin(F.broadcast(centers_df))
    dist = F.aggregate(
        F.zip_with(F.col("qv"), F.col("center"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, v: acc + v)
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("cell"))
    probe = (qc.withColumn("d", dist)
             .withColumn("pr", F.row_number().over(w))
             .filter(F.col("pr") <= n_probe)
             .select("query_id", "qv", "cell"))

    joined = assigned.join(F.broadcast(probe),
                           (assigned.cell == probe.cell)
                           & (F.col("vec_id") != F.col("query_id")))
    scored = joined.select(
        "query_id", "vec_id",
        F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cosine"))
    rank_w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                                    F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(rank_w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine", "rank"))


def embedding_centroids(df: DataFrame, label_col: str = "label",
                        vec_col: str = "embedding",
                        scale: int = 10 ** 7) -> DataFrame:
    """Per-label centroid of an embedding column: posexplode to
    (label, pos, value), aggregate per position, re-assemble the array in
    position order.

    Elements are fixed-pointed (ROUND(v*scale, 0) → int64) before summing:
    double summation is order-dependent across engines/partitions, while
    integer sums are associative.  ROUND at 0 dp is cross-engine-safe for
    any input (a double below 2^51 whose shortest repr ends in .5 IS
    exactly .5, and both engines break ties away from zero) — unlike
    ROUND at dp>0, which diverges on repr boundaries.  Precision loss is
    1/scale per element, documented contract of the operator.

    Scale: the explode shuffles n_vectors x dim skinny rows; partial
    aggregation collapses each (label, pos) to one row per task before
    the exchange, so shuffle bytes ~ |labels| x dim x n_tasks, not data
    size.  The re-assembly aggregates |labels| x dim rows — trivial.
    """
    e = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"))
    units = F.round(F.col("v") * scale, 0).cast("long")
    per_pos = (e.groupBy("label", "pos")
               .agg((F.sum(units) / F.count("*") / scale).alias("c"),
                    F.count("*").alias("n")))
    return (per_pos.groupBy("label")
            .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "c"))),
                     lambda s: s.getField("c")).alias("centroid"),
                 F.max("n").alias("n_vectors")))
