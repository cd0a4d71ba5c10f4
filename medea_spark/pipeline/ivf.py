"""IVF (inverted-file) approximate nearest-neighbor search.

The classic two-stage ANN: k-means-partition the corpus into nlist
cells (the "coarse quantizer"), then search only the n_probe cells
whose centroids are nearest each query — exact cosine re-rank inside.

Scale story vs the LSH variant (similarity.py): IVF adapts to the data
distribution (cells follow density; hyperplanes don't), costs one
MLlib KMeans fit (sampled at scale) + one narrow cluster-id column,
and probing more cells trades latency for recall smoothly.  The
cluster assignment is a plain int column, so the candidate join is an
equi-join Catalyst can shuffle-partition or broadcast.

Determinism: fixed-seed KMeans; assignments and probe ranking are pure
functions of the fitted centroids.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from medea_spark.pipeline.similarity import cosine


@dataclass
class IvfIndex:
    """Fitted coarse quantizer + the cluster-assigned corpus."""

    centroids: DataFrame  # (cluster int, centroid array<double>)
    assigned: DataFrame  # corpus columns + cluster int
    id_col: str
    vec_col: str


def build_ivf_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> IvfIndex:
    """Fit the coarse quantizer and assign every vector to a cell.

    At 100 TB, fit on a sample (``sample_fraction``) — k-means
    centroids converge on a tiny fraction of the corpus — then assign
    the full corpus with the fitted model (one narrow pass).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    featurized = df.withColumn(
        "_features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    fit_input = featurized
    if sample_fraction is not None and sample_fraction < 1.0:
        fit_input = featurized.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(
        k=nlist, seed=seed, featuresCol="_features", predictionCol="cluster"
    ).fit(fit_input)
    assigned = model.transform(featurized).drop("_features")
    spark = df.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        ["cluster", "centroid"],
    )
    # vector_to_array imported for API symmetry; centroids come from the
    # driver-side model (nlist rows — broadcast-sized by construction).
    _ = vector_to_array
    return IvfIndex(centroids=centroids, assigned=assigned, id_col=id_col, vec_col=vec_col)


def build_ivf_index_hashseed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
) -> IvfIndex:
    """Zero-iteration coarse quantizer with engine-portable centroid
    choice: the ``nlist`` vectors with smallest md5("seed:id") seed the
    cells (cluster = rank in that hash order), and every vector joins
    the centroid of maximum cosine.  Fully relational — a SQL engine
    reproduces centroids, assignment, and probing exactly, which is
    what the DuckDB oracle for ivf_ann_topk does.

    Trade-off vs :func:`build_ivf_index` (MLlib KMeans): cells do not
    adapt to density, so recall/latency balance is worse; use this
    variant for differential testing and as a cheap bootstrap, the
    KMeans one for production indexes.  Assignment here scores
    |corpus| x nlist rows through a per-id window; the KMeans path
    assigns in one narrow pass."""
    w_cent = Window.orderBy("_hk", "_cid")
    centroids = (
        df.select(
            F.col(id_col).alias("_cid"), F.col(vec_col).cast("array<double>").alias("centroid")
        )
        .withColumn(
            "_hk", F.md5(F.concat(F.lit(f"{seed}:"), F.col("_cid").cast("string")))
        )
        .orderBy("_hk", "_cid")
        .limit(nlist)
        .withColumn("cluster", F.row_number().over(w_cent) - 1)
        .select("cluster", "centroid")
    )
    cv = F.col("centroid")
    va = F.col(vec_col).cast("array<double>")
    w_assign = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("cluster"))
    assigned = (
        df.crossJoin(F.broadcast(centroids))
        .withColumn("_csim", cosine(va, cv))
        .withColumn("_r", F.row_number().over(w_assign))
        .filter(F.col("_r") == 1)
        .drop("_csim", "_r", "centroid")
    )
    return IvfIndex(
        centroids=centroids, assigned=assigned, id_col=id_col, vec_col=vec_col
    )


def ivf_ann_topk(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """(query_id, neighbor_id, rank, sim): approximate top-k — probe the
    ``n_probe`` nearest cells per query, exact cosine re-rank inside."""
    id_col, vec_col = index.id_col, index.vec_col
    qv = F.col("qvec").cast("array<double>")
    cv = F.col("centroid")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("centroid_sim"), F.asc("cluster")
    )
    probes = (
        q.crossJoin(F.broadcast(index.centroids))
        .withColumn("centroid_sim", cosine(qv, cv))
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .filter(F.col("probe_rank") <= n_probe)
        .select("query_id", "qvec", "cluster")
    )
    ca = F.col(vec_col).cast("array<double>")
    scored = (
        index.assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(qv, ca), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
