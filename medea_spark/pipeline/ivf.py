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
    """Fitted coarse quantizer + the cluster-assigned corpus.

    ``centers`` (when the quantizer was fit driver-side, i.e. MLlib
    KMeans) is the raw ``[(cluster, [components...]), ...]`` list —
    nlist rows of driver memory.  :func:`export_centroids` uses it to
    write the centroid parquet without launching a Spark write job."""

    centroids: DataFrame  # (cluster int, centroid array<double>)
    assigned: DataFrame  # corpus columns + cluster int
    id_col: str
    vec_col: str
    centers: list | None = None


def export_centroids(index: IvfIndex, path: str) -> None:
    """Persist the fitted centroids as ONE parquet file at ``path``.

    nlist rows are driver-resident by construction (KMeans models hold
    their centers on the driver), so this writes them with pyarrow
    directly — a millisecond file write — instead of scheduling a
    Spark job whose task launch + commit protocol costs a thousand
    times the payload.  Readers (Spark scan, DuckDB oracle) see the
    identical bytes either way."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    if index.centers is None:
        raise ValueError("export_centroids needs an index fit with raw centers")
    # overwrite semantics: never leave stale part files from an earlier
    # (possibly Spark-written) export to be picked up by readers
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    table = pa.table(
        {
            "cluster": pa.array([int(c) for c, _ in index.centers], pa.int64()),
            "centroid": pa.array(
                [[float(x) for x in v] for _, v in index.centers],
                pa.list_(pa.float64()),
            ),
        }
    )
    pq.write_table(table, f"{path}/part-00000.parquet")


def assign_cells(
    df: DataFrame, centroids: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Windowless max-cosine cell assignment — the 100 TB shape.

    The nlist centroids collapse to ONE row holding a cluster-ascending
    ``array<struct<cluster,centroid>>``; a broadcast cross join with
    that single row adds the array as a column, and the argmax runs
    inside whole-stage codegen via ``transform`` (one cosine per cell)
    + ``array_max`` over ``struct(sim, -cluster)`` (ties → smallest
    cluster, matching ``row_number over (sim desc, cluster asc)``).
    No row blowup, no per-id window shuffle: the corpus is scanned once
    and gains one int column.  Engine-portable: any SQL engine with the
    same dot product reproduces the assignment bit-exactly.
    """
    cells = centroids.select(
        F.sort_array(F.collect_list(F.struct("cluster", "centroid"))).alias("_cells")
    )
    v = F.col(vec_col).cast("array<double>")
    best = F.array_max(
        F.transform(
            F.col("_cells"),
            lambda c: F.struct(
                cosine(v, c["centroid"]).alias("sim"),
                (-c["cluster"]).alias("negc"),
            ),
        )
    )
    return (
        df.crossJoin(F.broadcast(cells))
        .withColumn("cluster", (-best["negc"]).cast("int"))
        .drop("_cells")
    )


def build_ivf_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    sample_fraction: float | None = None,
    portable_assign: bool = False,
    max_iter: int = 20,
    init_mode: str = "k-means||",
) -> IvfIndex:
    """Fit the coarse quantizer and assign every vector to a cell.

    At 100 TB, fit on a sample (``sample_fraction``) — k-means
    centroids converge on a tiny fraction of the corpus — then assign
    the full corpus in one narrow pass: either ``model.transform``
    (euclidean argmin, MLlib codepath) or, with ``portable_assign``,
    the relational max-cosine argmax of :func:`assign_cells` — same
    scan-once/no-shuffle shape, but reproducible bit-exactly by any
    SQL engine from the exported centroids (that is what the
    ``ivf_kmeans_topk`` DuckDB oracle does; cosine is also the right
    cell metric when the search metric is cosine).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    featurized = df.withColumn(
        "_features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    fit_input = featurized
    if sample_fraction is not None and sample_fraction < 1.0:
        fit_input = featurized.sample(fraction=sample_fraction, seed=seed)
    # max_iter trades fit cost for centroid quality — IVF recall is
    # governed by n_probe far more than by fully-converged centroids,
    # so production indexes can cut iterations well below MLlib's 20.
    # init_mode="random" (deterministic under the fixed seed) skips the
    # k-means|| init sweep — several extra distributed passes whose only
    # payoff is faster convergence the low max_iter forgoes anyway.
    model = KMeans(
        k=nlist, seed=seed, maxIter=max_iter, initMode=init_mode,
        featuresCol="_features", predictionCol="cluster",
    ).fit(fit_input)
    spark = df.sparkSession
    # Centroids come from the driver-side model: nlist rows —
    # broadcast-sized by construction.
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    centroids = spark.createDataFrame(centers, ["cluster", "centroid"])
    if portable_assign:
        assigned = assign_cells(df, centroids, vec_col)
    else:
        assigned = model.transform(featurized).drop("_features")
    return IvfIndex(
        centroids=centroids,
        assigned=assigned,
        id_col=id_col,
        vec_col=vec_col,
        centers=centers,
    )


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
    KMeans one for production indexes.  Assignment is the same
    windowless codegen argmax both paths share (:func:`assign_cells`) —
    one narrow pass, no |corpus|×nlist blowup, no per-id window."""
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
    assigned = assign_cells(df, centroids, vec_col)
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
