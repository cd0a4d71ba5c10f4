"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the correctness baseline: broadcast the
  (small) query set, one pass over the corpus, per-row dot products via
  built-in higher-order functions (zip_with + aggregate — JVM-side, no
  Python), TakeOrdered per query.
* LSH-bucketed ANN — the scale path: random-hyperplane signatures
  (deterministic planes derived from a seed), candidates = same bucket,
  exact cosine re-rank inside the bucket.  At 100 TB the bucket join
  replaces the full cross product; recall is tested against the
  brute-force baseline in tests/test_pipeline.py.
* cosine near-duplicate pairs — embedding dedup: LSH buckets + exact
  threshold check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two double-array columns (JVM-side)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """(query_id, neighbor_id, rank, sim): exact top-k cosine neighbors
    of every query vector, excluding self-matches.

    ``queries`` is broadcast — the corpus is streamed once, never
    shuffled; ranking is a per-query window over the (|Q|·k-bounded)
    aggregated candidates.
    """
    qa = F.col(f"q.{vec_col}").cast("array<double>")
    ca = F.col(f"c.{vec_col}").cast("array<double>")
    scored = (
        df.alias("c")
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"), F.col(vec_col)
                ).alias("q")
            ),
            F.col(f"c.{id_col}") != F.col("query_id"),
        )
        .select(
            "query_id",
            F.col(f"c.{id_col}").alias("neighbor_id"),
            F.round(cosine(qa, ca), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """(id, bucket): random-hyperplane signature as a single integer
    bucket.  Vectorized numpy matmul inside mapInPandas — one pass,
    no shuffle."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _planes(dim, n_planes, seed)

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("bucket", T.LongType(), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ planes.T) > 0
            bucket = np.zeros(len(ids), dtype=np.int64)
            for j in range(n_planes):
                bucket |= bits[:, j].astype(np.int64) << j
            yield pd.DataFrame({"vec_id": ids, "bucket": bucket})

    return df.select(F.col(id_col).alias(id_col), F.col(vec_col)).mapInPandas(
        gen, schema
    )


def lsh_ann_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine re-rank.  Fewer planes → bigger buckets → higher
    recall and cost (tune per corpus density)."""
    sig = lsh_signatures(df, id_col, vec_col, n_planes, seed)
    corpus = df.join(sig, id_col)
    qsig = lsh_signatures(queries, id_col, vec_col, n_planes, seed)
    qdf = (
        queries.join(qsig, id_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            "bucket",
        )
    )
    qa = F.col("qvec").cast("array<double>")
    ca = F.col(vec_col).cast("array<double>")
    scored = (
        corpus.join(F.broadcast(qdf), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(qa, ca), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs (a < b, cosine ≥ threshold),
    LSH-bucketed so the pair join never goes quadratic globally."""
    sig = lsh_signatures(df, id_col, vec_col, n_planes, seed)
    with_sig = df.join(sig, id_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), "bucket"
    )
    a = with_sig.alias("a")
    b = with_sig.alias("b")
    va = F.col("a.vec").cast("array<double>")
    vb = F.col("b.vec").cast("array<double>")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round(cosine(va, vb), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .distinct()
    )
