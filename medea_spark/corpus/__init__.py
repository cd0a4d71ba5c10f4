"""Deterministic synthetic repo-file corpus generation."""

from medea_spark.corpus.generator import (
    CORPUS_SCHEMA_TEXT,
    CORPUS_SPARK_SCHEMA,
    PoolDoc,
    build_pool,
    corpus_schema_graph,
    dim_repos,
    generate_corpus,
)

__all__ = [
    "CORPUS_SCHEMA_TEXT",
    "CORPUS_SPARK_SCHEMA",
    "PoolDoc",
    "build_pool",
    "corpus_schema_graph",
    "dim_repos",
    "generate_corpus",
]
