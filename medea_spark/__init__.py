"""medea_spark — a PySpark-native schema + constraint validation engine.

A from-scratch engine in the spirit of the Medea JSON schema language
(reference: juspay/medea, a single-document Haskell validator).  This
package re-expresses those semantics Spark-first:

* ``medea_spark.compiler`` — driver-side compilation of Medea-style
  schema text into an acyclic graph of constraint predicates
  (reference parity: src/Data/Medea/Parser/*, src/Data/Medea/Analysis.hs).
* ``medea_spark.kernel``  — a pure-Python, Spark-free per-document
  validator used inside Arrow-vectorized pandas UDF batches
  (reference parity: src/Data/Medea.hs validate/checkTypes).
* ``medea_spark.engine``  — the distributed shell: repo-hash
  partitioning with deterministic skew salting, the vectorized
  validation kernel UDF, violation explode, per-partition summaries.
* ``medea_spark.checks``  — table-level data-quality checks: column
  stats, uniqueness via hash aggregation, referential integrity via
  broadcast anti-join, chi-square distribution drift.
* ``medea_spark.checkpoint`` — per-partition checkpoint/lineage/metrics
  records with anti-join resume.
* ``medea_spark.corpus`` — deterministic synthetic repo-file corpus
  generator replaying the conformance fixtures as table rows.
* ``medea_spark.pipeline`` — large-scale training-data-pipeline
  operators: dedup (exact/minhash/simhash/jaccard), similarity search,
  text analysis, multimodal column plumbing.
"""

from medea_spark.compiler import compile_schema_text
from medea_spark.kernel import validate_document

__version__ = "0.1.0"

__all__ = ["compile_schema_text", "validate_document", "__version__"]
