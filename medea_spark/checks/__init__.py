"""Table-level data-quality checks (SURVEY.md §2.C C8-C14)."""

from medea_spark.checks.completeness import time_gaps, volume_anomalies
from medea_spark.checks.ordering import monotonic_violations
from medea_spark.checks.drift import (
    BENFORD_P,
    benford_report,
    chi_square_p_value,
    chi_square_statistic,
    drift_decision,
    ks_statistic,
    lang_size_histogram,
    psi_statistic,
    wasserstein_distance,
)
from medea_spark.checks.referential import orphan_rows, referential_report
from medea_spark.checks.stats import (
    categorical_entropy,
    column_quantiles,
    column_stats,
    diff_tables,
    pairwise_corr,
    top_k,
)
from medea_spark.checks.suite import (
    Rule,
    accepted_values,
    in_range,
    matches,
    min_rows,
    not_null,
    run_check_suite,
    unique,
    unique_sampled,
)
from medea_spark.checks.outliers import MAD_SCALE, mad_outliers
from medea_spark.checks.relationships import (
    fd_violations,
    k_anonymity_report,
    relationship_violations,
)
from medea_spark.checks.uniqueness import duplicate_keys, uniqueness_report

__all__ = [
    "Rule",
    "accepted_values",
    "BENFORD_P",
    "benford_report",
    "categorical_entropy",
    "chi_square_p_value",
    "chi_square_statistic",
    "column_quantiles",
    "pairwise_corr",
    "column_stats",
    "in_range",
    "matches",
    "min_rows",
    "not_null",
    "run_check_suite",
    "unique",
    "unique_sampled",
    "diff_tables",
    "drift_decision",
    "duplicate_keys",
    "ks_statistic",
    "lang_size_histogram",
    "monotonic_violations",
    "psi_statistic",
    "time_gaps",
    "volume_anomalies",
    "wasserstein_distance",
    "orphan_rows",
    "referential_report",
    "top_k",
    "uniqueness_report",
    "fd_violations",
    "k_anonymity_report",
    "MAD_SCALE",
    "mad_outliers",
    "relationship_violations",
]
