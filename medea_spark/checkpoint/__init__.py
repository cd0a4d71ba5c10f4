"""Per-partition checkpointing, lineage, and resumable reruns."""

from medea_spark.checkpoint.store import (
    CHECKPOINT_SCHEMA,
    CheckpointStore,
    ResumableResult,
    run_validation_with_checkpoints,
)

__all__ = [
    "CHECKPOINT_SCHEMA",
    "CheckpointStore",
    "ResumableResult",
    "run_validation_with_checkpoints",
]
