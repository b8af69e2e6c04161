from fluxdb_spark.operators.temporal import (
    has_rows,
    latest_checkpoint,
    row_at,
    singlet_at,
    singlet_history,
    state_at,
    state_diff,
)

__all__ = [
    "state_at",
    "state_diff",
    "row_at",
    "singlet_at",
    "singlet_history",
    "has_rows",
    "latest_checkpoint",
]
