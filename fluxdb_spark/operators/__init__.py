from fluxdb_spark.operators.temporal import (
    has_rows,
    latest_checkpoint,
    row_at,
    singlet_at,
    singlet_history,
    state_at,
)

__all__ = [
    "state_at",
    "row_at",
    "singlet_at",
    "singlet_history",
    "has_rows",
    "latest_checkpoint",
]
