from fluxdb_spark.operators.asof import asof_join
from fluxdb_spark.operators.bloomjoin import bloom_semi_join, build_bloom
from fluxdb_spark.operators.ranges import range_join
from fluxdb_spark.operators.skew import salted_agg, salted_join
from fluxdb_spark.operators.temporal import (
    has_rows,
    latest_checkpoint,
    row_at,
    singlet_at,
    singlet_history,
    state_at,
    state_diff,
    state_join,
    state_series,
    time_weighted_avg,
)

__all__ = [
    "state_at",
    "state_diff",
    "state_join",
    "state_series",
    "time_weighted_avg",
    "row_at",
    "singlet_at",
    "singlet_history",
    "has_rows",
    "latest_checkpoint",
    "asof_join",
    "bloom_semi_join",
    "build_bloom",
    "range_join",
    "salted_agg",
    "salted_join",
]
