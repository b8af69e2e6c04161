from fluxdb_spark.sources.tables import load_table, load_tables
from fluxdb_spark.sources.changelog import (
    changelog_from_events,
    singlet_log_from_events,
    CHANGELOG_CTE,
    SINGLET_CTE,
)

__all__ = [
    "load_table",
    "load_tables",
    "changelog_from_events",
    "singlet_log_from_events",
    "CHANGELOG_CTE",
    "SINGLET_CTE",
]
