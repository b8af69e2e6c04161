from fluxdb_spark.sources.tables import load_table, load_tables
from fluxdb_spark.sources.changelog import (
    changelog_from_events,
    singlet_log_from_events,
    CHANGELOG_CTE,
    SINGLET_CTE,
)
from fluxdb_spark.sources.blocks import (
    parse_json_blocks,
    map_blocks_with_pandas,
    map_blocks_with_udtf,
    BLOCK_PAYLOAD_SCHEMA,
)

__all__ = [
    "load_table",
    "load_tables",
    "changelog_from_events",
    "singlet_log_from_events",
    "CHANGELOG_CTE",
    "SINGLET_CTE",
    "parse_json_blocks",
    "map_blocks_with_pandas",
    "map_blocks_with_udtf",
    "BLOCK_PAYLOAD_SCHEMA",
]
