from fluxdb_spark.streaming.ingest import IngestPipeline
from fluxdb_spark.streaming.stateful import sessionize_stream
from fluxdb_spark.streaming.metrics import IngestMetricsListener, observe_ingest
from fluxdb_spark.streaming.follow import (
    follow_store,
    replicate_store,
    stream_commits,
)

__all__ = [
    "IngestPipeline",
    "sessionize_stream",
    "IngestMetricsListener",
    "observe_ingest",
    "follow_store",
    "replicate_store",
    "stream_commits",
]
