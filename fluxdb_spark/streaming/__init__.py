from fluxdb_spark.streaming.ingest import IngestPipeline
from fluxdb_spark.streaming.stateful import sessionize_stream
from fluxdb_spark.streaming.metrics import IngestMetricsListener, observe_ingest
from fluxdb_spark.streaming.follow import (
    follow_store,
    replicate_store,
    stream_commits,
)
from fluxdb_spark.streaming.materialize import materialize_aggregate
from fluxdb_spark.streaming.retrieval import materialize_rowwise
from fluxdb_spark.streaming.serve import QueryServer

__all__ = [
    "IngestPipeline",
    "sessionize_stream",
    "IngestMetricsListener",
    "observe_ingest",
    "follow_store",
    "replicate_store",
    "stream_commits",
    "materialize_aggregate",
    "materialize_rowwise",
    "QueryServer",
]
