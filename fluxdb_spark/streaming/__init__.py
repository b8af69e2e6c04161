from fluxdb_spark.streaming.ingest import IngestPipeline
from fluxdb_spark.streaming.stateful import sessionize_stream

__all__ = ["IngestPipeline", "sessionize_stream"]
