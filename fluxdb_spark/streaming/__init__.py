from fluxdb_spark.streaming.ingest import IngestPipeline

__all__ = ["IngestPipeline"]
