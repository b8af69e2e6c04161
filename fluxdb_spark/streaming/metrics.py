"""Ingest observability: the reference's Prometheus metrics and readiness
gate (metrics/metrics.go:21-24 head block number / head time drift;
isNearRealtime pipeline.go:441-443) re-expressed as Spark-native observed
metrics + a StreamingQueryListener.

`observe_ingest` attaches an `observe()` node to the streaming change-log —
the metrics are computed inside the running plan (no extra pass, no driver
collect) and surface in each progress event; `IngestMetricsListener` captures
them. Readiness = the stream is processing data whose height is close to the
source head, the LIB-world analog of "block time < 15 s behind wall clock".
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION = "fluxdb_ingest"


def observe_ingest(changelog_stream: DataFrame) -> DataFrame:
    """Attach head-height / row-count observed metrics to a streaming
    change-log. Zero-cost when no listener reads them."""
    return changelog_stream.observe(
        OBSERVATION,
        F.max("height").alias("head_height"),
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("is_deletion"), 1).otherwise(0)).alias(
            "tombstones"
        ),
    )


@dataclass
class IngestProgress:
    head_height: int | None = None
    total_rows: int = 0
    total_tombstones: int = 0
    batches: int = 0
    last_progress_ts: float = 0.0
    batch_durations_ms: list[int] = field(default_factory=list)


class IngestMetricsListener(StreamingQueryListener):
    """Captures the observed ingest metrics from every micro-batch.

    The metrics the reference exports (head block number; drift) are
    `progress.head_height` and `seconds_behind()`; throughput comes free
    from the batch durations.
    """

    def __init__(self):
        self.progress = IngestProgress()

    # -- StreamingQueryListener interface ------------------------------------

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = self.progress
        obs = (event.progress.observedMetrics or {}).get(OBSERVATION)
        if obs is not None:
            if obs["head_height"] is not None:
                h = int(obs["head_height"])
                p.head_height = h if p.head_height is None else max(p.head_height, h)
            p.total_rows += int(obs["rows"])
            p.total_tombstones += int(obs["tombstones"])
        p.batches += 1
        p.last_progress_ts = time.time()
        dur = event.progress.durationMs or {}
        if "triggerExecution" in dur:
            p.batch_durations_ms.append(int(dur["triggerExecution"]))

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def metrics(self) -> dict:
        """The scrape view of the captured progress — names mirror the
        reference's exported series (metrics/metrics.go:21-24)."""
        p = self.progress
        total_ms = sum(p.batch_durations_ms)
        return {
            "fluxdb_head_block_number": p.head_height,
            "fluxdb_head_time_drift_seconds": (
                None
                if p.last_progress_ts == 0.0
                else round(self.seconds_behind(), 3)
            ),
            "fluxdb_ingested_rows_total": p.total_rows,
            "fluxdb_ingest_tombstones_total": p.total_tombstones,
            "fluxdb_ingest_batches_total": p.batches,
            "fluxdb_ingest_rows_per_second": (
                round(p.total_rows / (total_ms / 1000.0), 3)
                if total_ms > 0
                else None
            ),
        }

    # -- readiness gate (reference isNearRealtime) ---------------------------

    def seconds_behind(self, now: float | None = None) -> float:
        """Wall-clock staleness of the last progress event."""
        if self.progress.last_progress_ts == 0.0:
            return float("inf")
        return (now or time.time()) - self.progress.last_progress_ts

    def is_near_realtime(self, threshold_s: float = 15.0) -> bool:
        """S8 — ready when the stream reported progress within the threshold
        (reference gate: head block < 15 s behind wall clock)."""
        return self.seconds_behind() < threshold_s


# -- scrape endpoint ---------------------------------------------------------


def prometheus_text(metrics: dict) -> str:
    """Render a flat name->value dict in the Prometheus text exposition
    format (gauges only — counters are monotonic values the scraper
    rate()s). None values are skipped, exactly like an exporter omitting
    a gauge that has no sample yet."""
    lines = []
    for name, value in sorted(metrics.items()):
        if value is None:
            continue
        lines.append(f"# TYPE {name} gauge")
        v = float(value)
        lines.append(f"{name} {int(v) if v.is_integer() else v}")
    return "\n".join(lines) + "\n"


class MetricsServer:
    """The reference's Prometheus scrape endpoint (metrics/metrics.go:21-24
    exports head_block_number / head_time_drift; served by dmetrics over
    HTTP): a daemon-thread HTTP server exposing GET /metrics from a
    caller-supplied metrics source. The source is a zero-arg callable
    returning a flat dict, so the same server fronts a streaming
    listener (IngestMetricsListener.metrics) or a store snapshot
    (server mode's checkpoint view)."""

    def __init__(self, source, host: str = "127.0.0.1", port: int = 0):
        import http.server
        import threading

        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if self.path.rstrip("/") not in ("", "/metrics"):
                    self.send_error(404)
                    return
                try:
                    body = prometheus_text(outer._source()).encode()
                except Exception as e:  # surface scrape failures as 500s
                    self.send_error(500, str(e))
                    return
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # quiet
                pass

        self._source = source
        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}/metrics"

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join()
