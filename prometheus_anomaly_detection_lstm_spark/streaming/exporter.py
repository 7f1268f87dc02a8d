"""Prometheus exporter sink (SURVEY §2.1-S12).

The reference serves six metrics via ``prometheus_client``
(realtime_detector.py:244-285, names at :251-258; served at :376-391 on
``exporter_port`` 8901 with prefix ``anomaly_detector_``,
config.yaml:123-126).  ``prometheus_client`` is not in this image, so
this is a minimal stdlib implementation of the public text exposition
format (https://prometheus.io/docs/instrumenting/exposition_formats/)
with the exact metric names/labels preserved:

    <prefix>latest_reconstruction_error_mse           Gauge
    <prefix>is_anomaly_detected                       Gauge
    <prefix>total_anomalies_count                     Counter (init 0)
    <prefix>feature_reconstruction_error_mse{feature_name=...}  Gauge
    <prefix>last_successful_run_timestamp_seconds     Gauge
    <prefix>data_points_in_current_window             Gauge

Updates happen driver-side inside ``foreachBatch`` — the natural Spark
location for a push-style serving sink (tiny per-trigger output).
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class Metric:
    def __init__(self, name: str, doc: str, kind: str, labelnames=()):
        self.name = name
        self.doc = doc
        self.kind = kind  # "gauge" | "counter"
        self.labelnames = tuple(labelnames)
        self._values: dict[tuple, float] = {}
        self._lock = threading.Lock()

    def set(self, value: float, **labels) -> None:
        assert self.kind == "gauge"
        with self._lock:
            self._values[self._key(labels)] = float(value)

    def inc(self, amount: float = 1.0, **labels) -> None:
        assert self.kind == "counter"
        with self._lock:
            k = self._key(labels)
            self._values[k] = self._values.get(k, 0.0) + amount

    def set_to_current_time(self) -> None:
        self.set(time.time())

    def value(self, **labels) -> float | None:
        return self._values.get(self._key(labels))

    def _key(self, labels: dict) -> tuple:
        return tuple(labels.get(n, "") for n in self.labelnames)

    def exposition(self) -> str:
        lines = [
            f"# HELP {self.name} {self.doc}",
            f"# TYPE {self.name} {self.kind}",
        ]
        with self._lock:
            items = sorted(self._values.items())
        for key, val in items:
            if self.labelnames:
                labels = ",".join(
                    f'{n}="{v}"' for n, v in zip(self.labelnames, key)
                )
                lines.append(f"{self.name}{{{labels}}} {val}")
            else:
                lines.append(f"{self.name} {val}")
        return "\n".join(lines)


class DetectorMetrics:
    """The reference's six-metric registry (realtime_detector.py:251-258)."""

    def __init__(self, prefix: str = "anomaly_detector_"):
        self.latest_mse = Metric(
            f"{prefix}latest_reconstruction_error_mse",
            "Reconstruction MSE for the latest window",
            "gauge",
        )
        self.is_anomaly = Metric(
            f"{prefix}is_anomaly_detected",
            "Anomaly flag (1 anomaly, 0 normal)",
            "gauge",
        )
        self.total_anomalies = Metric(
            f"{prefix}total_anomalies_count",
            "Total anomalies detected",
            "counter",
        )
        self.feature_mse = Metric(
            f"{prefix}feature_reconstruction_error_mse",
            "Per-feature reconstruction MSE for the latest window",
            "gauge",
            labelnames=("feature_name",),
        )
        self.last_success = Metric(
            f"{prefix}last_successful_run_timestamp_seconds",
            "Timestamp of the last successful detection cycle",
            "gauge",
        )
        self.window_points = Metric(
            f"{prefix}data_points_in_current_window",
            "Data points in the current analysis window",
            "gauge",
        )
        # counter pre-initialized to 0 (realtime_detector.py:280-285)
        self.total_anomalies.inc(0.0)
        self._metrics = [
            self.latest_mse,
            self.is_anomaly,
            self.total_anomalies,
            self.feature_mse,
            self.last_success,
            self.window_points,
        ]

    def exposition(self) -> str:
        return "\n".join(m.exposition() for m in self._metrics) + "\n"


def start_http_server(
    metrics: DetectorMetrics, port: int = 8901
) -> ThreadingHTTPServer:
    """Serve /metrics in exposition format; returns the server (daemonized)."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 - stdlib API name
            body = metrics.exposition().encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence request logging
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
