"""Stats / observability (SURVEY §2 P18).

Reference: mutex-guarded counters logged every stats-duration and
served over HTTP /started /healthz /stats with optional pprof
(/root/reference/route81.go:488-679, 919-980). Spark-native: the
producer stream carries observe() metrics; a StreamingQueryListener
accumulates them; a tiny HTTP thread serves the same endpoints.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql.streaming import StreamingQueryListener


class StatsListener(StreamingQueryListener):
    """Accumulates the observe('producer_stats', ...) metrics emitted by
    the producer job — the counter set mirrors route81.go:488-509."""

    def __init__(self, log: bool = True) -> None:
        # log=False ≡ route81's disable-stats-log: counters accumulate
        # (HTTP /stats still serves them) but nothing prints
        self.log = log
        self.lock = threading.Lock()
        self.counters: dict[str, int] = {
            "success": 0, "failed": 0, "inserted": 0, "updated": 0,
            "removed": 0, "queued": 0,
        }
        self.started_at = time.time()
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        row = event.progress.observedMetrics.get("producer_stats")
        if row is None:
            return
        with self.lock:
            d = row.asDict()
            self.counters["queued"] += int(d.get("queued", 0) or 0)
            self.counters["inserted"] += int(d.get("inserted", 0) or 0)
            self.counters["updated"] += int(d.get("updated", 0) or 0)
            self.counters["removed"] += int(d.get("removed", 0) or 0)
            # rows that reached the sink committed with the batch:
            # at-least-once success accounting (route81.go:824-831)
            self.counters["success"] += int(d.get("queued", 0) or 0)
        if self.log:
            print(f"route81_spark stats: {self.snapshot()}")

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        # fatal-error handling ≡ route81's shutdown on fatal Kafka errors
        # (route81.go:898-901)
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def snapshot(self) -> dict:
        with self.lock:
            return dict(self.counters)


def serve_stats(listener: StatsListener, port: int = 0) -> ThreadingHTTPServer:
    """HTTP /started /healthz /stats like route81.go:937-980. Returns the
    server (already serving on a daemon thread); .server_port has the
    bound port."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.path in ("/started", "/healthz"):
                body = b"ok"
            elif self.path == "/stats":
                body = json.dumps(listener.snapshot()).encode()
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv
