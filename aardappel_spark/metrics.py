"""Observability: re-export the reference's metric vocabulary
(BASELINE.md / SURVEY.md §6) from Spark-native hooks.

Reference metrics (internal/pmon/pmon.go):
  modifications_count (counter)           pmon.go:92
  modifications_count_per_table{tag}      pmon.go:42
  commit_latency (histogram, sec)         pmon.go:96-99
  quorum_waiting_latency (histogram, sec) pmon.go:105-108
  request_size_bytes (counter)            pmon.go:101-103
  replication_lag_estimation (gauge, sec) pmon.go:114-116 = now_ms - quorum.step
  topic_without_hb{tag} (gauge)           pmon.go:48
  mps (modifications/sec, logged)         main.go:63,79-86

Implementation: a plain in-process registry fed by the engine's batch
kernel, plus a ``StreamingQueryListener`` for Spark-level progress.
Prometheus text exposition via ``render_prometheus()`` — no external
client library required.
"""

from __future__ import annotations

import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class Histogram:
    # Prometheus-style default buckets (pmon.go uses client defaults)
    buckets: tuple = (0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1, 2.5, 5, 10)
    counts: dict = field(default_factory=lambda: defaultdict(int))
    total: float = 0.0
    n: int = 0

    def observe(self, v: float) -> None:
        self.n += 1
        self.total += v
        for b in self.buckets:
            if v <= b:
                self.counts[b] += 1

    def render(self, name: str) -> list[str]:
        out = []
        cum = 0
        for b in self.buckets:
            cum = self.counts[b]
            out.append(f'{name}_bucket{{le="{b}"}} {cum}')
        out.append(f'{name}_bucket{{le="+Inf"}} {self.n}')
        out.append(f"{name}_sum {self.total}")
        out.append(f"{name}_count {self.n}")
        return out


@dataclass
class MetricsRegistry:
    modifications_count: int = 0
    modifications_per_table: dict = field(default_factory=lambda: defaultdict(int))
    request_size_bytes: int = 0
    commit_latency: Histogram = field(default_factory=Histogram)
    quorum_waiting_latency: Histogram = field(default_factory=Histogram)
    replication_lag_sec: float = 0.0
    topic_without_hb: dict = field(default_factory=lambda: defaultdict(int))
    last_batch_mps: float = 0.0

    # -- engine hooks ----------------------------------------------------

    def on_batch_applied(
        self,
        modifications: int,
        per_table: dict[str, int],
        commit_seconds: float,
        quorum_wait_seconds: float,
        quorum_step_ms: float | None,
        request_bytes: int = 0,
    ) -> None:
        self.modifications_count += modifications
        for tag, n in per_table.items():
            self.modifications_per_table[tag] += n
        self.request_size_bytes += request_bytes
        self.commit_latency.observe(commit_seconds)
        self.quorum_waiting_latency.observe(quorum_wait_seconds)
        if commit_seconds > 0:
            self.last_batch_mps = modifications / commit_seconds
        if quorum_step_ms is not None:
            # lag = now - quorum position (main.go:49-52)
            self.replication_lag_sec = max(
                0.0, time.time() - quorum_step_ms / 1000.0
            )

    def on_heartbeat_missing(self, tag: str, missing: bool) -> None:
        self.topic_without_hb[tag] = 1 if missing else 0

    # -- exposition ------------------------------------------------------

    def render_prometheus(self) -> str:
        lines = [f"modifications_count {self.modifications_count}"]
        for tag, n in sorted(self.modifications_per_table.items()):
            lines.append(f'modifications_count_per_table{{stream_tag="{tag}"}} {n}')
        lines.append(f"request_size_bytes {self.request_size_bytes}")
        lines += self.commit_latency.render("commit_latency")
        lines += self.quorum_waiting_latency.render("quorum_waiting_latency")
        lines.append(f"replication_lag_estimation {self.replication_lag_sec}")
        for tag, v in sorted(self.topic_without_hb.items()):
            lines.append(f'topic_without_hb{{stream_tag="{tag}"}} {v}')
        return "\n".join(lines) + "\n"


def make_streaming_listener(registry: MetricsRegistry):
    """Spark StreamingQueryListener feeding batch progress into the
    registry (S14). Import is deferred so batch-only users don't need
    the streaming classes."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            registry.last_batch_mps = p.processedRowsPerSecond or 0.0

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    return _Listener()
