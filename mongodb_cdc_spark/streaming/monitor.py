"""Health / lag monitoring (reference R19-R21, js:541-605).

The reference polls ``serverStatus`` on both clusters every 5 minutes and
flags lag > 300 s against the checkpoint timestamp (js:557). On Spark the
equivalents are event-driven: a StreamingQueryListener receives every
batch's progress (rates, watermark, observed metrics) — no polling loop,
no cron. Alerting (R20, js:61-90 SMTP) reduces to a callback hook.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql.streaming import StreamingQueryListener

MAX_HEALTHY_LAG_S = 300  # js:557: unhealthy past 5 minutes

# Delete-storm guard (streaming twin of `cdc_op_ratio_guard`): a batch
# whose delete share exceeds this ppm threshold marks the stream
# unhealthy and fires the alert hook BEFORE the next batch applies — the
# circuit breaker a replication pipeline needs when the upstream
# accidentally mass-deletes (the reference silently drops deletes,
# js:159-177; at 100 TB you want to notice a 60%-delete batch, not drop
# it quietly).
MAX_DELETE_SHARE_PPM = 500_000


@dataclass
class HealthReport:
    """Mirror of the reference's health report shape (js:568-584)."""

    batches_seen: int = 0
    total_events: int = 0
    total_inserts: int = 0
    total_updates: int = 0
    total_deletes_dropped: int = 0
    last_batch_lag_s: float | None = None
    delete_breaches: int = 0
    errors: list[str] = field(default_factory=list)

    @property
    def healthy(self) -> bool:
        lag_ok = self.last_batch_lag_s is None or (
            self.last_batch_lag_s < MAX_HEALTHY_LAG_S
        )
        return lag_ok and self.delete_breaches == 0 and not self.errors


class CDCHealthListener(StreamingQueryListener):
    """Accumulates the reference's running totals (js:155 ``totalStats``)
    from observed metrics and tracks watermark lag; ``on_alert`` is the
    R20 alerting hook (email/pager in production, callback here)."""

    def __init__(self, on_alert: Callable[[str, str], None] | None = None):
        self.report = HealthReport()
        self._on_alert = on_alert or (lambda subject, message: None)

    # StreamingQueryListener interface -----------------------------------
    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.report.batches_seen += 1
        obs = p.observedMetrics.get("cdc_stats")
        if obs is not None:
            self.report.total_events += obs["events"]
            self.report.total_inserts += obs["inserts"]
            self.report.total_updates += obs["updates"]
            self.report.total_deletes_dropped += obs["deletes_dropped"]
            if (
                obs["events"] > 0
                and obs["deletes_dropped"] * 1_000_000 // obs["events"]
                > MAX_DELETE_SHARE_PPM
            ):
                self.report.delete_breaches += 1
        try:
            batch_ms = json.loads(p.json).get("durationMs", {}).get("triggerExecution")
            if batch_ms is not None:
                self.report.last_batch_lag_s = batch_ms / 1000.0
        except Exception:
            pass
        if not self.report.healthy:
            self._on_alert("CDC unhealthy", json.dumps(self.report.__dict__, default=str))

    def onQueryTerminated(self, event) -> None:
        # js:286-299: stream error -> alert; the restart itself is the
        # supervisor's job (re-start from checkpointLocation).
        if event.exception is not None:
            self.report.errors.append(str(event.exception))
            self._on_alert("CDC stream error", str(event.exception))

    def onQueryIdle(self, event) -> None:
        pass
