"""Monitoring (SURVEY §7.1 M5) — the Spark-native form of the
reference's in-memory counter service (CdcMonitoringService.java:34-47:
AtomicLong totals, per-topic TableStats, ring buffers).

Two mechanisms, zero extra passes over the data:

* ``observe()`` metrics — aggregates piggybacked on an existing action
  (no separate job, no shuffle): received/success/failed counts and the
  guarded success rate, computed while the real query runs. Batch uses
  the ``Observation`` helper; streaming surfaces the same metrics in
  every micro-batch's ``StreamingQueryProgress.observedMetrics``.
* ``CdcMetricsListener`` — a StreamingQueryListener that accumulates
  those per-batch metrics into running totals, which is literally what
  the reference's AtomicLongs did, minus the race conditions.

The queryable forms (top-N recent, per-topic group-bys) are the batch
operators a01-a04 / s02-s04 over the audit table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

METRIC_NAME = "cdc_metrics"


def counter_columns(status_col: str = "status") -> list[Column]:
    """The reference's counter set as observe() aggregates
    (totalReceived / totalSuccess / totalFailed / successRate with the
    received>0 guard, CdcMonitoringService.java:115-125)."""
    s = F.col(status_col)
    received = F.count(F.lit(1))
    success = F.count_if(s == "SUCCESS")
    failed = F.count_if(s.isin("FAILED", "TARGET_NOT_FOUND"))
    return [
        received.alias("received"),
        success.alias("success"),
        failed.alias("failed"),
        F.when(received > 0, F.round(success * 100.0 / received, 4))
        .otherwise(0.0)
        .alias("success_rate"),
    ]


def observe_batch(df: DataFrame, status_col: str = "status") -> tuple[DataFrame, Observation]:
    """Attach counters to a batch DataFrame; read ``observation.get``
    after any action on the returned frame."""
    obs = Observation(METRIC_NAME)
    return df.observe(obs, *counter_columns(status_col)), obs


def observe_stream(df: DataFrame, status_col: str = "status") -> DataFrame:
    """Attach the same counters to a streaming DataFrame (metrics appear
    in each StreamingQueryProgress)."""
    return df.observe(METRIC_NAME, *counter_columns(status_col))


@dataclass
class CdcMetricsListener(StreamingQueryListener):
    """Accumulates observed metrics across micro-batches — the streaming
    replacement for the reference's AtomicLong counter service."""

    totals: dict = field(
        default_factory=lambda: {"received": 0, "success": 0, "failed": 0}
    )

    def onQueryStarted(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryProgress(self, event) -> None:
        m = event.progress.observedMetrics.get(METRIC_NAME)
        if m is not None:
            self.totals["received"] += m["received"]
            self.totals["success"] += m["success"]
            self.totals["failed"] += m["failed"]

    def onQueryIdle(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - trivial
        pass

    @property
    def success_rate(self) -> float:
        r = self.totals["received"]
        return round(self.totals["success"] * 100.0 / r, 4) if r else 0.0
