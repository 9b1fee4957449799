"""Monitoring layer (M5): observe() counters on batch and streaming
paths, and the accumulating StreamingQueryListener."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_DIR


def test_batch_observation_counters(spark):
    """observe() metrics piggyback on the classified pipeline without an
    extra pass, and agree with the a01 aggregate query."""
    from cdc_sync_poc_spark.cdc.envelope import classified_view
    from cdc_sync_poc_spark.registry import QUERIES, load_all_queries
    from cdc_sync_poc_spark.streaming.monitoring import observe_batch

    load_all_queries()
    df, obs = observe_batch(classified_view(spark, SF_DIR))
    n = df.count()
    got = obs.get
    want = QUERIES["a01_global_counters"](spark, SF_DIR).collect()[0]
    assert got["received"] == n == want.total_received
    assert got["success"] == want.total_success
    assert got["failed"] == want.total_failed
    assert got["success_rate"] == want.success_rate


def test_streaming_listener_accumulates(spark, tmp_path):
    """StreamingQueryProgress.observedMetrics feed the accumulating
    listener (the AtomicLong-counter replacement)."""
    import time

    from cdc_sync_poc_spark.streaming.monitoring import (
        CdcMetricsListener,
        observe_stream,
    )
    from cdc_sync_poc_spark.streaming.source import file_event_stream, stream_cdc_view

    pdf = pd.DataFrame(
        {
            "event_id": range(6),
            "ts": pd.to_datetime(["2024-01-01 00:00:00"] * 6).astype("datetime64[us]"),
            "user_id": [1, 2, 3, 4, 5, 6],
            "event_type": ["click"] * 6,
            "value": [float(i) for i in range(6)],
            "props": ['{"k": 1}'] * 6,
        }
    )
    in_dir = tmp_path / "mon_in"
    in_dir.mkdir()
    pdf.to_parquet(in_dir / "part-0.parquet")

    listener = CdcMetricsListener()
    spark.streams.addListener(listener)
    try:
        from pyspark.sql import functions as F

        cdc = stream_cdc_view(file_event_stream(spark, str(in_dir)))
        observed = observe_stream(cdc.withColumn("status", F.lit("SUCCESS")))
        q = (
            observed.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener callbacks are async; poll briefly
        for _ in range(40):
            if listener.totals["received"] >= 6:
                break
            time.sleep(0.25)
        assert listener.totals["received"] == 6
        assert listener.totals["success"] == 6
        assert listener.success_rate == 100.0
    finally:
        spark.streams.removeListener(listener)
