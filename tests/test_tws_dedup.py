"""transformWithStateInPandas loop-guard: the streaming operator that
reproduces the reference's sequential dedup semantics AND emits blocked
rows (batch twin: functions/loopguard.with_loop_blocked)."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.mark.skipif(
    not __import__(
        "cdc_sync_poc_spark.streaming.dedup", fromlist=["HAVE_TWS"]
    ).HAVE_TWS,
    reason="transformWithStateInPandas unavailable",
)
def test_tws_loopguard_matches_batch_semantics(spark, tmp_path):
    from cdc_sync_poc_spark.streaming.dedup import transform_with_state_dedup
    from cdc_sync_poc_spark.streaming.source import file_event_stream, stream_cdc_view

    # one user repeating the same payload -> same hash; gaps 3/6/20 min
    pdf = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:03:00",  # within 5 min of applied e0 -> blocked
                    "2024-01-01 00:06:00",  # >5 min after e0 (e1 blocked) -> applied
                    "2024-01-01 00:26:00",  # far out -> applied
                    "2024-01-01 00:26:30",  # different payload -> applied
                ]
            ).astype("datetime64[us]"),
            "user_id": [1, 1, 1, 1, 1],
            "event_type": ["click"] * 5,
            "value": [10.0, 10.0, 10.0, 10.0, 42.0],
            "props": ['{"k": 1}'] * 5,
        }
    )
    in_dir = tmp_path / "tws_in"
    in_dir.mkdir()
    pdf.to_parquet(in_dir / "part-0.parquet")

    cdc = stream_cdc_view(file_event_stream(spark, str(in_dir)))
    guarded = transform_with_state_dedup(cdc)
    rows = []
    q = (
        guarded.writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r.cdc_seq: r.loop_blocked for r in rows}
    assert got == {0: False, 1: True, 2: False, 3: False, 4: False}


def test_stateful_dedup_carries_state_across_microbatches(spark, tmp_path):
    """applyInPandasWithState loop-guard: an event in micro-batch 2
    within 5 min of an applied event from micro-batch 1 is blocked —
    state survives in the checkpointed store between batches."""
    from cdc_sync_poc_spark.streaming.dedup import stateful_dedup
    from cdc_sync_poc_spark.streaming.source import file_event_stream, stream_cdc_view

    def batch(ids, ts_list):
        return pd.DataFrame(
            {
                "event_id": ids,
                "ts": pd.to_datetime(ts_list).astype("datetime64[us]"),
                "user_id": [1] * len(ids),
                "event_type": ["click"] * len(ids),
                "value": [10.0] * len(ids),
                "props": ['{"k": 1}'] * len(ids),
            }
        )

    in_dir = tmp_path / "st_in"
    in_dir.mkdir()
    # batch 1 (file a): applied at t0
    batch([0], ["2024-01-01 00:00:00"]).to_parquet(in_dir / "a.parquet")
    # batch 2 (file b): +3 min -> blocked by batch-1 state; +10 min -> applied
    batch([1, 2], ["2024-01-01 00:03:00", "2024-01-01 00:13:00"]).to_parquet(
        in_dir / "b.parquet"
    )

    cdc = stream_cdc_view(file_event_stream(spark, str(in_dir)))
    rows = []
    q = (
        stateful_dedup(cdc)
        .writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.cdc_seq: r.loop_blocked for r in rows}
    assert got == {0: False, 1: True, 2: False}
