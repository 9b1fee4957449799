"""Shared foreachBatch helpers."""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame


@contextlib.contextmanager
def persisted(df: DataFrame):
    """Persist ``df`` for the scope and ALWAYS release it — including
    when a write dies mid-batch. An ingest body that persists without
    the finally strands one cache entry per crash-and-retry cycle (the
    VERDICT r11 #1 leak class, crash-path variant: the happy path
    unpersisted, the exception path did not). foreachBatch replays
    re-enter the body and re-persist, so releasing on failure is
    always correct."""
    df = df.persist()
    try:
        yield df
    finally:
        df.unpersist()
