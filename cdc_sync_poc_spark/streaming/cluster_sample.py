"""Streaming cluster-balanced sampling — the ingest-time twin of
``llm/similarity.sample_cluster_balanced``: maintain exactly-N vectors
per IVF cell with O(cells × N) state, one micro-batch at a time.

Correctness rides on the same per-stratum bottom-k associativity as
StreamingSampler (streaming/sampling.py), applied per cell: "the N
smallest md5 draws of a cell across the union" equals "the N smallest
of (stored per-cell bottom-N ∪ batch per-cell bottom-N)", so the fold
is exact and overwrite-idempotent under at-least-once replay (a
replayed batch re-unions rows already present; ``distinct`` before the
cut makes the merge a no-op).

The coarse quantizer is FIXED — trained offline and passed in, the
production shape (a quantizer is trained once and stored with the
data; ``_ivf_refined`` builds and memoizes exactly that per corpus).
Retraining per micro-batch would re-assign every past vector and break
stream == batch equivalence; with fixed centroids the stored state
after any prefix of batches equals the batch operator's draw over the
union of those batches (pinned in tests/test_streaming.py).

Scale shape: cell assignment is the same zero-shuffle inlined-centroid
map expression every IVF consumer uses; the only shuffle is the
per-cell bottom-N window over ONE batch (WindowGroupLimit bounds each
partition's sort at N), and the stored state the merge re-ranks is
cells × N rows — constant, whatever the corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.streaming.swapstore import SwapStore


class StreamingClusterSampler:
    """foreachBatch body maintaining the per-cell exactly-N sample
    under ``root``; ``cents_rows`` is the fixed coarse quantizer
    (``_Cent``-shaped rows, e.g. ``_ivf_refined``'s refined list)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        cents_rows: list,
        n: int | None = None,
    ) -> None:
        from cdc_sync_poc_spark.llm.similarity import CB_PER_CELL_N

        if not cents_rows:
            raise ValueError("cents_rows must hold at least one centroid")
        self.spark = spark
        self.cents = cents_rows
        self.n = CB_PER_CELL_N if n is None else n
        if self.n < 1:
            raise ValueError(f"n must be >= 1, got {self.n}")
        self.store = SwapStore(spark, root, "cell_sample")

    def _ranked(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy("cell_id").orderBy("hk", "vec_id")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= self.n)
            .drop("rn")
        )

    def absorb_batch(self, emb: DataFrame, batch_id: int) -> None:
        """Fold one micro-batch of (vec_id, embedding) rows into the
        per-cell sample state."""
        from cdc_sync_poc_spark.llm.similarity import _assign_col

        v = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        nrm = F.sqrt(
            F.expr(
                "aggregate(transform(embedding,"
                " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
                " CAST(0.0 AS DOUBLE), (acc, y) -> acc + y)"
            )
        )
        d = emb.select("vec_id", v.alias("v"), nrm.alias("nrm")).select(
            "vec_id",
            _assign_col(self.cents).alias("cell_id"),
            F.md5(F.col("vec_id").cast("string")).alias("hk"),
        )
        batch_best = self._ranked(d)
        stored = self.store.read()
        merged = (
            batch_best
            if stored is None
            else stored.unionByName(batch_best).distinct()
        )
        self.store.swap(self._ranked(merged))

    def sample(self) -> DataFrame:
        """(vec_id, cell_id, cell_rank) — the batch operator's output
        shape, ranks recomputed over the cells × N stored rows."""
        out = self.store.read()
        if out is None:
            raise FileNotFoundError(
                f"no stored sample under {self.store.cur_dir}"
            )
        w = Window.partitionBy("cell_id").orderBy("hk", "vec_id")
        return out.select(
            "vec_id",
            "cell_id",
            F.row_number().over(w).cast("bigint").alias("cell_rank"),
        )
