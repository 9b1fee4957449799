"""Streaming IVF-Flat index maintenance — the continuous form of the
batch IVF family (llm/similarity.py): embedding micro-batches are
assigned to a FROZEN coarse quantizer with the same constant-folded
map-only expression the batch queries use (_assign_col) and appended to
a cell-partitioned index store. ``emb_index_growth`` is the audit that
decides when a cell re-splits; this module is the ingest that audit
watches.

Layout & idempotence: batch N writes ``index/batch_id=N/cell_id=C/``
with mode=overwrite — the quantizer is frozen and assignment is
deterministic, so a replayed batch recomputes the identical rows and
overwrites its own partition: the at-least-once foreachBatch contract
shared with streaming/packing.py and streaming/writer.py, idempotent by
partition ownership.

Scale shape: the ingest path is ONE map stage per batch (assignment is
pure column math against from_json-folded centroid literals — zero
shuffles, zero driver collects over data). A probe reads ONLY its
N_PROBE_CELLS nearest cells: ``cell_id`` is a physical partition key,
so every other cell's files are pruned at planning time (pinned by the
input_file_name test) — at 100 TB a search touches
N_PROBE_CELLS/N_CELLS of the lake and skips the rest entirely.

The quantizer is stored WITH the index (``quantizer/``, written once at
construction, completion marked by _SUCCESS): a restarted maintainer
reloads it, keeping assignments consistent across process lifetimes.
Retraining per batch would corrupt the cell partitioning — cell
re-splits are an offline maintenance action triggered by
emb_index_growth's ``needs_split`` flag.

``compact()`` bounds both small-file pressure and probe fan-in: it
re-lays accumulated batch partitions into ONE base partitioned by
cell_id (file count O(cells), not O(batches x cells)). Delta
bookkeeping, watermark-inside-the-frame compaction and the crash
analysis all live in the shared AppendDeltaStore
(streaming/delta_store.py) — this module owns only what is
IVF-specific: the frozen quantizer and the probe math.

Reference parity: the reference ships no vector search; this is part of
the M6 training-data surface built on the same public IVF design
(Jégou et al., PAPERS.md) as the batch sim_ivf/* queries.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.llm.similarity import (
    ANN_TOP_K,
    N_LLOYD,
    _assign_col,
    _Cent,
    _FP_SCALE,
    _probe_cells_for,
    normed_frame,
)
from cdc_sync_poc_spark.streaming.delta_store import AppendDeltaStore

_IDX_COLS = ["vec_id", "label", "v", "nrm", "cell_id", "batch_id"]
_IDX_DDL = (
    "vec_id long, label int, v array<double>, nrm double,"
    " cell_id bigint, batch_id long"
)


class StreamingIVFIndex:
    def __init__(self, spark: SparkSession, root: str, cents_rows=None) -> None:
        self.spark = spark
        self._root = root
        self.quant_dir = os.path.join(root, "quantizer")
        self.journal_path = os.path.join(root, "split_journal.json")
        # per-batch partitions sub-partitioned by cell; compact() re-lays
        # them into ONE base with cell_id as the TOP-level partition key,
        # so probe pruning survives folding (shared store recipe)
        self.store = AppendDeltaStore(
            spark,
            root,
            cols=_IDX_COLS,
            ddl=_IDX_DDL,
            delta_partition_by=["cell_id"],
            base_partition_by=["cell_id"],
            deltas_name="index",
        )
        # Heal a crash-interrupted quantizer SWAP before any completeness
        # check (ADVICE r10): _apply_journal replaces the quantizer via
        # SwapStore, and a crash between its two renames leaves NO live
        # quantizer/ dir while quantizer_next is complete. Unrecovered,
        # the _SUCCESS gates below would (a) skip journal healing and
        # make centroids() raise, and (b) with cents_rows provided,
        # OVERWRITE the post-split quantizer with the original seed —
        # recover() rolls the completed swap forward first, so both
        # gates see the true state.
        from cdc_sync_poc_spark.streaming.swapstore import SwapStore

        SwapStore(spark, root, "quantizer").recover()
        # completion = _SUCCESS, not isdir: a crash mid-write leaves a
        # partial dir that must be overwritten, never trusted (the
        # SwapStore lesson applied to the one-time quantizer write)
        if cents_rows is not None and not self._quantizer_complete():
            # one-time k-row write via the JVM literal builder:
            # createDataFrame here was MEASURED at 4-5 s per session
            # (the Python-RDD write path re-spins a Python worker for
            # the job) — the single largest slice of the streamed-IVF
            # warmup attribution (VERDICT r13 #7) — vs ~0.9 s for the
            # array-of-structs literal. mode=overwrite clears any
            # partial leftover from a crashed write.
            from cdc_sync_poc_spark.sources.loader import literal_frame

            literal_frame(
                self.spark,
                [
                    (int(r.cell_id), [float(x) for x in r.cv], float(r.cn))
                    for r in cents_rows
                ],
                "cell_id bigint, cv array<double>, cn double",
            ).coalesce(1).write.mode("overwrite").parquet(self.quant_dir)
        self._cents: list | None = None
        # a restarted maintainer self-heals a crash-interrupted split
        # before anything reads routing state — the SwapStore.read()
        # recover() policy applied to the two-swap split protocol
        if os.path.exists(self.journal_path) and self._quantizer_complete():
            self._apply_journal()

    def _quantizer_complete(self) -> bool:
        return os.path.exists(os.path.join(self.quant_dir, "_SUCCESS"))

    def centroids(self) -> list:
        """The frozen quantizer as driver-local rows (k rows — the same
        bounded collect every batch IVF consumer performs)."""
        if self._cents is None:
            if not self._quantizer_complete():
                raise RuntimeError(
                    "no complete quantizer at "
                    f"{self.quant_dir}: construct StreamingIVFIndex with "
                    "cents_rows once (a partial directory from a crashed "
                    "write is not trusted)"
                )
            self._cents = sorted(
                (
                    _Cent(int(r.cell_id), [float(x) for x in r.cv], float(r.cn))
                    for r in self.spark.read.parquet(self.quant_dir).collect()
                ),
                key=lambda c: c.cell_id,
            )
        return self._cents

    def absorb_batch(self, embs: DataFrame, batch_id: int) -> None:
        """Assign one micro-batch (vec_id, embedding, label) and write
        it under its own batch partition, sub-partitioned by cell."""
        assigned = normed_frame(embs).select(
            "vec_id",
            "label",
            "v",
            "nrm",
            _assign_col(self.centroids()).alias("cell_id"),
        )
        self.store.write_delta(assigned, batch_id)

    @property
    def index_dir(self) -> str:
        return self.store.deltas_dir

    @property
    def base(self):
        return self.store.base

    def index(self) -> DataFrame:
        """Everything ingested so far: compacted base + per-batch
        partitions newer than the base watermark. Rows are append-only
        (a vector never changes its cell under a frozen quantizer), so
        folded-then-replayed batch partitions are excluded by the
        watermark, never double-read — the shared AppendDeltaStore
        read path."""
        return self.store.rows_or_empty()

    def compact(self, upto_batch_id: int) -> None:
        """Re-layout: fold batch partitions with batch_id <=
        ``upto_batch_id`` (plus the existing base) into ONE base
        partitioned by cell_id — the 'at rest the cell becomes the
        partition key' layout the batch IVF queries assume, which both
        bounds the small-file count (O(cells), not O(batches x cells))
        and turns every probe's cell filter into top-level directory
        pruning. Crash windows: streaming/delta_store.py."""
        self.store.compact(upto_batch_id)

    # -- cell split: the offline maintenance action emb_index_growth's
    # -- needs_split flag triggers (docstring contract, implemented r10)

    def _sub_centroids(self, members: DataFrame, new_ids: list[int]) -> list:
        """Deterministic sub-quantizer over ONE cell's members: the
        n_sub lowest vec_ids seed, N_LLOYD exact Lloyd rounds refine —
        the corpus quantizer's own recipe (_ivf_refined) scoped to the
        cell. All distributed passes are map+agg over the members; the
        collects are n_sub seeds + n_sub x EMB_DIM fixed-point sums per
        round. A sub that empties in a round keeps its previous
        centroid (cannot happen for n_sub=2 on distinct vectors, but
        must not crash when it does)."""
        seeds = (
            members.orderBy("vec_id").limit(len(new_ids))
            .select("v", "nrm").collect()
        )
        if len(seeds) < len(new_ids):
            raise ValueError(
                f"cell has only {len(seeds)} members; cannot split into "
                f"{len(new_ids)}"
            )
        cents = [
            _Cent(new_ids[i], [float(x) for x in r.v], float(r.nrm))
            for i, r in enumerate(seeds)
        ]
        for _ in range(N_LLOYD):
            assigned = members.select(_assign_col(cents).alias("cell_id"), "v")
            fp = assigned.select(
                "cell_id",
                F.expr(
                    f"transform(v, x -> CAST(floor(x * {_FP_SCALE!r}D) AS BIGINT))"
                ).alias("fp"),
            )
            sums_rows = (
                fp.select("cell_id", F.posexplode("fp").alias("i", "s"))
                .groupBy("cell_id", "i")
                .agg(F.sum("s").alias("s"), F.count("*").alias("cnt"))
                .collect()
            )
            by_cell: dict[int, dict[int, tuple[int, int]]] = {}
            for r in sums_rows:
                by_cell.setdefault(int(r.cell_id), {})[int(r.i)] = (
                    int(r.s), int(r.cnt),
                )
            nxt = []
            for c in cents:
                dims = by_cell.get(int(c.cell_id))
                if not dims:
                    nxt.append(c)  # emptied sub keeps its centroid
                    continue
                # dimension from the centroid itself, not the batch
                # fixture's EMB_DIM — the streaming index is
                # dimension-agnostic (any frozen quantizer works)
                cv = [
                    dims[i][0] / (_FP_SCALE * dims[i][1])
                    for i in range(len(c.cv))
                ]
                acc = 0.0
                for x in cv:
                    acc = acc + x * x
                nxt.append(_Cent(int(c.cell_id), cv, math.sqrt(acc)))
            cents = nxt
        return cents

    def split_cell(
        self, cell_id: int, n_sub: int = 2, on_decision=None
    ) -> list[int]:
        """Split an overgrown cell into ``n_sub`` sub-cells — the
        re-layout that keeps probe selectivity ~N_PROBE_CELLS/N_CELLS
        as the corpus grows (emb_index_growth's ``needs_split`` is the
        trigger; this is the action).

        Protocol (journal-first, the scd2 marker idiom — every step
        idempotent, any crash healed by heal_splits() / a re-run):

        1. compact() everything, so the cell's rows live in ONE base;
        2. derive the sub-quantizer deterministically from the cell's
           members (first sub KEEPS ``cell_id``; the rest take fresh
           ids above the current max);
        3. write the split journal atomically (tmp + rename) — the
           journal records the DECISION (ids + centroid floats), so
           recovery never needs the pre-split state back;
        4. swap the quantizer (old cells minus the split cell's old
           entry, plus the subs) through SwapStore;
        5. swap the base with the split cell's rows re-assigned among
           the subs (other cells' rows byte-identical, the watermark
           column carried through);
        6. remove the journal.

        A crash between 4 and 5 leaves fresh-sub probes finding
        nothing (recall degraded, results still true cosines) until
        heal_splits() replays 4-6 from the journal; replaying after 5
        re-assigns sub rows onto themselves (deterministic argmax) —
        a no-op. Returns the sub-cell ids.

        ``on_decision`` (optional) is invoked with the final sub-cell
        id list after every validation passes but BEFORE this index
        journals or mutates anything — the hook a co-maintainer uses
        to persist its own repair intent (e.g. StreamingSemDedup's
        re-derive journal) without duplicating the id-allocation rule
        or racing the crash window between the two journals; an
        exception from the hook aborts the split with the index
        untouched."""
        cents = self.centroids()
        by_id = {int(c.cell_id): c for c in cents}
        if int(cell_id) not in by_id:
            raise ValueError(f"unknown cell_id {cell_id}")
        if n_sub < 2:
            raise ValueError(f"n_sub must be >= 2, got {n_sub}")
        if os.path.exists(self.journal_path):
            raise RuntimeError(
                "unfinished split journal present — run heal_splits() first"
            )
        # 1. fold every delta so the membership is one base
        if os.path.isdir(self.store.deltas_dir):
            bids = [
                int(d.split("=", 1)[1])
                for d in os.listdir(self.store.deltas_dir)
                if d.startswith("batch_id=")
            ]
            if bids:
                self.store.compact(max(bids))
        base = self.store.base.read()
        if base is None:
            raise ValueError("empty index; nothing to split")
        members = base.filter(F.col("cell_id") == int(cell_id)).select(
            "vec_id", "v", "nrm"
        )
        new_ids = [int(cell_id)] + [
            max(by_id) + 1 + i for i in range(n_sub - 1)
        ]
        subs = self._sub_centroids(members, new_ids)
        if on_decision is not None:
            on_decision(list(new_ids))
        # 3. journal = the decision record
        tmp = self.journal_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "cell_id": int(cell_id),
                    "subs": [
                        {"cell_id": int(c.cell_id), "cv": c.cv, "cn": c.cn}
                        for c in subs
                    ],
                },
                fh,
            )
        os.replace(tmp, self.journal_path)
        self._apply_journal()
        return new_ids

    def heal_splits(self) -> bool:
        """Finish a crash-interrupted split (True if one was healed).
        Idempotent: replays quantizer + base swaps from the journal."""
        if not os.path.exists(self.journal_path):
            return False
        self._apply_journal()
        return True

    def _apply_journal(self) -> None:
        from cdc_sync_poc_spark.streaming.swapstore import SwapStore

        with open(self.journal_path) as fh:
            j = json.load(fh)
        cell_id = int(j["cell_id"])
        subs = [
            _Cent(int(s["cell_id"]), [float(x) for x in s["cv"]],
                  float(s["cn"]))
            for s in j["subs"]
        ]
        sub_ids = {int(c.cell_id) for c in subs}
        # 4. quantizer swap (atomic via the SwapStore protocol; the
        # _SUCCESS marker lands at the root as before)
        kept = [
            c for c in self.centroids()
            if int(c.cell_id) != cell_id and int(c.cell_id) not in sub_ids
        ]
        qrows = [
            (int(c.cell_id), [float(x) for x in c.cv], float(c.cn))
            for c in kept + subs
        ]
        from cdc_sync_poc_spark.sources.loader import literal_frame

        qstore = SwapStore(self.spark, self._root, "quantizer")
        qstore.swap(
            literal_frame(
                self.spark, qrows, "cell_id bigint, cv array<double>, cn double"
            ).coalesce(1)
        )
        self._cents = None  # re-read on next use
        # 5. base swap: rows of the split family re-assigned among the
        # subs (idempotent — sub rows re-assign onto themselves), every
        # other cell untouched, watermark column carried through
        base = self.store.base.read()
        if base is not None:
            fam = F.col("cell_id").isin([cell_id, *sub_ids])
            relaid = base.withColumn(
                "cell_id",
                F.when(fam, _assign_col(subs)).otherwise(F.col("cell_id")),
            )
            self.store.base.swap(relaid, partition_by=["cell_id"])
        # 6. the journal is the last thing to go
        os.remove(self.journal_path)

    def balance(self) -> DataFrame:
        """One-row occupancy-balance audit over the stored index — the
        live twin of the batch ``emb_ivf_cell_balance`` query (the
        dashboard scalar that decides when ``split_cell`` runs): used
        cells, min/max occupancy, imbalance = max·k/total and the
        coefficient of variation from the exact BIGINT identity
        k·Σn² − (Σn)². One keyed agg over the store read + a 1-row
        reduce; same arithmetic as the batch oracle."""
        per = (
            self.index()
            .groupBy("cell_id")
            .agg(F.count("*").alias("nv"))
        )
        k = F.count("*").cast("bigint")
        tot = F.sum("nv").cast("bigint")
        sumsq = F.sum(F.col("nv") * F.col("nv")).cast("bigint")
        return per.agg(
            k.alias("n_cells_used"),
            tot.alias("n_vecs"),
            F.min("nv").cast("bigint").alias("min_cell"),
            F.max("nv").cast("bigint").alias("max_cell"),
            F.round(
                (F.max("nv").cast("bigint") * k).cast("double") / tot, 6
            ).alias("imbalance"),
            F.round(
                F.sqrt((k * sumsq - tot * tot).cast("double")) / tot, 6
            ).alias("cv"),
        )

    def search(self, qv, k: int = ANN_TOP_K) -> DataFrame:
        """Top-k cosine neighbors of ``qv`` from the stored index: probe
        cells ranked on the driver against the k centroid rows, then ONE
        pruned scan -> map-side cosine -> TakeOrderedAndProject — the
        stored-index twin of sim_ivf_topk's in-flight probe."""
        qv = [float(x) for x in qv]
        acc = 0.0
        for x in qv:
            acc = acc + x * x
        qn = math.sqrt(acc)
        probe = _probe_cells_for(qv, qn, self.centroids())
        qarr = "array(" + ",".join(f"{x!r}D" for x in qv) + ")"
        cos = F.expr(
            f"aggregate(zip_with(v, {qarr}, (x, y) -> x * y),"
            " CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
        ) / (F.col("nrm") * F.lit(qn))
        return (
            self.index()
            .filter(F.col("cell_id").isin(probe))
            .withColumn("cosr", cos)
            .orderBy(F.desc("cosr"), F.asc("vec_id"))
            .limit(k)
            .select(
                "vec_id", "cell_id", F.round(F.col("cosr"), 6).alias("cosine")
            )
        )


EMB_STREAM_SCHEMA = "vec_id long, embedding array<float>, label int"


def emb_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of embedding rows: each new parquet file in
    ``path`` is a micro-batch of freshly embedded vectors."""
    return (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def run_streaming_ann_index(
    spark: SparkSession, in_dir: str, root: str, checkpoint: str, cents_rows
):
    """Wire the embedding file-stream through the index maintainer."""
    idx = StreamingIVFIndex(spark, root, cents_rows)
    return (
        emb_stream(spark, in_dir)
        .writeStream.foreachBatch(idx.absorb_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
