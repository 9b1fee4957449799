#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints the
result as JSON: first the full detail line {"metric": ..., "queries":
{name: sec, ...}, ..., "value": total_sec}, then a short summary-only
line with the same scalars LAST on stdout — the driver's tail capture
always keeps the final ~200-byte line intact even when the multi-KB
detail line is truncated (VERDICT r4 minor #4).

Noise control (round 3, after r2's round-over-round comparison was
corrupted by ordering and n=1 variance):

* the query order below is FIXED — append new queries at the end, never
  reorder, so per-query numbers stay comparable across rounds;
* the whole suite runs as ``N_REPS`` interleaved passes and each query
  reports its MIN across passes (contention bursts on this host span
  tens of seconds, so consecutive same-query reps all land inside one;
  interleaving + min is robust to one-sided timing noise);
* session-shared caches (the loop-guard persisted result, the
  shingle/signature views shared by the dedup family) are built in a
  NAMED warmup phase with per-builder timings under ``"warmup"``, so
  their materialization cost is attributed deterministically instead
  of to whichever consumer happens to run first. ``"value"`` is the
  steady-state total (sum of per-query medians on warm caches);
  ``"warmup_total"`` is the one-time cache build cost.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cdc_sync_poc_spark import get_spark
from cdc_sync_poc_spark.registry import QUERIES, load_all_queries

# FIXED order — append-only (see module docstring).
BENCH_QUERIES = [
    "bench_q1_pricing",
    "bench_q3_shipping",
    "bench_q5_local_supplier",
    "bench_q18_large_orders",
    "st01_loop_dedup",
    "pipeline_e2e",
    "ap01_merge_cdc",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_topk_bruteforce",
    "sim_ann_lsh",
    "sim_ann_topk_all",
    "sim_ivf_topk",
    "text_quality",
    "plan_mapping_roundtrip",
    "mm_decode_features",
    # round-3 additions (append-only)
    "bench_q6_forecast",
    "bench_q4_priority",
    "bench_q10_returned",
    "bench_q12_latemix",
    "corpus_contamination",
    "dedup_span_exact",
    "text_oov_ratio",
    "bench_q7_volume",
    "bench_q13_custdist",
    "bench_q14_promo",
    "bench_q15_top_supplier",
    "bench_q17_small_qty",
    "bench_q19_disjunctive",
    "bench_q22_idle_balance",
    "events_window_agg",
    "events_funnel",
    "events_retention",
    "text_lexical_concentration",
    "ann_recall_lsh",
    "bench_q2_mincost",
    "bench_q8_mktshare",
    "bench_q9_profit",
    "bench_q11_important",
    "bench_q16_suppcnt",
    "bench_q20_dominant",
    "bench_q21_waiting",
    # round-3 preprocess family (append-only)
    "pii_redact",
    "doc_chunking",
    "seq_packing",
    "text_rarity_score",
    "emb_label_centroids",
    "dup_ngram_fraction",
    "events_rolling_stats",
    "events_concurrency",
    "text_cooccur_lift",
    # round-4 additions (append-only)
    "ann_recall_ivf",
    "j04_target_exists",
    "dedup_segment_boilerplate",
    "text_gini_concentration",
    "emb_pq_error",
    "sim_ivfpq_topk",
    "ann_recall_ivfpq",
    "mm_resize",
    "events_anomaly_zscore",
    "dedup_corpus_keep",
    "ap07_scd2_history",
    "text_lm_score",
    "text_bm25_rank",
    "dsir_importance",
    "events_markov_transitions",
    "sem_dedup",
    "corpus_filter_funnel",
    "llm_curation_e2e",
    "dedup_incremental",
    "events_path_topk",
    "corpus_divergence_chi2",
    "dedup_recall_minhash",
    "events_attribution",
    # round-4 session additions (append-only)
    "text_classifier_score",
    "events_kmv_distinct",
    "events_session_window",
    "dedup_prefix_containment",
    "ann_recall_truncated",
    "src_schema_drift",
    "events_ab_ttest",
    "ap08_net_effect_compaction",
    "events_user_overlap",
    "corpus_simpson_diversity",
    "text_winnowing_overlap",
    "text_cms_error",
    "events_lateness_profile",
    "events_cohort_ltv",
    "events_value_histogram",
    "emb_dim_stats",
    "mm_integrity_check",
    "a12_incremental_rollup",
    "events_active_users",
    "dedup_rate_by_source",
    "retrieval_rrf_fusion",
    "dsir_resample",
    "corpus_token_budget",
    "ap09_reconciliation",
    "dedup_winnowing_pairs",
    "source_csv_docs",
    "dedup_precision_minhash",
    "events_rfm_segments",
    "dedup_cluster_stats",
    "sample_fixed_n",
    "emb_centroid_shift",
    "text_hapax_ratio",
    "events_interarrival_stats",
    "corpus_vocab_growth",
    "events_seasonality",
    "slice_length_quantiles",
    # round-5 additions (append-only)
    "emb_pq_residual_error",
    "emb_covariance_topk",
    "corpus_shard_manifest",
    "events_decayed_engagement",
    "slice_length_mad",
    "st08_quarantine_replay",
    "ap10_pit_lookup",
    "clf_calibration_by_length",
    "mm_dedup_phash",
    "text_gopher_rules",
    "dedup_line_global",
    "maint_zorder_layout",
    "j09_bloom_prefilter_join",
    "bpe_merge_steps",
    "bpe_tokenize_count",
    "bpe_fertility_by_lang",
    "emb_index_growth",
    "sim_ivfpq_residual_topk",
    "a13_cube_report",
    "gopher_rate_by_source",
    "events_view_click_pairs",
    "dq_constraint_report",
    "dq_profile_table",
    "maint_partition_stats",
    "retrieval_hard_negatives",
    # round-7 additions (append-only)
    "events_hll_distinct",
    "sample_systematic_pps",
    "events_pagerank",
    "graph_pagerank_dist",
    "sample_fixed_n_by_lang",
    "dedup_ppjoin_exact",
    "dedup_recall_corpuswide",
    # round-9 additions (append-only)
    "graph_pagerank_mass",
    "sample_cluster_balanced",
    "emb_proto_prune",
    "pack_padding_waste",
    "train_order_shuffle",
    # round-10 additions (append-only)
    "text_ngram_novelty",
    "dedup_minhash_estimate",
    "corpus_dedup_rate_by_source",
    "emb_hard_negatives",
    "dedup_lsh_curve",
    # round-11 additions (append-only)
    "corpus_zipf_coverage",
    "text_char_diversity",
    "dedup_threshold_curve",
    "emb_ivf_cell_balance",
    # round-12 additions (append-only)
    "dedup_span_intervals",
    "corpus_decontam_incremental",
    "ann_recall_ivf_stream",
    # round-13 additions (append-only)
    "sem_dedup_incremental",
    "emb_ivf_resplit",
    "corpus_contamination_by_source",
    # round-14 additions (append-only)
    "sim_rerank_exact_topk",
    "emb_proto_prune_stream",
    "dedup_minhash_cluster_incremental",
]

# Bench-coverage ledger (VERDICT r6 #6): every registered query is
# either a headline timing in BENCH_QUERIES or recorded here with the
# reason it is not. Exclusion != untested — ALL queries run the exact
# DuckDB gate every session; exclusion only means the query's timing
# would measure job-launch overhead or duplicate an already-benched
# lineage, adding noise rather than signal. One greppable reason per
# query; completeness + disjointness enforced by
# tests/test_bench_contract.py::test_bench_ledger_covers_registry.
_EXCLUDE_GROUPS: dict[str, list[str]] = {
    "sub-second single-stage op on the small CDC feed; timing measures"
    " job launch, not the operator (scan cost owned by the benched"
    " bench_q* scans)": [
        "a01_global_counters", "a02_group_by_topic", "a03_group_by_status",
        "a04_max_last_ts", "a05_next_id", "a06_min_max_filtered",
        "a07_count_union", "a08_exists_count", "a09_percentiles",
        "a10_pivot_report", "a11_rollup_report",
        "ap02_ins_to_upd", "ap03_notfound_log", "ap04_delete_idempotent",
        "ap05_exactly_once_mark", "ap06_sequential_replay",
        "cf01_lww", "cf02_sys_priority", "cf03_field_merge",
        "cf04_upd_vs_del", "cf05_policy_lookup", "cf06_pk_split",
        "j01_broadcast_lookup", "j02_merge_upsert_join",
        "j03_antijoin_seen", "j05_conflict_fullouter", "j06_asof_join",
        "j07_range_join_bucketed", "j08_salted_skew_join",
        "r01_filter_pending", "r02_project_rename", "r03_case_flag",
        "r04_codemap_join", "r05_cast_date_ts", "r06_epoch_decode",
        "r07_decimal_decode", "r08_default_coalesce", "r09_sha256_hash",
        "r10_op_decode", "r11_pick_before_after", "r12_string_funcs",
        "r13_ts_convert", "r14_to_json_preview", "r15_variant_extract",
        "s01_order_by_seq", "s02_topn_desc", "s03_ring_buffer",
        "s04_union_merge_sort", "s05_first_nonpk",
        "sink_audit_log", "sink_cdc_append", "sink_target_apply",
        "src_debezium_parse", "src_jdbc_lookup", "src_jdbc_snapshot",
        "src_kafka_cdc", "src_point_lookup",
        "st02_state_upsert", "st03_state_ttl", "st04_microbatch_trigger",
        "st05_late_and_order", "st06_quarantine", "st07_backpressure_cfg",
    ],
    "meter/variant twin of a benched headline query over the same"
    " lineage; its timing would double-count the benched plan": [
        "text_classifier_confusion",  # text_classifier_score
        "events_kmv_union",  # events_kmv_distinct
        "events_hll_union",  # events_hll_distinct
        "events_sessionize",  # events_session_window
        "corpus_funnel_counts",  # corpus_filter_funnel
        "plan_mapping_compile",  # plan_mapping_roundtrip
        "dedup_minhash_cluster",  # dedup_corpus_keep (shared cache)
        "dedup_normalized",  # dedup_exact
        "text_langid_eval",  # text_quality scan family
        "text_langid", "text_tokens", "text_fingerprint",
        "text_repetition_filter",  # text_quality scan family
        "text_tfidf_top_term", "text_top_terms",  # text_rarity_score
        "emb_quantize_error",  # emb_pq_error
        "emb_norm_stats",  # emb_dim_stats
        "doc_length_quantiles",  # slice_length_quantiles
        "sample_stratified",  # sample_fixed_n
        "corpus_mix_weights", "corpus_train_split",  # corpus_token_budget
        "source_jsonl_docs", "source_orc_docs",  # source_csv_docs
    ],
    "stub-backed multimodal plumbing (no real decode in this container);"
    " mm_decode_features/mm_resize own the family timing": [
        "mm_attach_meta", "mm_frame_sample",
    ],
}
BENCH_EXCLUDED: dict[str, str] = {
    q: reason for reason, qs in _EXCLUDE_GROUPS.items() for q in qs
}
# a query id listed in two exclusion groups (or twice in one) would
# collapse silently in the dict flatten — fail at import instead
# (ADVICE r7)
assert len(BENCH_EXCLUDED) == sum(len(qs) for qs in _EXCLUDE_GROUPS.values()), (
    "duplicate query id in _EXCLUDE_GROUPS"
)

N_REPS = 3

# Byte budget for the FINAL summary JSON line: the driver's capture
# keeps the last ~2000 chars of stdout, and the final line must parse
# whole from that tail (see summarize()).
_SUMMARY_LINE_BUDGET = 1900

# Scale-probe (VERDICT r6 #3): measure — don't design-argue — how the
# most expensive headline queries scale with data size. The top
# SCALE_PROBE_TOP_K queries by main-pass time are re-run at every
# smaller sibling sf dir (sf0.001, sf0.01 next to the main sf0.1) and
# the per-query scaling exponent is fit over the largest decade:
# exponent = log(t_hi/t_lo) / log(sf_hi/sf_lo). Linear scaling → ~1.0;
# anything clearly above ~1.3 on the top decade is a super-linear
# red flag to fix. Small-sf times include a fixed per-query job-setup
# overhead (~0.1-0.5 s) that BIASES exponents DOWNWARD — i.e. the
# probe is conservative about declaring things linear-or-better only
# when the absolute times are large enough to dominate the overhead,
# which the top-K-by-cost selection guarantees at the top decade.
# Probe runs are warm (each query runs twice per probe sf; the second
# run is timed) so one-time cache builds don't masquerade as data cost,
# matching the steady-state semantics of the headline numbers. Every
# fitted point — including the main sf — uses the same warm min-of-2
# single-query procedure (ADVICE r7: the headline min-of-interleaved-
# passes number lives in a different contention regime, so it is NOT
# reused as the top point; the emitted "methodology" field records
# this).
SCALE_PROBE_TOP_K = 10


def _probe_sf_dirs(sf_dir: str, sf: float) -> list[tuple[float, str]]:
    """Sibling sf dirs smaller than the main one, ascending."""
    parent = os.path.dirname(os.path.abspath(sf_dir.rstrip("/")))
    out: list[tuple[float, str]] = []
    try:
        entries = os.listdir(parent)
    except OSError:
        return out
    for d in entries:
        if not d.startswith("sf"):
            continue
        try:
            v = float(d[2:])
        except ValueError:
            continue
        if v < sf and os.path.isdir(os.path.join(parent, d)):
            out.append((v, os.path.join(parent, d)))
    return sorted(out)


def scale_probe(
    spark, sf_dir: str, sf: float, timings: dict[str, float]
) -> dict[str, dict]:
    """{name: {"t": {sf: sec}, "exponent": e}} for the top-K queries."""
    load_all_queries()  # idempotent; direct callers need not pre-load
    top = sorted(timings, key=timings.get, reverse=True)[:SCALE_PROBE_TOP_K]
    # ONE methodology for every fitted point (ADVICE r7): the main sf
    # is re-timed with the same warm min-of-2 single-query procedure as
    # the sibling points, instead of reusing the min-of-interleaved-
    # passes headline number (different cache/contention regime). The
    # main pass already warmed the main-sf caches, so no extra warm run.
    points = _probe_sf_dirs(sf_dir, sf) + [(sf, sf_dir)]
    scaling: dict[str, dict] = {}
    for name in top:
        pts: dict[float, float | None] = {}
        for v, d in points:
            try:
                if v != sf:
                    QUERIES[name](spark, d).count()  # warm: cache builds
                best = None
                for _ in range(2):  # min-of-2: one contention burst
                    # cannot inflate the point (same rationale as the
                    # main pass's min-of-interleaved-passes)
                    t0 = time.perf_counter()
                    QUERIES[name](spark, d).count()  # steady-state
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                pts[v] = round(best, 3)
            except Exception as ex:  # noqa: BLE001 — a probe failure
                # must not void the bench; it surfaces as t=null
                pts[v] = None
                print(f"# scale-probe ERROR {name}@sf{v}: "
                      f"{str(ex)[:120]}", file=sys.stderr)
        # `is not None`, not truthiness: a sub-millisecond probe rounds
        # to 0.0 and is a real data point (the lo_t/hi_t > 0 guard
        # below handles the log), only an ERRORED probe is excluded
        valid = sorted((s, t) for s, t in pts.items() if t is not None)
        exponent = None
        if len(valid) >= 2:
            (lo_sf, lo_t), (hi_sf, hi_t) = valid[-2], valid[-1]
            if lo_t > 0 and hi_t > 0:
                exponent = round(
                    math.log(hi_t / lo_t) / math.log(hi_sf / lo_sf), 3
                )
        scaling[name] = {
            "t": {str(s): t for s, t in sorted(pts.items())},
            "exponent": exponent,
            "methodology": "warm_min_of_2_all_points",
        }
        print(f"# scale-probe {name}: {scaling[name]}", file=sys.stderr)
    return scaling

# Queries whose first execution materializes the session-shared caches:
# st01 builds the loop-guard persisted result (also consumed by
# pipeline_e2e), ngram/minhash build the shared shingle + signature
# views. Run once here -> the named warmup entry owns the build cost.
CACHE_WARMERS = [
    "st01_loop_dedup",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    # first IVF call trains the coarse quantizer (driver-memoized,
    # shared by sim_ivf/sim_ivfpq/ann_recall_{ivf,ivfpq})
    "sim_ivf_topk",
    # first cluster call runs the label-propagation loop (memoized,
    # shared by dedup_minhash_cluster / dedup_corpus_keep)
    "dedup_corpus_keep",
    # first e2e call materializes the persisted survivor frame (the
    # funnel+dedup+sample checkpoint consumed twice by the packer)
    "llm_curation_e2e",
    # first DSIR call caches the doc-score accumulator frame shared by
    # dsir_importance / dsir_resample
    "dsir_importance",
    # first winnowing call materializes the cached (doc_id, fp)
    # fingerprint index shared by text_winnowing_overlap /
    # dedup_winnowing_pairs
    "text_winnowing_overlap",
    # first CMS call materializes the cached counter table (the sketch
    # itself) reused by every later probe/pass
    "text_cms_error",
    # first BPE call materializes the persisted vocab + per-step winner
    # frames shared by bpe_merge_steps / bpe_tokenize_count
    "bpe_merge_steps",
    # first PPJoin call materializes the persisted exact pair frame —
    # dedup_recall_corpuswide reads it as ground truth instead of
    # re-running the prefix join + verify
    "dedup_ppjoin_exact",
    # first streamed-IVF call drives the foreachBatch maintainer
    # (3 ingest batches + compaction under a scratch root) and
    # localCheckpoints the index state — ~12 s of one-time ingest that
    # belongs in the attribution phase, not a headline pass
    "ann_recall_ivf_stream",
    # first streamed-proto-prune call drives its score-at-ingest
    # maintainer (same 3-batch split, lighter store: 3 scalars/vector)
    "emb_proto_prune_stream",
]


def _cpu_canary() -> float | None:
    """~1 s of fixed single-thread integer work; see _host_contention."""
    try:
        t0 = time.perf_counter()
        s = 0
        for i in range(10_000_000):
            s += i
        return round(time.perf_counter() - t0, 3)
    except Exception:  # noqa: BLE001 — marker must not void the bench
        return None


def _host_contention() -> dict:
    """Machine-readable contention marker captured at run start
    (VERDICT r13 #6): r12 and r13 both produced driver captures whose
    headline needed after-the-fact archaeology to separate environment
    contention from regression. 1-minute loadavg plus a count of
    FOREIGN Spark JVMs (``org.apache.spark`` in /proc cmdlines —
    excluding this process's own children, so a bench that owns its
    session counts 0 on an idle host; a caller-provided session adds
    its own JVM) lets a reader classify a slow capture from the JSON
    alone. Never raises — a marker must not void the bench."""
    out: dict = {}
    try:
        out["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except Exception:  # noqa: BLE001 — marker must not void the bench
        out["loadavg_1m"] = None
    # single-thread CPU canary: a fixed integer loop whose wall time
    # exposes HOST slowdown directly (frequency scaling, noisy
    # neighbors outside this VM) — r14 measured a run whose start
    # loadavg was 0.06 yet came out ~1.5x slow across unrelated
    # queries; the canary on the same host read ~1.5s degraded vs
    # ~1.0s calm, the signal loadavg and steal time both missed
    out["cpu_canary_s"] = _cpu_canary()
    try:
        me = os.getpid()
        n = 0
        for d in os.listdir("/proc"):
            if not d.isdigit() or int(d) == me:
                continue
            try:
                with open(f"/proc/{d}/cmdline", "rb") as fh:
                    cmd = fh.read()
                with open(f"/proc/{d}/stat") as fh:
                    # "pid (comm) state ppid ..." — comm may hold
                    # spaces/parens; a process exiting between open and
                    # read can also yield an EMPTY read, so the parse
                    # (IndexError/ValueError) is guarded per process
                    ppid = int(fh.read().split(")")[-1].split()[1])
            except Exception:  # noqa: BLE001 — racy /proc entry
                continue
            if b"org.apache.spark" in cmd and ppid != me:
                n += 1
        out["foreign_spark_jvms"] = n
    except Exception:  # noqa: BLE001 — marker must not void the bench
        out["foreign_spark_jvms"] = None
    return out


def run(
    spark=None,
    sf_dir: str | None = None,
    names: list[str] | None = None,
    reps: int = N_REPS,
) -> dict:
    """Run the bench and return the result dict (separated from main()
    so tests can drive it with a shared session)."""
    contention = _host_contention()
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    load_all_queries()
    owns_session = spark is None
    if owns_session:
        spark = get_spark("cdc-sync-poc-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup: JVM + codegen + parquet footer caches. The named
    # warmup phase below exists to attribute CACHE-BUILD cost, so the
    # session-wide first-touch costs that would otherwise land on
    # whichever warmer runs first are paid here instead: the lineitem
    # scan path (bench_q1), the documents scan (every dedup/text
    # warmer's input), and one 2-row Arrow applyInPandas round trip
    # (Python-worker + Arrow codepath spin-up, ~2-3 s once per
    # session, otherwise billed to st01's builder).
    from pyspark.sql import functions as F

    from cdc_sync_poc_spark.sources.loader import load_table

    QUERIES["bench_q1_pricing"](spark, sf_dir).collect()
    load_table(spark, sf_dir, "documents").count()
    spark.range(2).withColumn("g", F.col("id") % 2).groupBy("g").applyInPandas(
        lambda p: p, schema="id bigint, g bigint"
    ).count()

    timings: dict[str, float] = {}
    warmup: dict[str, float] = {}
    warm_errors: dict[str, str] = {}
    if names is None:
        # extend the untimed JVM/codegen prewarm to the cache-builder
        # plans (r15, VERDICT r14 #6): each warmer runs once at the
        # SMALLEST sibling sf dir first, so whole-stage-codegen
        # compilation of the dedup/minhash/winnowing pipelines — a
        # per-session JVM cost, not a cache-build cost — is paid here
        # like the scan/Arrow spin-up above, and the TIMED warmup below
        # measures the sf-proportional cache build it is meant to
        # attribute. Caches built at the probe sf are keyed separately
        # and tiny; failures fall through to the timed loop's own
        # error handling.
        probe_dirs = _probe_sf_dirs(sf_dir, sf)
        if probe_dirs:
            _, smallest = probe_dirs[0]
            for w in CACHE_WARMERS:
                try:
                    QUERIES[w](spark, smallest).count()
                except Exception:  # noqa: BLE001 — prewarm must not
                    # void the bench; the timed loop reports the error
                    pass
        # cold cost of each cache-building query, individually timed:
        # this is where e.g. the loop-guard materialization shows up
        for w in CACHE_WARMERS:
            t0 = time.perf_counter()
            try:
                QUERIES[w](spark, sf_dir).count()
            except Exception as ex:  # noqa: BLE001 — same contract as the
                # timed loop: a broken warmer must not void the bench
                warm_errors[w] = str(ex)[:200]
                print(f"# ERROR warmup {w}: {warm_errors[w]}", file=sys.stderr)
                continue
            warmup[w] = round(time.perf_counter() - t0, 3)
            print(f"# warmup {w}: {warmup[w]:.3f}s", file=sys.stderr)

    # Interleaved passes: run the whole fixed-order suite `reps` times
    # and keep each query's MIN across passes. Back-to-back reps proved
    # fragile on this host — a 30-60 s contention burst can span all
    # consecutive reps of one query (bench_q5 measured 1.1 s in one run
    # and a 14.9 s median-of-3 in the next with identical code).
    # Spreading a query's reps across full passes means a burst must
    # last the entire bench to poison its min, and min-of-k is the
    # standard noise-robust estimator for one-sided timing noise
    # (contention only ever adds time).
    run_list = names or BENCH_QUERIES
    medians: dict[str, float] = {}
    errors: dict[str, str] = {}
    samples: dict[str, list[float]] = {name: [] for name in run_list}
    for p in range(reps):
        for name in run_list:
            if name in errors:
                continue
            t0 = time.perf_counter()
            try:
                QUERIES[name](spark, sf_dir).count()
            except Exception as ex:  # noqa: BLE001 — one broken query
                # must not void the other ~100 queries' numbers; the
                # error surfaces in the JSON so it cannot pass silently
                errors[name] = str(ex)[:200]
                # a late failure voids the query's earlier samples too:
                # a half-measured query must not leak into the headline
                samples[name] = []
                print(f"# ERROR {name}: {errors[name]}", file=sys.stderr)
                continue
            samples[name].append(time.perf_counter() - t0)
        print(
            f"# pass {p + 1}/{reps}: "
            f"{round(sum(s[-1] for s in samples.values() if s), 3)}s",
            file=sys.stderr,
        )
    for name in run_list:
        if not samples[name]:
            continue
        timings[name] = round(min(samples[name]), 3)
        medians[name] = round(statistics.median(samples[name]), 3)
        shown = [round(s, 3) for s in samples[name]]
        print(
            f"# {name}: min {timings[name]:.3f}s / median "
            f"{medians[name]:.3f}s of {shown}",
            file=sys.stderr,
        )

    # value = steady-state total (sum of per-query min-of-passes on warm
    # shared caches); the one-time cache build cost is reported
    # separately per builder under "warmup" so it is visible but not
    # multiply-counted across the queries that share it
    # key order matters downstream: per-query detail maps FIRST, the
    # small scalars LAST, so a tail-truncated capture of the detail
    # line still shows the headline numbers (VERDICT r4 minor #4)
    # scale-probe the most expensive queries at the smaller sibling sf
    # dirs (skipped for custom `names` runs and via
    # SPARK_GRAFT_SCALE_PROBE=0)
    scaling: dict[str, dict] = {}
    if names is None and os.environ.get("SPARK_GRAFT_SCALE_PROBE", "1") != "0":
        scaling = scale_probe(spark, sf_dir, sf, timings)

    # candidate-set telemetry for the similarity-join family (VERDICT
    # r7 #4): time is NOT the leading scale risk for LSH/PPJoin —
    # candidate growth is; counted once per bench run, detail-line
    # placement (before the scalars, which the driver tail keeps)
    dedup_telemetry: dict[str, dict] = {}
    if names is None and os.environ.get("SPARK_GRAFT_TELEMETRY", "1") != "0":
        try:
            # import INSIDE the guard: an ImportError in llm.dedup must
            # not void the already-collected timings (ADVICE r8)
            from cdc_sync_poc_spark.llm.dedup import dedup_candidate_telemetry

            dedup_telemetry = dedup_candidate_telemetry(spark, sf_dir)
            # candidate-GROWTH probe (VERDICT r8 #4): the time probe
            # fits 3 sf points, but candidate counts were measured at
            # one — and candidate growth, not time, is the leading
            # 100 TB risk for the LSH/PPJoin family. Count at the
            # sibling sf dirs too and fit the same two-top-points
            # log-log exponent the time probe uses (~1.0 = linear in
            # corpus size; quadratic templating blow-up shows as ~2).
            cand_by_sf: dict[str, dict[str, dict]] = {
                str(sf): dedup_telemetry
            }
            for v, d in _probe_sf_dirs(sf_dir, sf):
                cand_by_sf[str(v)] = dedup_candidate_telemetry(spark, d)
            for q, t in dedup_telemetry.items():
                pts = sorted(
                    (float(s), m[q]["n_candidates"])
                    for s, m in cand_by_sf.items()
                    if q in m
                )
                t["candidates_by_sf"] = {str(s): c for s, c in pts}
                pos = [(s, c) for s, c in pts if c > 0]
                t["candidate_exponent"] = (
                    round(
                        math.log(pos[-1][1] / pos[-2][1])
                        / math.log(pos[-1][0] / pos[-2][0]),
                        3,
                    )
                    if len(pos) >= 2
                    else None
                )
        except Exception as ex:  # noqa: BLE001 — telemetry must not
            # void the bench numbers
            print(f"# telemetry ERROR: {str(ex)[:200]}", file=sys.stderr)
        for q, t in dedup_telemetry.items():
            print(f"# telemetry {q}: {t}", file=sys.stderr)

    # per-query trend vs the committed round-accepted baseline
    # (BENCH_LOCAL_BASELINE.json): the driver's BENCH_r{N} artifact is
    # tail-truncated to the summary line, so round-over-round per-query
    # regression detection needs a snapshot the repo owns. Flags only
    # real movement (>1.5x and >0.2 s) so the ±20% host-contention band
    # stays quiet; never voids the bench numbers.
    trend: dict[str, object] = {}
    try:
        base_path = os.path.join(os.path.dirname(__file__), "BENCH_LOCAL_BASELINE.json")
        with open(base_path) as fh:
            base = json.load(fh)
        # subset runs (names) have no warmup and are not comparable
        if names is None and base.get("sf") == sf:
            prev = base.get("queries", {})
            shared = [q for q in timings if q in prev]
            regressed = {
                q: {"prev": prev[q], "now": timings[q]}
                for q in shared
                if timings[q] > prev[q] * 1.5 + 0.2
            }
            trend = {
                "baseline_round": base.get("round"),
                "shared_total_prev": round(sum(prev[q] for q in shared), 3),
                "shared_total_now": round(sum(timings[q] for q in shared), 3),
                "regressed": regressed,
            }
            if regressed:
                print(f"# trend REGRESSED vs r{base.get('round')}: "
                      f"{regressed}", file=sys.stderr)
    except Exception as ex:  # noqa: BLE001 — trend is advisory
        print(f"# trend ERROR: {str(ex)[:120]}", file=sys.stderr)

    result = {
        "metric": "headline_queries_total",
        "unit": "sec",
        "queries": timings,
        "trend": trend,
        "dedup_telemetry": dedup_telemetry,
        # medians reported alongside min (VERDICT r3 #5) so round-over-
        # round trends aren't flattered by the most favorable statistic;
        # "queries" stays min for comparability with r2/r3.
        "queries_median": medians,
        "scaling": scaling,
        "agg": "min_of_interleaved_passes; median alongside",
        "sf": sf,
        "reps": reps,
        "value_median": round(sum(medians.values()), 3),
        "value": round(sum(timings.values()), 3),
        # start AND end canaries: host load can arrive MID-run (r14:
        # start loadavg 0.06, numbers ~1.5x) — an end-of-run loadavg
        # would mostly measure our own executors, but the single-
        # thread canary is load-independent of parallelism and reads
        # the host's effective speed at both edges of the window
        "contention": {**contention, "cpu_canary_end_s": _cpu_canary()},
    }
    if errors or warm_errors:
        result["errors"] = {**warm_errors, **errors}
    if warmup:
        result["warmup"] = warmup
        result["warmup_total"] = round(sum(warmup.values()), 3)
    if owns_session:
        spark.stop()
    return result


def summarize(result: dict) -> dict:
    """The short summary-only form of a run() result — every scalar the
    round-over-round comparison needs, none of the per-query maps."""
    out = {
        "metric": result["metric"],
        "unit": result["unit"],
        "n_queries": len(result.get("queries", {})),
        "n_errors": len(result.get("errors", {})),
        "warmup_total": result.get("warmup_total", 0.0),
        # worst scaling exponent across the probed top-K (null when the
        # probe was skipped) — the one scalar the super-linear check
        # needs even from a tail-truncated capture
        "scaling_max_exponent": max(
            (
                s["exponent"]
                for s in result.get("scaling", {}).values()
                if s.get("exponent") is not None
            ),
            default=None,
        ),
        "agg": result["agg"],
        "sf": result["sf"],
        "reps": result["reps"],
        "value_median": result["value_median"],
        "value": result["value"],
    }
    # contention marker (VERDICT r13 #6) rides the summary line so the
    # tail-kept driver capture is self-classifying: loadavg ~n_cpus or
    # foreign JVMs > 0 at start -> read the headline as contended
    if result.get("contention"):
        out["contention"] = result["contention"]
    # like-for-like ratchet (VERDICT r12 #8): sum-of-mins over queries
    # present in BOTH this run and the committed baseline, so the
    # round-over-round total stops mixing new-query mass with drift —
    # carried on the summary line because the driver tail-keeps only it
    trend = result.get("trend") or {}
    if "shared_total_now" in trend:
        out["shared_total_prev"] = trend["shared_total_prev"]
        out["shared_total_now"] = trend["shared_total_now"]
        out["baseline_round"] = trend.get("baseline_round")
    # warmup attribution (VERDICT r12 #3): warmup is a SINGLE unrepeated
    # cold pass — unlike the min-of-interleaved-passes query numbers it
    # has no noise floor, so a contended host inflates it by the full
    # contention band. Naming the top builders on the summary line makes
    # a driver-captured warmup_total self-attributing.
    warm = result.get("warmup") or {}
    if warm:
        out["warmup_top3"] = {
            k: warm[k] for k in sorted(warm, key=warm.get, reverse=True)[:3]
        }
    # per-query seconds ON the final line (VERDICT r14 #4): the driver
    # keeps only the ~2000-char TAIL of stdout and extracts per-query
    # timings from the last JSON line, so PERF_r14 could not compute
    # per-query deltas/geomean/scaling — the full 168-entry map lives on
    # the (front-truncated) detail line. The final line cannot simply
    # carry the full map either: r4 measured exactly that failure (a
    # ~4 KB single line lost its front half in the tail capture and
    # parsed as null). Compromise: greedily add the MOST EXPENSIVE
    # queries (2-decimal seconds, min-of-passes — same statistic as
    # "queries") until the serialized line reaches _SUMMARY_LINE_BUDGET,
    # so every query heavy enough for its regression to move the total
    # is per-query-visible to the driver at both core counts, and the
    # final line always survives the tail capture intact. The full map
    # still rides the detail line, unchanged.
    timings = result.get("queries", {})
    per_query: dict[str, float] = {}
    out["per_query"] = per_query
    for q in sorted(timings, key=timings.get, reverse=True):
        per_query[q] = round(timings[q], 2)
        if len(json.dumps(out)) > _SUMMARY_LINE_BUDGET:
            del per_query[q]
            break
    return out


def main() -> None:
    result = run()
    # Two JSON lines: the FULL detail line first, then a short
    # summary-only line LAST. The driver's capture keeps the TAIL of
    # stdout, so r4's single ~4 KB line lost its front half and parsed
    # as null (VERDICT r4 minor #4); the ~200-byte final line always
    # survives a tail capture intact, whichever line the parser picks.
    print(json.dumps(result))
    print(json.dumps(summarize(result)))


if __name__ == "__main__":
    main()
