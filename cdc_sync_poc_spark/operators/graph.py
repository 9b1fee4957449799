"""Graph analytics over the event stream: fixed-point PageRank on the
event-type transition digraph — "which state of the product funnel
accumulates the most Markov-chain mass" (the stationary-importance
twin of events_markov_transitions' one-step probabilities).

Scale design: the DISTRIBUTED work is the edge extraction — a lead()
window partitioned by user (embarrassingly parallel) aggregated to an
|event_type|^2 transition matrix, identical to events_markov. The node
domain is the event-type vocabulary — design-bounded (tens of values,
like the IVF centroid table), so the K power iterations run driver-
side over the collected matrix (the sanctioned bounded-collect
pattern; an unbounded node domain — e.g. per-URL PageRank — would
instead iterate K joins over the edge frame, each a shuffle on dst).

Exactness (the repo-wide cross-engine recipe): everything is BIGINT
fixed point at PR_SCALE — pr0 = SCALE div N; per-edge contribution
(pr(u) * n(u,v)) div outdeg(u); pr' = ((15 * SCALE) div N
+ 85 * sum) div 100 — floor division end to end, so the DuckDB oracle
(the same iteration unrolled as K chained CTEs) reproduces every
register bit-for-bit with zero float involvement until the final
display division. Headroom: pr <= SCALE = 1e9, so pr * n overflows
BIGINT only past ~9e9 transitions per node; beyond that the same
iteration runs in DECIMAL(38).

Dangling nodes (no out-edges) leak their mass — the standard
"dangling mass to nowhere" simplification; documented, identical on
both engines.

Reference parity: none (extension surface — the reference has no graph
ops); the edge convention matches events_markov_transitions
(operators/events_analytics.py:416).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import literal_frame, load_table

PR_SCALE = 10**9
PR_ITERS = 8
# Hard bound on the driver-side iteration (VERDICT r7 #5): the
# collected matrix is |nodes|^2 — fine for an event-type vocabulary,
# catastrophic if someone repoints this at a user- or URL-level graph.
# Above the cap the operator fails LOUDLY instead of silently
# collecting gigabytes; the distributed alternative for unbounded node
# domains is K iterations of (ranks JOIN edges ON src -> groupBy dst),
# each a shuffle keyed on dst — same fixed-point arithmetic, no
# collect (see module docstring).
PR_MAX_NODES = 10_000
# Lineage-cut cadence for the distributed iteration: every
# _CKPT_EVERY-th round's ranks frame is localCheckpoint()ed. Each
# eager checkpoint is a BLOCKING driver job on the serial path;
# skipping cuts makes the logical plan nest K deep and per-round
# Column resolution (ranks.node) re-analyzes the whole stack —
# O(K^2) analysis without cuts. Interleaved A/B at K=8 (r14, 6
# alternations, same session, min wall per query): cadence 2 2.64 s,
# cadence 4 2.10 s, no cuts 1.60 s — at the fixed K=8 the quadratic
# analysis term is still far below one blocking job, so the default
# disables intermediate cuts. A caller raising PR_ITERS well past ~8
# (streaming twins with deep replay) should drop this to ~4: the
# analysis term grows with K^2 while each cut stays one job.
_CKPT_EVERY = PR_ITERS  # i % PR_ITERS == PR_ITERS-1 only at the final round, which is excluded -> no cuts at K=8
_PR_EDGES_SQL = """
nxt AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
e AS (
  SELECT src, dst, count(*)::BIGINT AS n FROM nxt
  WHERE dst IS NOT NULL GROUP BY src, dst
),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
od AS (SELECT src, sum(n)::BIGINT AS od FROM e GROUP BY src),
nn AS (SELECT count(*)::BIGINT AS n FROM nodes)
"""


def _pr_iter_ctes(redistribute: bool = False) -> str:
    """pr0..prK as chained CTEs — the power iteration UNROLLED (no
    recursive CTE: engines disagree on aggregates/multi-references in
    recursive terms; K chained blocks are plain SQL everywhere).
    With ``redistribute`` each iteration also sums the previous round's
    rank mass sitting on dangling nodes (no out-edges) and spreads it
    uniformly: contrib += dm // N — the standard dangling-mass
    formulation, so ranks sum to ~SCALE and read as probabilities."""
    blocks = [f"pr0 AS (SELECT node, {PR_SCALE}::BIGINT // nn.n AS v"
              f" FROM nodes CROSS JOIN nn)"]
    for i in range(1, PR_ITERS + 1):
        if redistribute:
            blocks.append(f"""
dm{i} AS (
  SELECT coalesce(sum(p.v), 0)::BIGINT AS dm
  FROM pr{i - 1} p LEFT JOIN od ON od.src = p.node
  WHERE od.src IS NULL
)""")
        dm_join = f" CROSS JOIN dm{i}" if redistribute else ""
        dm_term = " + (dm // nn.n)" if redistribute else ""
        blocks.append(f"""
pr{i} AS (
  SELECT nd.node,
         ((((15::BIGINT * {PR_SCALE}::BIGINT) // nn.n)
          + (85::BIGINT * (coalesce(s.contrib, 0::BIGINT){dm_term})))
          // 100::BIGINT)::BIGINT AS v
  FROM nodes nd CROSS JOIN nn{dm_join}
  LEFT JOIN (
    SELECT e.dst, sum((p.v * e.n) // od.od)::BIGINT AS contrib
    FROM pr{i - 1} p JOIN e ON e.src = p.node JOIN od ON od.src = p.node
    GROUP BY e.dst
  ) s ON s.dst = nd.node
)""")
    return ",\n".join(blocks)


@register(
    "events_pagerank",
    oracle=f"""
WITH {_PR_EDGES_SQL},
{_pr_iter_ctes()}
SELECT node AS event_type, v AS pr_fixed,
       round(CAST(v AS DOUBLE) / {PR_SCALE}, 9) AS pagerank
FROM pr{PR_ITERS}
""",
)
def events_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, PR_ITERS power iterations, BIGINT fixed
    point) over the event-type transition digraph. Edge extraction is
    the distributed stage (lead window per user + |types|^2 count agg);
    the iteration runs on the collected bounded matrix (module
    docstring)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # node domain + weighted edge matrix in ONE collect job (r14 —
    # they were two serial blocking jobs): node-marker rows ride the
    # edge-count union with a NULL dst. Bounded: |types| + |types|^2
    # rows. The single distinct job still serves both the cap check
    # and the node domain (ADVICE r8).
    edge_part = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )
    node_part = ev.select(F.col("event_type").alias("src")).distinct().select(
        "src", F.lit(None).cast("string").alias("dst"),
        F.lit(None).cast("long").alias("n"),
    )
    collected = edge_part.unionByName(node_part).collect()
    nodes = sorted(r.src for r in collected if r.dst is None)
    edges = [r for r in collected if r.dst is not None]
    n_nodes = len(nodes)
    if n_nodes > PR_MAX_NODES:
        raise ValueError(
            f"events_pagerank collects a |nodes|^2 matrix driver-side; "
            f"{n_nodes} nodes exceeds PR_MAX_NODES={PR_MAX_NODES}. "
            "For unbounded node domains use graph_pagerank_dist (same "
            "fixed-point recurrence as K join-iterations, no collect)."
        )
    if n_nodes == 0:
        return literal_frame(
            spark, [], "event_type string, pr_fixed long, pagerank double"
        )
    outdeg: dict[str, int] = defaultdict(int)
    for r in edges:
        outdeg[r.src] += int(r.n)
    pr = {v: PR_SCALE // n_nodes for v in nodes}
    base = (15 * PR_SCALE) // n_nodes
    for _ in range(PR_ITERS):
        contrib: dict[str, int] = defaultdict(int)
        for r in edges:
            contrib[r.dst] += (pr[r.src] * int(r.n)) // outdeg[r.src]
        pr = {v: (base + 85 * contrib[v]) // 100 for v in nodes}
    return literal_frame(
        spark,
        [(v, pr[v], round(pr[v] / PR_SCALE, 9)) for v in nodes],
        "event_type string, pr_fixed long, pagerank double",
    )


@register(
    "graph_pagerank_dist",
    oracle=f"""
WITH {_PR_EDGES_SQL},
{_pr_iter_ctes()}
SELECT node AS event_type, v AS pr_fixed,
       round(CAST(v AS DOUBLE) / {PR_SCALE}, 9) AS pagerank
FROM pr{PR_ITERS}
""",
)
def graph_pagerank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED power iteration — identical semantics (and
    identical oracle) to events_pagerank, but the K iterations run as
    DataFrame joins, never collecting the edge matrix: this is the
    path events_pagerank's PR_MAX_NODES error message points at, and
    the shape that survives an unbounded node domain (per-URL / per-
    user graphs) at 100 TB.

    Per iteration: ranks ⋈ edges ON src (ranks is |V| rows — AQE
    broadcasts it at runtime while it fits; at true web scale both
    sides shuffle on src, which is exactly GraphX/Pregel's message
    stage) → groupBy dst sum((v*n) div od) (one shuffle keyed on dst,
    with map-side partial aggregation) → left join back onto nodes for
    the damping update. At the fixed K=8 NO intermediate lineage cut
    is taken (r14, measured — see _CKPT_EVERY): the recurring
    edge/node subtrees dedupe via ReuseExchange inside the one final
    action, so each localCheckpoint only added a blocking driver job;
    deep-K callers re-enable cuts through _CKPT_EVERY.

    Arithmetic is the same BIGINT fixed point as events_pagerank
    (module docstring), so the two operators — and the unrolled-CTE
    DuckDB oracle — agree bit-for-bit; tests/test_units.py asserts the
    driver-side and distributed iterations produce identical pr_fixed
    registers."""
    ev = load_table(spark, sf_dir, "events")
    nodes, edges_raw = _event_graph(ev)
    return pr_fixed_point_frames(spark, nodes, edges_raw)


def _event_graph(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(nodes, weighted edges) of the event-type transition digraph —
    the lead-window edge extraction shared by the two distributed
    PageRank variants (convention matches events_markov_transitions)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges_raw = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    return nodes, edges_raw


@register(
    "graph_pagerank_mass",
    oracle=f"""
WITH {_PR_EDGES_SQL},
{_pr_iter_ctes(redistribute=True)}
SELECT node AS event_type, v AS pr_fixed,
       round(CAST(v AS DOUBLE) / {PR_SCALE}, 9) AS pagerank
FROM pr{PR_ITERS}
""",
)
def graph_pagerank_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_pagerank_dist with the standard dangling-mass
    redistribution (VERDICT r8 #7): each iteration's rank mass on
    nodes with no out-edges is spread uniformly (contrib += dm div N),
    so ranks sum to ~PR_SCALE (floor-division dust only) and are
    usable directly as stationary probabilities. Same BIGINT fixed
    point; the oracle is the unrolled-CTE iteration extended with one
    dm CTE per round. On a dangling-free graph (every node has an
    out-edge) dm == 0 every round and this is bit-identical to
    graph_pagerank_dist — tests/test_units.py pins both that identity
    and mass conservation on a synthetic dangling graph."""
    ev = load_table(spark, sf_dir, "events")
    nodes, edges_raw = _event_graph(ev)
    return pr_fixed_point_frames(
        spark, nodes, edges_raw, redistribute_dangling=True
    )


def pr_fixed_point_frames(
    spark: SparkSession,
    nodes: DataFrame,
    edges_raw: DataFrame,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """The distributed K-iteration fixed point over any (node) /
    (src, dst, n) pair — shared by graph_pagerank_dist and the
    streaming incremental twin (streaming/pagerank.py), which feeds it
    edge counts accumulated across micro-batches.

    ``redistribute_dangling`` adds the standard dangling-mass term:
    each iteration sums the previous round's rank mass on nodes with
    no out-edges (one tiny agg over the |dangling| rows — a 1-row
    frame cross-joined onto the update, the sanctioned broadcast-
    scalar pattern) and spreads it uniformly (contrib += dm div N).
    Ranks then sum to ~SCALE (floor-division dust only) and read as
    probabilities; without it dangling mass leaks, matching
    events_pagerank (module docstring)."""
    od = edges_raw.groupBy("src").agg(F.sum("n").alias("od"))
    # (src, dst, n, od): outdegree rides on the edge row so the
    # iteration never re-joins it. NOT localCheckpoint()ed (r14): the
    # edge/node subtrees recur in every iteration of the final plan,
    # but physical planning dedupes them via ReuseExchange, so the
    # shuffle runs once per action either way — while each eager
    # checkpoint was a BLOCKING driver job on the serial path.
    # Interleaved A/B (same session, 5 alternations): checkpointed
    # edges+nodes min 1.33 s / median 1.64 s vs un-checkpointed
    # min 1.02 s / median 1.28 s, bit-identical pr_fixed output.
    edges = edges_raw.join(od, "src")
    dangling = None
    if redistribute_dangling:
        # node domain minus src domain, computed once outside the loop
        # (|dangling| <= |V| rows; at web scale this is a frame join,
        # never collected). The |V| count and the dangling-emptiness
        # check share ONE left-join aggregate job (r14 — they were two
        # serial blocking jobs): src ⊆ nodes, so n_dangling is the
        # count of unmatched node rows.
        srcs = edges.select("src").distinct()
        row = (
            nodes.join(srcs, nodes.node == F.col("src"), "left")
            .agg(
                F.count("*").alias("n_nodes"),
                F.count(F.when(F.col("src").isNull(), 1)).alias("n_dang"),
            )
            .collect()[0]
        )
        n_nodes = int(row.n_nodes)
        if int(row.n_dang) > 0:
            dangling = nodes.join(
                srcs, nodes.node == F.col("src"), "left_anti"
            ).select("node")
        # else: dm would be 0 every round — drop the per-iteration agg
        # + cross-join entirely (the scalar check up front buys K
        # skipped jobs; bit-identical by construction)
    else:
        n_nodes = nodes.count()  # one scalar to the driver, not the graph
    if n_nodes == 0:
        return literal_frame(
            spark, [], "event_type string, pr_fixed long, pagerank double"
        )
    base = (15 * PR_SCALE) // n_nodes
    ranks = nodes.select(
        "node", F.lit(PR_SCALE // n_nodes).cast("long").alias("v")
    )
    for i in range(PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.expr("(v * n) div od")).alias("contrib"))
        )
        upd = nodes.join(contrib, nodes.node == contrib.dst, "left")
        if dangling is not None:
            dm = ranks.join(dangling, "node").agg(
                F.coalesce(F.sum("v"), F.lit(0)).cast("long").alias("dm")
            )
            ranks = upd.crossJoin(F.broadcast(dm)).select(
                "node",
                F.expr(
                    f"(cast({base} as bigint)"
                    " + 85 * (coalesce(contrib, cast(0 as bigint))"
                    f" + dm div {n_nodes})) div 100"
                ).alias("v"),
            )
        else:
            ranks = upd.select(
                "node",
                F.expr(
                    f"(cast({base} as bigint)"
                    " + 85 * coalesce(contrib, cast(0 as bigint))) div 100"
                ).alias("v"),
            )
        # cut lineage mid-iteration, but never after the FINAL round —
        # leaving the last iteration un-checkpointed keeps the returned
        # frame's plan showing the real join/agg shape (PLANS.md) and
        # saves one materialization (cadence measured r14; see
        # _CKPT_EVERY).
        if i % _CKPT_EVERY == _CKPT_EVERY - 1 and i != PR_ITERS - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        F.col("node").alias("event_type"),
        F.col("v").alias("pr_fixed"),
        F.round(F.col("v") / F.lit(PR_SCALE), 9).alias("pagerank"),
    )
