"""Graph-analytics kernels (SURVEY §2.10) — DataFrame-native.

The reference computes these with igraph on tiny per-sample subgraphs
(bin/interpersonaldiversity.R:98-114, bin/CompareNetworkGroups.R:108-126,
bin/compareTwins.R:95-104 in /root/reference).  Two scale regimes:

1. **Per-group kernels** (hundreds/thousands of per-sample subgraphs):
   NEVER one job per subgraph — every kernel here takes a `group_cols`
   argument and computes ALL subgraphs in one shuffle by keying every
   intermediate on the group columns.  This is the §7 risk-register
   design: per-sample fan-out as grouped aggregation.

2. **Global iterative kernels** (one big graph): power iteration /
   frontier expansion expressed as a DataFrame loop with per-superstep
   lineage truncation — the Pregel pattern without GraphX,
   shuffle-per-superstep, executor-parallel.  Truncation is
   `localCheckpoint` locally and, opt-in for real clusters, a reliable
   DFS `checkpoint()` that survives executor loss (see `_checkpoint`).

Edges are directed (src, dst [, weight]); kernels that need the
undirected view symmetrize internally.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _gcols(group_cols: list[str] | None) -> list[str]:
    return list(group_cols) if group_cols else []


def symmetrize(edges: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Undirected view: union of both directions, deduped.

    Weighted edges reduce by MAX per (src, dst) — a deterministic rule
    for inputs that carry both (a,b,w1) and (b,a,w2); dropDuplicates
    would keep whichever row a shuffle happened to order first."""
    g = _gcols(group_cols)
    has_w = "weight" in edges.columns
    cols = [*g, "src", "dst"] + (["weight"] if has_w else [])
    fwd = edges.select(*cols)
    rev = edges.select(
        *g,
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        *([F.col("weight")] if has_w else []),
    )
    both = fwd.unionByName(rev)
    if has_w:
        return both.groupBy(*g, "src", "dst").agg(F.max("weight").alias("weight"))
    return both.dropDuplicates([*g, "src", "dst"])


_RELIABLE_ENV = "SPARK_GRAFT_RELIABLE_CHECKPOINT"
_RELIABLE_DIR_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"


def _checkpoint(df: DataFrame) -> DataFrame:
    """Truncate lineage between supersteps (keeps plans O(1) per iter).

    Default: localCheckpoint — partitions are stored on the EXECUTORS
    and the lineage is discarded, so on a real multi-executor cluster
    ONE executor loss mid-loop makes those partitions unrecoverable and
    fails the job (Spark cannot recompute what it no longer has a plan
    for).  That is the right trade on local[N] (no executor can be
    lost separately from the driver) and wrong for a 100 TB run, where
    some executor loss over a long iterative kernel is close to
    certain.

    Reliable mode (opt-in): set SPARK_GRAFT_RELIABLE_CHECKPOINT=1 and
    configure a fault-tolerant checkpoint directory — either call
    sc.setCheckpointDir("hdfs://..." / "s3a://...") yourself or set
    SPARK_GRAFT_CHECKPOINT_DIR and this helper installs it.  Supersteps
    then persist through df.checkpoint() to the DFS, surviving any
    executor loss at the cost of one write+read per superstep of a
    frame that is already small (frontier / score vectors, never the
    input).  Every iterative loop in this module funnels through this
    one helper, so the switch covers power iteration, BFS frontiers,
    LPA, and the Brandes pivots alike.  Set
    spark.cleaner.referenceTracking.cleanCheckpoints=true to have
    out-of-scope checkpoint files garbage-collected.

    The lazy .localCheckpoint(eager=False) calls elsewhere in the
    codebase (plan-dedup of delta/abundance frames) are deliberately
    NOT switched: each lives inside a single action, so a plain query
    retry recovers them — there is no multi-job lifetime for an
    executor loss to orphan."""
    sc = df.sparkSession.sparkContext
    if os.environ.get(_RELIABLE_ENV, "").lower() in ("1", "true"):
        if sc.getCheckpointDir() is None:
            cdir = os.environ.get(_RELIABLE_DIR_ENV)
            if not cdir:
                raise RuntimeError(
                    f"{_RELIABLE_ENV} is set but no checkpoint directory is "
                    f"configured: call sc.setCheckpointDir(...) or set "
                    f"{_RELIABLE_DIR_ENV} to a fault-tolerant path"
                )
            sc.setCheckpointDir(cdir)
        # reliable checkpoints live as DFS files, not block-manager
        # blocks — nothing to track for _release (file GC is the
        # cleaner's job, see cleanCheckpoints above).  Persist across
        # the checkpoint's TWO jobs: RDD.checkpoint materializes the
        # eager action first and then runs a separate job to write the
        # DFS files, which would recompute the whole superstep plan a
        # second time on an unpersisted frame (Spark's own
        # RDD.checkpoint doc recommends persisting first).  The cache
        # is dropped as soon as the files are written — the returned
        # frame reads the DFS copy.
        cached = df.persist()
        try:
            return cached.checkpoint(eager=True)
        finally:
            cached.unpersist()
    return _tracked_local_checkpoint(df)


def _tracked_local_checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint that records the persistent-RDD id it
    creates (on the returned frame, for _release).  Use directly for
    NON-loop frames that want deterministic block release (e.g. a
    foreachBatch epoch's scored batch); loops go through _checkpoint,
    which adds the reliable-mode switch.

    The id is read straight off the returned frame's analyzed plan —
    a checkpointed Dataset is a LogicalRDD over exactly the persisted
    RDD — so attribution is exact even when other driver threads
    (concurrent foreachBatch epochs, a kernel on another thread)
    checkpoint at the same time.  A global before/after diff of the
    persistent-RDD set would race there and could claim (and later
    release) a concurrent job's live blocks."""
    out = df.localCheckpoint(eager=True)
    try:
        out._sg_ckpt_ids = [_ckpt_rdd_id(out)]
    except Exception:
        # plan shape not LogicalRDD (unexpected for a localCheckpoint
        # result; the py4j path below is private API and may change
        # shape across Spark versions) — leave untracked rather than
        # guess: _release then no-ops and the context cleaner reclaims
        # the blocks on GC, the pre-tracking behavior.  That silent
        # degradation would quietly reintroduce the O(iterations)
        # block retention the tracking exists to prevent, so make it
        # VISIBLE once per process instead of only under a memory
        # profiler.
        global _ckpt_track_warned
        if not _ckpt_track_warned:
            _ckpt_track_warned = True
            warnings.warn(
                "checkpoint block tracking unavailable (could not read the "
                "persisted RDD id off the localCheckpoint result — private "
                "py4j plan path changed?); superseded superstep blocks will "
                "only be reclaimed by GC, so long iterative kernels may "
                "retain O(iterations) block-manager memory",
                RuntimeWarning,
                stacklevel=3,
            )
        out._sg_ckpt_ids = []
    return out


_ckpt_track_warned = False


def _ckpt_rdd_id(out: DataFrame) -> int:
    """The persisted RDD id of an eager localCheckpoint result, read
    off its analyzed plan (a LogicalRDD over exactly the persisted
    RDD).  Private py4j path, isolated here so the tracking fallback
    in _tracked_local_checkpoint is testable."""
    return out._jdf.queryExecution().analyzed().rdd().id()


def _release(*dfs: DataFrame | None) -> None:
    """Free a SUPERSEDED superstep checkpoint's block-manager blocks.

    Every eager localCheckpoint pins its partitions in the block
    manager until the session ends — DataFrame.unpersist() cannot free
    them (localCheckpoint caches at the RDD level, below the SQL
    CacheManager), so a loop that checkpoints per superstep accumulates
    EVERY iteration's blocks even though only the newest frame is ever
    read again.  On one shared local[N] heap that accumulation is the
    difference between completing and OOM: the K=64 betweenness scale
    probe (1.34M nodes, 4096 joint pivots, ~5 GB per visited superstep)
    exhausted a 48g heap purely on superseded forward-pass copies.  On
    a real cluster the same growth evicts executor storage memory and
    forces recomputation-by-eviction churn instead.

    _checkpoint records the persistent-RDD ids each localCheckpoint
    creates; this unpersists them (non-blocking) and blanks the record
    so double-release is a no-op.  SAFETY: a released frame is
    UNRECOVERABLE — its lineage is truncated and its blocks are gone —
    so callers release a frame only after its successor is eagerly
    materialized and no later plan reads it.  Frames without the
    recorded attribute (never checkpointed, or reliable-mode DFS
    checkpoints) are skipped."""
    for df in dfs:
        if df is None:
            continue
        ids = getattr(df, "_sg_ckpt_ids", None)
        if not ids:
            continue
        jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
        for rid in ids:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
        df._sg_ckpt_ids = []


class _loop_shuffle_width:
    """Pin spark.sql.shuffle.partitions for the duration of an iterative
    kernel loop.

    Why: checkpointed supersteps re-shuffle at the session's full width
    every iteration; for the (very common) case of many SMALL per-sample
    subgraphs the per-task overhead then dominates — measured 31s → 4s on
    the interpersonal-diversity pipeline's 8-iteration eigenvector loop.
    Width is chosen from the actual edge count (~50k rows/partition),
    capped at the session default, so big graphs keep full parallelism.
    """

    def __init__(self, edges: DataFrame, rows_per_partition: int = 50_000):
        self.spark = edges.sparkSession
        n = edges.count()
        default = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        self.width = max(1, min(default, -(-n // rows_per_partition)))

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.width))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


# --------------------------------------------------------------------------
# G1 — degree / graph size
# --------------------------------------------------------------------------


def degrees(edges: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Undirected degree per node (igraph::degree,
    bin/CompareNetworkGroups.R:116-126). One shuffle for all groups."""
    g = _gcols(group_cols)
    und = symmetrize(edges, g)
    # a self-loop appears ONCE in the symmetrized view but contributes 2
    # to its node's degree (igraph semantics)
    loop = F.when(F.col("src") == F.col("dst"), 1).otherwise(0)
    return und.groupBy(*g, F.col("src").alias("node")).agg(
        (F.count(F.lit(1)) + F.sum(loop)).alias("degree")
    )


def graph_size(edges: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Node + edge counts per group (gsize/gorder; rtables/nestats.tsv shape)."""
    g = _gcols(group_cols)
    und = symmetrize(edges, g)
    nodes = (
        und.select(*g, F.col("src").alias("node"))
        .distinct()
        .groupBy(*g)
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    # self-loops appear once in the symmetrized view, non-loops twice:
    # n_edges = (rows + loops) / 2 counts each exactly once (igraph
    # gsize parity — plain rows/2 truncates when loops make rows odd)
    loop = F.when(F.col("src") == F.col("dst"), 1).otherwise(0)
    e = und.groupBy(*g).agg(
        ((F.count(F.lit(1)) + F.sum(loop)) / 2).cast("long").alias("n_edges")
    )
    return nodes.join(e, g) if g else nodes.crossJoin(e)


# --------------------------------------------------------------------------
# G10 — Shannon edge-weight diversity per node (pure aggregation)
# --------------------------------------------------------------------------


def node_entropy(
    edges: DataFrame,
    weight_col: str = "weight",
    group_cols: list[str] | None = None,
    node_col: str = "src",
) -> DataFrame:
    """Shannon diversity of a node's incident edge weights
    (bin/compareTwins.R:101-104): H = -Σ p·ln(p), p = w/Σw.

    Computed in ONE aggregation via the identity
    -Σ (w/W)·ln(w/W) = ln(W) - (Σ w·ln w)/W with W = Σw, so the kernel
    is a single map-side-combined shuffle — no totals join, no second
    pass over the edges.
    """
    g = _gcols(group_cols)
    w = F.col(weight_col)
    total = F.sum(w)
    return edges.groupBy(*g, F.col(node_col).alias("node")).agg(
        F.round(F.log(total) - F.sum(w * F.log(w)) / total, 6).alias("entropy")
    )


# --------------------------------------------------------------------------
# G6/G8/G9 — eigenvector centrality / PageRank via joint power iteration
# --------------------------------------------------------------------------


def eigenvector_centrality(
    edges: DataFrame,
    group_cols: list[str] | None = None,
    weight_col: str | None = "weight",
    max_iter: int = 30,
) -> DataFrame:
    """Weighted eigenvector centrality (igraph::eigen_centrality,
    bin/interpersonaldiversity.R:98-114), normalized to max=1 per group
    (igraph's `scale=TRUE` default).

    Joint power iteration: ONE DataFrame loop computes every group's
    leading eigenvector simultaneously — scores keyed by (group, node),
    message passing is a join+aggregate per superstep. 100 TB shape:
    max_iter shuffles total, independent of #groups.

    Iterates on A + sI (s = per-group max weighted degree): same leading
    eigenvector as A, but convergent on bipartite graphs where plain
    power iteration oscillates between the ±λ₁ eigenpair (the reference's
    phage↔bacteria graphs are exactly bipartite).
    """
    g = _gcols(group_cols)
    und = symmetrize(edges, g)
    w = F.col(weight_col) if (weight_col and weight_col in und.columns) else F.lit(1.0)
    adj = und.select(*g, "src", "dst", w.cast("double").alias("w"))

    # materialize the (possibly expensive) upstream DAG ONCE — without
    # this, a pipeline-fed adjacency recomputes its whole lineage every
    # superstep (checkpointing `scores` alone doesn't protect `adj`)
    adj = _checkpoint(adj)

    # spectral shift: s ≥ λ₁ via max weighted degree (Gershgorin bound)
    wdeg = adj.groupBy(*g, "src").agg(F.sum("w").alias("_wd"))
    shift = _checkpoint(wdeg.groupBy(*g).agg(F.max("_wd").alias("_shift")))

    scores = (
        adj.select(*g, F.col("src").alias("node"))
        .distinct()
        .withColumn("score", F.lit(1.0))
    )
    with _loop_shuffle_width(adj):
        for _ in range(max_iter):
            msgs = adj.join(
                scores.withColumnRenamed("node", "src"), [*g, "src"]
            ).groupBy(*g, F.col("dst").alias("node")).agg(
                F.sum(F.col("w") * F.col("score")).alias("_ax")
            )
            msgs = (
                (msgs.join(shift, g) if g else msgs.crossJoin(shift))
                .join(scores, [*g, "node"])
                .select(
                    *g,
                    "node",
                    (F.col("_ax") + F.col("_shift") * F.col("score")).alias("raw"),
                )
            )
            # L2-normalize per group (power iteration stability)
            norm = msgs.groupBy(*g).agg(F.sqrt(F.sum(F.col("raw") ** 2)).alias("_n"))
            new_scores = (
                (msgs.join(norm, g) if g else msgs.crossJoin(norm))
                .select(*g, "node", (F.col("raw") / F.col("_n")).alias("score"))
            )
            prev, scores = scores, _checkpoint(new_scores)
            _release(prev)
    # igraph scale: max = 1 per group
    mx = scores.groupBy(*g).agg(F.max("score").alias("_mx")) if g else None
    if g:
        scores = scores.join(mx, g)
    else:
        scores = scores.crossJoin(scores.agg(F.max("score").alias("_mx")))
    return scores.select(
        *g, "node", F.round(F.col("score") / F.col("_mx"), 6).alias("centrality")
    )


def centralization(
    centralities: DataFrame,
    score_col: str = "centrality",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Freeman centralization Σ(max − cᵢ) normalized by (n−1)
    (doc/manuscript.md:219-227 formula family; bin/alteredDiet.R:125-131)."""
    g = _gcols(group_cols)
    s = F.col(score_col)
    agg = centralities.groupBy(*g).agg(
        F.max(s).alias("_mx"), F.sum(s).alias("_sum"), F.count(F.lit(1)).alias("_n")
    )
    return agg.select(
        *g,
        # single-node group: 0/0 would yield NULL (or error under ANSI);
        # a one-node graph has zero centralization by definition
        F.when(
            F.col("_n") > 1,
            F.round(
                (F.col("_n") * F.col("_mx") - F.col("_sum")) / (F.col("_n") - 1), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("centralization"),
    )


def pagerank(
    edges: DataFrame,
    group_cols: list[str] | None = None,
    weight_col: str | None = None,
    damping: float = 0.85,
    max_iter: int = 20,
) -> DataFrame:
    """Weighted PageRank on the undirected view (igraph::page_rank,
    bin/compareTwins.R:98-100). Same joint-iteration shape as
    eigenvector_centrality."""
    g = _gcols(group_cols)
    und = symmetrize(edges, g)
    w = F.col(weight_col) if (weight_col and weight_col in und.columns) else F.lit(1.0)
    adj = und.select(*g, "src", "dst", w.cast("double").alias("w"))
    # out-weight normalization; materialize once (see eigenvector note)
    outw = adj.groupBy(*g, "src").agg(F.sum("w").alias("_ow"))
    adj = _checkpoint(
        adj.join(outw, [*g, "src"]).withColumn("p", F.col("w") / F.col("_ow"))
    )

    nodes = _checkpoint(adj.select(*g, F.col("src").alias("node")).distinct())
    counts = nodes.groupBy(*g).agg(F.count(F.lit(1)).alias("_n"))
    ranks = (nodes.join(counts, g) if g else nodes.crossJoin(counts)).select(
        *g, "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    with _loop_shuffle_width(adj):
        for _ in range(max_iter):
            contrib = adj.join(
                ranks.withColumnRenamed("node", "src"), [*g, "src"]
            ).groupBy(*g, F.col("dst").alias("node")).agg(
                F.sum(F.col("p") * F.col("rank")).alias("_in")
            )
            base = nodes.join(counts, g) if g else nodes.crossJoin(counts)
            new_ranks = (
                base.join(contrib, [*g, "node"], "left")
                .select(
                    *g,
                    "node",
                    (
                        (1 - damping) / F.col("_n")
                        + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
            prev, ranks = ranks, _checkpoint(new_ranks)
            _release(prev)
    return ranks.select(*g, "node", F.round("rank", 8).alias("pagerank"))


def katz_centrality(
    edges: DataFrame,
    group_cols: list[str] | None = None,
    alpha: float | DataFrame = 0.05,
    beta: float = 1.0,
    max_iter: int = 15,
    weight_col: str | None = None,
) -> DataFrame:
    """Katz-Bonacich centrality by truncated Neumann series:
    x ← β·1 + α·Aᵀx, converging to (I − αAᵀ)⁻¹β1 when α < 1/λ₁
    (igraph::alpha_centrality family, bin/compareTwins.R:95-97).

    The distributed fixed-iteration twin of alpha_centrality's exact
    per-group dense solve: same joint-iteration shape as pagerank —
    max_iter shuffles total for every group at once, no per-group
    matrix ever materialized. Callers must keep α below 1/λ₁ (e.g.
    0.5 / max degree, the Gershgorin bound) or the truncated series
    grows geometrically instead of converging.  α may be a float or a
    1-row/1-column DataFrame (e.g. a data-derived 0.5/max-degree
    aggregate) broadcast into the plan — no driver-side collect.
    """
    g = _gcols(group_cols)
    und = symmetrize(edges, g)
    w = F.col(weight_col) if (weight_col and weight_col in und.columns) else F.lit(1.0)
    adj = _checkpoint(und.select(*g, "src", "dst", w.cast("double").alias("w")))
    nodes = adj.select(*g, F.col("src").alias("node")).distinct()
    if isinstance(alpha, DataFrame):
        acol = alpha.columns[0]
        nodes = nodes.crossJoin(
            F.broadcast(alpha.select(F.col(acol).cast("double").alias("_alpha")))
        )
    else:
        nodes = nodes.withColumn("_alpha", F.lit(float(alpha)))
    nodes = _checkpoint(nodes)
    x = nodes.withColumn("katz", F.lit(float(beta)))
    with _loop_shuffle_width(adj):
        for _ in range(max_iter):
            msgs = adj.join(
                x.select(*g, F.col("node").alias("src"), "katz"), [*g, "src"]
            ).groupBy(*g, F.col("dst").alias("node")).agg(
                F.sum(F.col("w") * F.col("katz")).alias("_in")
            )
            prev, x = x, _checkpoint(
                nodes.join(msgs, [*g, "node"], "left").select(
                    *g,
                    "node",
                    "_alpha",
                    (
                        F.lit(float(beta))
                        + F.col("_alpha") * F.coalesce(F.col("_in"), F.lit(0.0))
                    ).alias("katz"),
                )
            )
            _release(prev)
    return x.select(*g, "node", F.round("katz", 6).alias("katz"))


# --------------------------------------------------------------------------
# G3 — connected components (large-star/small-star style min-label)
# --------------------------------------------------------------------------


def _cc_local(und: DataFrame, g: list[str]) -> DataFrame:
    """Small-graph fast path for connected_components: min-root
    union-find inside applyInPandas (one task per group). Identical
    output — component label = lexicographic-min member — without the
    per-superstep job overhead that dominates at small scale (measured
    ~7s of fixed cost for a tiny dup-pair graph)."""
    import pandas as pd

    if not g:
        und = und.withColumn("_g", F.lit(1))
        g_eff = ["_g"]
    else:
        g_eff = g
    # group columns keep their NATIVE types (schema copied from the
    # input), matching the superstep path exactly; node/component are
    # string on both paths (connected_components casts before choosing)
    gtypes = {f.name: f.dataType.simpleString() for f in und.schema.fields}
    schema = ", ".join(f"{c} {gtypes[c]}" for c in g_eff) + ", node string, component string"

    def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for s, d in zip(pdf["src"], pdf["dst"]):
            s, d = str(s), str(d)
            parent.setdefault(s, s)
            parent.setdefault(d, d)
            rs, rd = find(s), find(d)
            if rs != rd:
                lo, hi = (rs, rd) if rs < rd else (rd, rs)
                parent[hi] = lo  # min root survives → min-label semantics
        nodes = list(parent)
        rows = {c: [pdf[c].iloc[0]] * len(nodes) for c in g_eff}
        rows["node"] = nodes
        rows["component"] = [find(v) for v in nodes]
        return pd.DataFrame(rows)

    out = und.groupBy(*g_eff).applyInPandas(_solve, schema=schema)
    return out.select(*g, "node", "component")


def connected_components(
    edges: DataFrame,
    group_cols: list[str] | None = None,
    max_iter: int = 50,
    local_cutoff: int = 500_000,
) -> DataFrame:
    """Weak connectivity (igraph components,
    bin/GeneralNetworkProperties.R:68-84): iterative min-label
    propagation to convergence, all groups jointly — O(diameter)
    supersteps (labels advance one hop per round; no pointer-doubling).
    Exhausting max_iter without converging RAISES rather than returning
    a silently over-split partition.

    Node ids (and component labels) are strings on BOTH paths, so the
    local fast path and the superstep path return identical labels and
    schemas — min-label always means lexicographic min.

    Edge lists at or below local_cutoff rows short-circuit to a
    semantically identical single-task union-find (_cc_local) — at small
    scale the fixed per-superstep cost dominates; set local_cutoff=0 to
    force the superstep path."""
    g = _gcols(group_cols)
    und = symmetrize(edges, g).withColumns(
        {"src": F.col("src").cast("string"), "dst": F.col("dst").cast("string")}
    )
    if local_cutoff and und.count() <= local_cutoff:
        return _cc_local(und, g)
    labels = (
        und.select(*g, F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    und = _checkpoint(und)  # see eigenvector note: freeze upstream DAG
    with _loop_shuffle_width(und):
        for _ in range(max_iter):
            nbr_min = (
                und.join(labels.withColumnRenamed("node", "src"), [*g, "src"])
                .groupBy(*g, F.col("dst").alias("node"))
                .agg(F.min("component").alias("_nbr"))
            )
            new_labels = labels.join(nbr_min, [*g, "node"], "left").select(
                *g, "node", F.least(F.col("component"), F.col("_nbr")).alias("component")
            )
            new_labels = _checkpoint(new_labels)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), [*g, "node"])
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            # the convergence probe above is old labels' last reader
            _release(labels)
            labels = new_labels
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "supersteps (graph diameter exceeds max_iter); raise "
                "max_iter — returning would silently over-split components"
            )
    return labels


def connectivity_summary(edges: DataFrame, max_depth: int = 30) -> DataFrame:
    """G3 — strong + weak connectivity of a directed graph in one row
    (igraph ``is.connected(mode="strong"|"weak")``,
    bin/GeneralNetworkProperties.R:68-84).

    A whole-graph strong-connectivity CHECK never needs SCC decomposition:
    the graph is strongly connected iff every node is reachable from one
    pivot forward AND backward — two directed BFS sweeps from the
    deterministic min-id node, O(E·diameter) total, vs the many-round
    pivot-coloring SCC algorithms. Weak = one undirected sweep.

    Returns (n_nodes, forward_reach, backward_reach, weak_reach,
    strongly_connected, weakly_connected) — one declarative row; only the
    BFS supersteps iterate."""
    fwd = edges.select("src", "dst")
    nodes = (
        fwd.select(F.col("src").alias("node"))
        .unionByName(fwd.select(F.col("dst").alias("node")))
        .distinct()
    )
    pivot = nodes.agg(F.min("node").alias("root"))
    freach = bfs_distances(fwd, sources=pivot, max_depth=max_depth, directed=True)
    breach = bfs_distances(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        sources=pivot,
        max_depth=max_depth,
        directed=True,
    )
    wreach = bfs_distances(fwd, sources=pivot, max_depth=max_depth)
    out = (
        nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(freach.agg(F.count(F.lit(1)).alias("forward_reach")))
        .crossJoin(breach.agg(F.count(F.lit(1)).alias("backward_reach")))
        .crossJoin(wreach.agg(F.count(F.lit(1)).alias("weak_reach")))
    )
    return out.select(
        "n_nodes",
        "forward_reach",
        "backward_reach",
        "weak_reach",
        (
            (F.col("forward_reach") == F.col("n_nodes"))
            & (F.col("backward_reach") == F.col("n_nodes"))
        )
        .cast("int")
        .alias("strongly_connected"),
        (F.col("weak_reach") == F.col("n_nodes")).cast("int").alias("weakly_connected"),
    )


def is_connected(edges: DataFrame, mode: str = "weak", max_depth: int = 30) -> bool:
    """igraph ``is.connected`` twin (bin/GeneralNetworkProperties.R:73-76)."""
    row = connectivity_summary(edges, max_depth=max_depth).first()
    return bool(row.strongly_connected if mode == "strong" else row.weakly_connected)


# --------------------------------------------------------------------------
# G2/G4/G5/G7 — BFS distances → diameter / radius / eccentricity / closeness
# --------------------------------------------------------------------------


def bfs_distances(
    edges: DataFrame,
    group_cols: list[str] | None = None,
    sources: DataFrame | None = None,
    max_depth: int = 20,
    directed: bool = False,
    allow_truncated: bool = False,
) -> DataFrame:
    """Multi-source BFS: distances (group, root, node, dist) for every
    root in `sources` (default: ALL nodes → exact all-pairs, right for
    reference-scale graphs ≤~10⁴ nodes; pass sampled landmark roots at
    scale).

    `directed=True` walks edges src→dst only (strong-connectivity /
    directed-reachability checks); default symmetrizes first.

    `max_depth` is a SAFETY cap, not a silent truncation: if the
    frontier is still expanding when the cap is hit, the function
    RAISES — a capped sweep would report wrong distances, a capped
    diameter, or a false "not connected" verdict downstream. Pass
    allow_truncated=True only where bounded exploration is the
    semantics (truncated/landmark variants).

    Frontier expansion keyed by (group, root) — one shuffle per depth
    level for every root simultaneously, never a per-root job.
    """
    g = _gcols(group_cols)
    if directed:
        und = edges.select(*g, "src", "dst").dropDuplicates([*g, "src", "dst"])
        all_nodes = (
            und.select(*g, F.col("src").alias("node"))
            .unionByName(und.select(*g, F.col("dst").alias("node")))
            .distinct()
        )
    else:
        und = symmetrize(edges, g)
        all_nodes = und.select(*g, F.col("src").alias("node")).distinct()
    roots = sources if sources is not None else all_nodes.select(*g, F.col("node").alias("root"))

    visited = roots.select(*g, "root", F.col("root").alias("node")).withColumn(
        "dist", F.lit(0)
    )
    frontier = visited
    und = _checkpoint(und)  # see eigenvector note: freeze upstream DAG
    with _loop_shuffle_width(und):
        for depth in range(1, max_depth + 1):
            neighbors = (
                frontier.join(und.withColumnRenamed("src", "node"), [*g, "node"])
                .select(*g, "root", F.col("dst").alias("node"))
                .distinct()
            )
            new = neighbors.join(
                visited.select(*g, "root", "node"), [*g, "root", "node"], "left_anti"
            ).withColumn("dist", F.lit(depth))
            new = _checkpoint(new)
            if new.limit(1).count() == 0:
                break
            prev_visited, prev_frontier = visited, frontier
            visited = _checkpoint(visited.unionByName(new))
            # superseded: prev_visited is folded into the new union,
            # prev_frontier's last reader was this superstep's
            # neighbors join (both successors eagerly materialized)
            _release(prev_visited, prev_frontier)
            frontier = new
        else:
            # cap reached with a live frontier: probe one more level —
            # any unvisited neighbor means the sweep is incomplete
            more = (
                frontier.join(und.withColumnRenamed("src", "node"), [*g, "node"])
                .select(*g, "root", F.col("dst").alias("node"))
                .join(
                    visited.select(*g, "root", "node"),
                    [*g, "root", "node"],
                    "left_anti",
                )
                .limit(1)
                .count()
            )
            if more > 0 and not allow_truncated:
                raise RuntimeError(
                    f"bfs_distances frontier still expanding at max_depth="
                    f"{max_depth}; raise max_depth (or pass "
                    "allow_truncated=True for bounded-exploration "
                    "semantics) — truncated distances would silently "
                    "corrupt diameter/eccentricity/connectivity results"
                )
    return visited


def eccentricity(distances: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """G4 — per-node eccentricity from BFS distances
    (bin/CompareNetworkGroups.R:108-114)."""
    g = _gcols(group_cols)
    return distances.groupBy(*g, F.col("root").alias("node")).agg(
        F.max("dist").alias("eccentricity")
    )


def diameter_radius(
    distances: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """G2 — diameter & radius (igraph::diameter/radius,
    bin/GeneralNetworkProperties.R:60-66; golden: master graph 4/2,
    rtables/genfigurestats.tsv)."""
    g = _gcols(group_cols)
    ecc = eccentricity(distances, g)
    return ecc.groupBy(*g).agg(
        F.max("eccentricity").alias("diameter"),
        F.min("eccentricity").alias("radius"),
    )


def closeness_centrality(
    distances: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """G7 — closeness = (reachable−1)/Σdist per root
    (doc/manuscript.md:199-215 family)."""
    g = _gcols(group_cols)
    return distances.groupBy(*g, F.col("root").alias("node")).agg(
        F.round(
            (F.count(F.lit(1)) - 1) / F.sum("dist"), 6
        ).alias("closeness")
    )


def mean_distance(distances: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """G5 — mean shortest-path length (bin/CompareNetworkGroups.R:121-122)."""
    g = _gcols(group_cols)
    pos = distances.filter(F.col("dist") > 0)
    return pos.groupBy(*g).agg(F.round(F.avg("dist"), 6).alias("mean_distance"))


# --------------------------------------------------------------------------
# G11 — community detection (label propagation) + modularity
# --------------------------------------------------------------------------


def label_propagation(
    edges: DataFrame, group_cols: list[str] | None = None, max_iter: int = 10
) -> DataFrame:
    """Community detection via synchronous label propagation — the
    scalable analog of walktrap/fastgreedy (bin/CompareNetworkGroups.R:66-69;
    semantic difference documented in SURVEY §2.10 G11).

    Deterministic: ties broken by (count desc, label asc); synchronous
    updates with min-label seeds.
    """
    g = _gcols(group_cols)
    und = symmetrize(edges, g)
    labels = (
        und.select(*g, F.col("src").alias("node"))
        .distinct()
        .withColumn("community", F.col("node"))
    )
    und = _checkpoint(und)  # see eigenvector note: freeze upstream DAG
    with _loop_shuffle_width(und):
        for _ in range(max_iter):
            votes = (
                und.join(labels.withColumnRenamed("node", "src"), [*g, "src"])
                .groupBy(*g, F.col("dst").alias("node"), "community")
                .agg(F.count(F.lit(1)).alias("_votes"))
            )
            w = W.partitionBy(*g, "node").orderBy(F.desc("_votes"), F.asc("community"))
            winner = (
                votes.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(*g, "node", "community")
            )
            prev, labels = labels, _checkpoint(winner)
            _release(prev)
    return labels


def modularity(
    edges: DataFrame,
    communities: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Newman modularity Q = Σ_c [ e_c/m − (d_c/2m)² ] as a pure
    aggregation over the undirected edge list (igraph::modularity,
    bin/TriadicClosures.R:58-61)."""
    g = _gcols(group_cols)
    und = symmetrize(edges, g)  # both directions present
    lab = communities.select(*g, "node", "community")
    e = (
        und.join(lab.withColumnRenamed("node", "src").withColumnRenamed("community", "_cs"), [*g, "src"])
        .join(lab.withColumnRenamed("node", "dst").withColumnRenamed("community", "_cd"), [*g, "dst"])
    )
    m2 = e.groupBy(*g).agg(F.count(F.lit(1)).alias("_m2"))  # 2m directed-half-edges
    intra = (
        e.filter(F.col("_cs") == F.col("_cd"))
        .groupBy(*g, F.col("_cs").alias("community"))
        .agg(F.count(F.lit(1)).alias("_e_c2"))
    )
    deg = e.groupBy(*g, F.col("_cs").alias("community")).agg(
        F.count(F.lit(1)).alias("_d_c")
    )
    per_c = deg.join(intra, [*g, "community"], "left").fillna(0, subset=["_e_c2"])
    per_c = per_c.join(m2, g) if g else per_c.crossJoin(m2)
    q = per_c.withColumn(
        "_q_c",
        F.col("_e_c2") / F.col("_m2") - (F.col("_d_c") / F.col("_m2")) ** 2,
    )
    return q.groupBy(*g).agg(F.round(F.sum("_q_c"), 6).alias("modularity"))


def greedy_modularity(
    edges: DataFrame,
    group_cols: list[str] | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact-style greedy modularity maximization (Clauset-Newman-Moore
    agglomeration) per group — the small-graph fallback the reference
    reaches for with igraph walktrap/fastgreedy
    (bin/CompareNetworkGroups.R:66-69, bin/TriadicClosures.R:58-61).

    Scale regime: each GROUP's subgraph is merged greedily inside one
    applyInPandas task (CNM heap, O(m log² n) per group), so thousands
    of per-sample subgraphs still run as ONE Spark job — but a single
    group must fit one task (the reference's use case: per-study
    networks of 10²-10³ nodes). For one big graph use
    label_propagation, the O(supersteps) scale path.

    Deterministic: ΔQ ties break on the lexicographically smallest
    community pair; community ids are each community's minimum node id.
    Returns (group_cols..., node, community, modularity) — modularity is
    the final Q of the group's partition (same value the modularity()
    aggregate computes for these labels).
    """
    import heapq

    import pandas as pd

    g = _gcols(group_cols)
    und = symmetrize(edges, g)
    has_w = weight_col and weight_col in und.columns
    if not g:
        und = und.withColumn("_g", F.lit(1))
        g_eff = ["_g"]
    else:
        g_eff = g
    out_schema = (
        ", ".join(f"{c} string" for c in g_eff)
        + ", node string, community string, modularity double"
    )

    def _cnm(pdf: pd.DataFrame) -> pd.DataFrame:
        # one undirected edge per (src<dst) pair; symmetrize emitted both
        w_ser = pdf[weight_col] if has_w else [1.0] * len(pdf)
        wmap: dict[tuple[str, str], float] = {}
        for s, d, wv in zip(pdf["src"], pdf["dst"], w_ser):
            s, d = str(s), str(d)
            if s < d:
                wmap[(s, d)] = float(wv)
        nodes = sorted({n for p in wmap for n in p} | set(map(str, pdf["src"])))
        if not wmap:
            rows = {c: [str(pdf[c].iloc[0])] * len(nodes) for c in g_eff}
            rows["node"] = nodes
            rows["community"] = nodes
            rows["modularity"] = [0.0] * len(nodes)
            return pd.DataFrame(rows)
        two_m = 2.0 * sum(wmap.values())
        # e[i][j]: fraction of edge weight between communities (symmetric,
        # both directions summed → w/(2m) per direction)
        e: dict[str, dict[str, float]] = {n: {} for n in nodes}
        a: dict[str, float] = {n: 0.0 for n in nodes}
        for (s, d), wv in wmap.items():
            f_ = wv / two_m
            e[s][d] = e[s].get(d, 0.0) + f_
            e[d][s] = e[d].get(s, 0.0) + f_
            a[s] += f_
            a[d] += f_
        members: dict[str, list[str]] = {n: [n] for n in nodes}
        q = -sum(v * v for v in a.values())  # Σ e_ii − a_i², e_ii = 0
        stamp: dict[str, int] = {n: 0 for n in nodes}
        heap: list[tuple[float, str, str, int, int]] = []
        for i in nodes:
            for j, f_ in e[i].items():
                if i < j:
                    dq = 2.0 * (f_ - a[i] * a[j])
                    heapq.heappush(heap, (-dq, i, j, 0, 0))
        while heap:
            ndq, i, j, si, sj = heapq.heappop(heap)
            if stamp.get(i) != si or stamp.get(j) != sj:
                continue  # stale entry
            if -ndq <= 1e-15:
                break
            # merge j into i
            q += -ndq
            for n_, f_ in e[j].items():
                if n_ == i:
                    continue
                e[i][n_] = e[i].get(n_, 0.0) + f_
                e[n_][i] = e[i][n_]
                del e[n_][j]
            e[i].pop(j, None)
            a[i] += a[j]
            members[i].extend(members.pop(j))
            del e[j], a[j], stamp[j]
            stamp[i] = si + 1
            for n_, f_ in e[i].items():
                lo, hi = (i, n_) if i < n_ else (n_, i)
                dq = 2.0 * (f_ - a[i] * a[n_])
                heapq.heappush(heap, (-dq, lo, hi, stamp[lo], stamp[hi]))
        rows: dict[str, list] = {c: [] for c in g_eff}
        out_nodes: list[str] = []
        out_comm: list[str] = []
        gvals = [str(pdf[c].iloc[0]) for c in g_eff]
        for root, ms in members.items():
            label = min(ms)
            for n_ in ms:
                out_nodes.append(n_)
                out_comm.append(label)
        for c, v in zip(g_eff, gvals):
            rows[c] = [v] * len(out_nodes)
        rows["node"] = out_nodes
        rows["community"] = out_comm
        rows["modularity"] = [round(q, 6)] * len(out_nodes)
        return pd.DataFrame(rows)

    res = und.groupBy(*g_eff).applyInPandas(_cnm, schema=out_schema)
    return res.select(*g, "node", "community", "modularity")


# --------------------------------------------------------------------------
# G13 — robustness via random edge removal
# --------------------------------------------------------------------------


def sample_edges(edges: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Noise-injection edge sampling (NetSwan robustness,
    bin/error_interpersonaldiversity.R:62-66): keep `fraction` of edges,
    deterministic per seed. Rerun any kernel on the result.

    Hash-filter Bernoulli sample: keep an edge iff the 60-bit md5 of
    (src, dst, seed) falls below fraction·2^60. Unlike df.sample — whose
    draw sequence depends on partition layout, so a repartition or AQE
    re-plan silently changes the sample — the keep decision is a pure
    function of the row: partition-invariant at any cluster width and
    reproducible in any md5-capable engine (the DuckDB oracle replays it).
    """
    key = F.concat_ws("|", F.col("src"), F.col("dst"), F.lit(str(seed)))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return edges.filter(h < int(fraction * (1 << 60)))


# --------------------------------------------------------------------------
# G7/G8 — betweenness & alpha centrality (grouped per-subgraph solvers)
# --------------------------------------------------------------------------


def betweenness_centrality(
    edges: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Exact Brandes betweenness per subgraph (igraph::betweenness,
    bin/alteredDiet.R:127-131; formula doc/manuscript.md:199-215).

    Brandes is O(VE) with sequential dependency accumulation — not
    shuffle-decomposable. The reference runs it driver-side on collected
    subgraphs; here each GROUP's subgraph runs inside applyInPandas, so
    thousands of per-sample graphs compute in parallel across executors
    and only the per-group edge list (tiny, SURVEY §6: ≤~40k edges) is
    ever materialized in one place. For one global giant graph, use
    sampled-source approximation: pass a pre-filtered edge set.
    """
    import pandas as pd

    g = _gcols(group_cols)
    und = symmetrize(edges, g)
    if not g:
        und = und.withColumn("_g", F.lit(1))
        g_eff = ["_g"]
    else:
        g_eff = g
    out_schema = (
        ", ".join(f"{c} string" for c in g_eff)
        + ", node string, betweenness double"
    )

    def _brandes(pdf: pd.DataFrame) -> pd.DataFrame:
        from collections import deque

        adj: dict[str, list[str]] = {}
        # str() the node values: the declared schema says node string,
        # and Arrow rejects an int64 column against it
        for s, d in zip(pdf["src"], pdf["dst"]):
            adj.setdefault(str(s), []).append(str(d))
        nodes = list(adj.keys())
        bc = dict.fromkeys(nodes, 0.0)
        for s in nodes:
            # single-source shortest-path counts
            dist = {s: 0}
            sigma = {s: 1.0}
            order = []
            preds: dict[str, list[str]] = {s: []}
            q = deque([s])
            while q:
                v = q.popleft()
                order.append(v)
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        preds[w] = []
                        sigma[w] = 0.0
                        q.append(w)
                    if dist[w] == dist[v] + 1:
                        sigma[w] += sigma[v]
                        preds[w].append(v)
            delta = dict.fromkeys(order, 0.0)
            for w in reversed(order):
                for v in preds[w]:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
                if w != s:
                    bc[w] += delta[w]
        rows = {c: [str(pdf[c].iloc[0])] * len(nodes) for c in g_eff}
        rows["node"] = nodes
        # undirected: every pair counted from both endpoints → halve
        rows["betweenness"] = [bc[n] / 2.0 for n in nodes]
        return pd.DataFrame(rows)

    res = und.groupBy(*g_eff).applyInPandas(_brandes, schema=out_schema)
    return res.select(*g, "node", F.round("betweenness", 6).alias("betweenness"))


def _stratified_quota(n_pivots: int, comp_size: int, n_nodes: int) -> int:
    """Per-component pivot quota for stratified sampling: proportional
    share of the budget, at least 1 (every component must be covered —
    a component with zero pivots contributes exactly zero to the
    estimate no matter how central its nodes are).  One definition for
    the local and distributed paths."""
    return max(1, (n_pivots * comp_size) // n_nodes)


def _pivot_brandes_local(
    und: DataFrame,
    n_pivots: int | None,
    max_depth: int,
    stratify_components: bool = False,
) -> DataFrame:
    """Small-graph fast path for approx_betweenness: the SAME
    pivot-restricted truncated Brandes (same md5-ordered pivot set, same
    V/k scaling, same max_depth BFS cap) computed inside ONE
    applyInPandas task instead of 2·diameter shuffle supersteps — at
    small scale the per-superstep job overhead dominates wall-clock by
    >10× (r01 verdict: 189 s at sf0.01 vs seconds exact). Numerically
    identical to the distributed path on the same input."""
    import hashlib

    import pandas as pd

    def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
        from collections import deque

        adj: dict[str, list[str]] = {}
        for s, d in zip(pdf["src"], pdf["dst"]):
            adj.setdefault(str(s), []).append(str(d))
        nodes = list(adj.keys())
        pivot_scale: dict[str, float] = {}
        if n_pivots is None or n_pivots >= len(nodes):
            pivots, scale = nodes, 1.0
        elif stratify_components:
            # per-component proportional quotas (same rule as the
            # distributed path: _stratified_quota + md5 order within
            # the component); scale_c = V_c / k_c per pivot
            seen: set[str] = set()
            comps: list[list[str]] = []
            for n0 in nodes:
                if n0 in seen:
                    continue
                comp = []
                q0 = deque([n0])
                seen.add(n0)
                while q0:
                    v = q0.popleft()
                    comp.append(v)
                    for w in adj[v]:
                        if w not in seen:
                            seen.add(w)
                            q0.append(w)
                comps.append(comp)
            pivots = []
            for comp in comps:
                k_c = min(len(comp), _stratified_quota(n_pivots, len(comp), len(nodes)))
                chosen = sorted(
                    comp, key=lambda n: hashlib.md5(n.encode()).hexdigest()
                )[:k_c]
                for p in chosen:
                    pivot_scale[p] = len(comp) / k_c
                pivots.extend(chosen)
            scale = 1.0
        else:
            pivots = sorted(
                nodes, key=lambda n: hashlib.md5(n.encode()).hexdigest()
            )[:n_pivots]
            scale = len(nodes) / n_pivots
        bc = dict.fromkeys(nodes, 0.0)
        for s in pivots:
            dist = {s: 0}
            sigma = {s: 1.0}
            order = []
            preds: dict[str, list[str]] = {s: []}
            q = deque([s])
            while q:
                v = q.popleft()
                order.append(v)
                if dist[v] >= max_depth:
                    continue
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        preds[w] = []
                        sigma[w] = 0.0
                        q.append(w)
                    if dist[w] == dist[v] + 1:
                        sigma[w] += sigma[v]
                        preds[w].append(v)
            delta = dict.fromkeys(order, 0.0)
            s_scale = pivot_scale.get(s, 1.0)
            for w in reversed(order):
                for v in preds[w]:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
                if w != s:
                    bc[w] += delta[w] * s_scale
        return pd.DataFrame(
            {
                "node": nodes,
                "betweenness": [bc[n] * scale / 2.0 for n in nodes],
            }
        )

    # round JVM-side so HALF_UP semantics match the distributed path
    return (
        und.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            lambda pdf: _solve(pdf), schema="node string, betweenness double"
        )
        .select("node", F.round("betweenness", 6).alias("betweenness"))
    )


def approx_betweenness(
    edges: DataFrame,
    n_pivots: int | None = 64,
    max_depth: int = 20,
    local_cutoff: int = 8192,
    stratify_components: bool = False,
) -> DataFrame:
    """Distributed Brandes betweenness with pivot sampling — the 100 TB
    path for ONE giant graph (SURVEY §7 risk register: exact Brandes is
    O(VE) and the per-subgraph applyInPandas solver above requires a
    group's edges to fit on one executor).

    Level-synchronous Brandes over DataFrames, all pivots jointly:
    forward multi-source BFS accumulating shortest-path counts σ per
    (pivot, node), then backward dependency accumulation
    δ(v) += σv/σw·(1+δw) one depth level at a time. 2·diameter shuffle
    supersteps total, independent of pivot count. Pivots are the first
    `n_pivots` nodes in deterministic md5 order (None → every node →
    EXACTLY Brandes); sampled runs scale by V/|pivots| (Brandes-Pich
    estimator) so values are unbiased estimates of the exact ones.
    Undirected semantics (symmetrized, halved) matching
    betweenness_centrality.

    Graphs with ≤ local_cutoff nodes short-circuit to a numerically
    identical single-task solve (_pivot_brandes_local): at small scale
    the fixed cost of ~2·diameter shuffle supersteps dominates, and the
    whole edge list fits one executor comfortably. Set local_cutoff=0 to
    force the superstep path (e.g. for plan testing).

    `stratify_components=True` allocates the pivot budget
    proportionally across connected components (≥1 per component, md5
    order WITHIN each component) and scales each pivot's dependencies
    by its own component's V_c/k_c instead of the global V/k.  Shortest
    paths never cross components, so global sampling has a structural
    failure mode on fragmented graphs: a component that catches zero
    pivots contributes EXACTLY ZERO to the estimate regardless of its
    true centrality mass.  Stratification removes that failure mode by
    construction (every component is covered) and the cross-component
    variance with it; within-component variance remains.  Measured on
    the fragmented sf0.1 nation-0 subgraph (831 nodes, 31 components):
    max rel err 1.10 → 0.52 at 32 pivots, 0.29 → 0.17 at 128, with the
    exact top-10 recovered at 128 stratified vs 256 global.  Costs one
    connected_components pass; the realized pivot count can exceed
    n_pivots by up to the component count.  Reduces exactly to Brandes
    when the budget covers every node, and the local/superstep paths
    stay numerically identical."""
    und = symmetrize(edges)
    all_nodes = und.select(F.col("src").alias("node")).distinct()
    n_nodes = all_nodes.count()
    if n_nodes <= local_cutoff:
        return _pivot_brandes_local(und, n_pivots, max_depth, stratify_components)
    root_scale = None  # per-root scale frame (stratified mode only)
    if n_pivots is None or n_pivots >= n_nodes:
        roots = all_nodes.select(F.col("node").alias("root"))
        scale = 1.0
    elif stratify_components:
        comp = connected_components(und)
        sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("_vc"))
        quota = F.greatest(
            F.lit(1), F.floor(F.lit(n_pivots) * F.col("_vc") / F.lit(n_nodes))
        )
        ranked = (
            comp.join(sizes.withColumn("_kc", quota), "component")
            .withColumn(
                "_rn",
                F.row_number().over(
                    W.partitionBy("component").orderBy(F.md5(F.col("node")))
                ),
            )
            .filter(F.col("_rn") <= F.col("_kc"))
        )
        root_scale = _checkpoint(
            ranked.select(
                F.col("node").alias("root"),
                (F.col("_vc") / F.least(F.col("_kc"), F.col("_vc"))).alias("_scale"),
            )
        )
        roots = root_scale.select("root")
        scale = 1.0
    else:
        roots = (
            all_nodes.select(F.col("node").alias("root"))
            .orderBy(F.md5(F.col("root")))
            .limit(n_pivots)
        )
        scale = n_nodes / n_pivots

    und = _checkpoint(und)
    visited = _checkpoint(
        roots.select(
            "root", F.col("root").alias("node"), F.lit(0).alias("dist"),
            F.lit(1.0).alias("sigma"),
        )
    )
    frontier = visited
    with _loop_shuffle_width(und):
        # forward: BFS + σ accumulation (σ flows only level d-1 → d)
        prev_new = None  # the checkpoint backing the current frontier
        for depth in range(1, max_depth + 1):
            contrib = (
                frontier.join(und.withColumnRenamed("src", "node"), "node")
                .groupBy("root", F.col("dst").alias("node"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            new = _checkpoint(
                contrib.join(
                    visited.select("root", "node"), ["root", "node"], "left_anti"
                ).withColumn("dist", F.lit(depth))
            )
            if new.limit(1).count() == 0:
                break
            prev_visited = visited
            visited = _checkpoint(visited.unionByName(new.select(*visited.columns)))
            # superseded: prev_visited is folded into the new union, and
            # the checkpoint backing the old frontier had its last read
            # in this superstep's contrib join (the final visited is NOT
            # released — the backward pass reads it level by level)
            _release(prev_visited, prev_new)
            prev_new = new
            frontier = new.select(*visited.columns)

        d_max = visited.agg(F.max("dist")).first()[0]
        # backward: δ accumulation, deepest level first
        delta_next = None  # rows of level d+1: (root, node, sigma, delta)
        bc_levels = []
        for depth in range(d_max, 0, -1):
            level = visited.filter(F.col("dist") == depth)
            if delta_next is None:
                level = level.withColumn("delta", F.lit(0.0))
            else:
                w_side = delta_next.select(
                    "root",
                    F.col("node").alias("dst"),
                    F.col("sigma").alias("sigma_w"),
                    F.col("delta").alias("delta_w"),
                )
                up = (
                    level.join(und.withColumnRenamed("src", "node"), "node")
                    .join(w_side, ["root", "dst"])
                    .groupBy("root", "node", "sigma", "dist")
                    .agg(
                        F.sum(
                            F.col("sigma") / F.col("sigma_w") * (1 + F.col("delta_w"))
                        ).alias("delta")
                    )
                )
                level = up.unionByName(
                    level.join(up.select("root", "node"), ["root", "node"], "left_anti")
                    .withColumn("delta", F.lit(0.0))
                    .select(*up.columns)
                )
            level = _checkpoint(level)
            bc_levels.append(level.select("root", "node", "delta"))
            delta_next = level

    if not bc_levels:  # pivot set reached nothing (edgeless graph)
        return all_nodes.withColumn("betweenness", F.lit(0.0))
    acc = bc_levels[0]
    for lv in bc_levels[1:]:
        acc = acc.unionByName(lv)
    acc = acc.filter(F.col("node") != F.col("root"))
    if root_scale is not None:
        # stratified: each pivot's dependencies scale by its OWN
        # component's V_c/k_c (the roots table is ≤ n_pivots +
        # n_components rows, keyed exactly on acc's root column)
        acc = acc.join(root_scale, "root").withColumn(
            "delta", F.col("delta") * F.col("_scale")
        )
    return (
        acc.groupBy("node")
        .agg(F.round(F.sum("delta") * scale / 2.0, 6).alias("betweenness"))
        .join(all_nodes, "node", "right")
        .fillna(0.0, subset=["betweenness"])
    )


def alpha_centrality(
    edges: DataFrame,
    alpha: float = 0.1,
    group_cols: list[str] | None = None,
    weight_col: str | None = None,
    cap_alpha: bool = False,
) -> DataFrame:
    """Alpha (Katz-Bonacich) centrality x = (I − αAᵀ)⁻¹·e per subgraph
    (igraph::alpha_centrality, bin/compareTwins.R:95-97;
    bin/CompareNetworkGroups.R:123-124). Per-group dense solve inside
    applyInPandas — same distribution argument as betweenness.

    cap_alpha=True clamps α per subgraph to 0.5/max_row_sum(|A|) — the
    Gershgorin bound on λ₁ of the (possibly weighted) adjacency — so
    (I − αAᵀ) stays nonsingular for every group at any data scale,
    without a driver-side pass to find the global max degree."""
    import numpy as np
    import pandas as pd

    g = _gcols(group_cols)
    und = symmetrize(edges, g)
    has_w = weight_col and weight_col in und.columns
    if not g:
        und = und.withColumn("_g", F.lit(1))
        g_eff = ["_g"]
    else:
        g_eff = g
    out_schema = (
        ", ".join(f"{c} string" for c in g_eff) + ", node string, alpha_centrality double"
    )

    def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
        # str() node ids up front: the declared schema says node string,
        # and Arrow rejects an int64 column against it
        nodes = sorted({str(v) for v in pdf["src"]} | {str(v) for v in pdf["dst"]})
        idx = {n: i for i, n in enumerate(nodes)}
        n = len(nodes)
        A = np.zeros((n, n))
        w = pdf[weight_col] if has_w else [1.0] * len(pdf)
        for s, d, wv in zip(pdf["src"], pdf["dst"], w):
            A[idx[str(d)], idx[str(s)]] = float(wv)  # transpose: incoming influence
        a_eff = alpha
        if cap_alpha:
            row_sum = np.abs(A).sum(axis=1).max()
            if row_sum > 0:
                a_eff = min(alpha, 0.5 / float(row_sum))
        x = np.linalg.solve(np.eye(n) - a_eff * A, np.ones(n))
        rows = {c: [str(pdf[c].iloc[0])] * n for c in g_eff}
        rows["node"] = nodes
        rows["alpha_centrality"] = x.tolist()
        return pd.DataFrame(rows)

    res = und.groupBy(*g_eff).applyInPandas(_solve, schema=out_schema)
    return res.select(*g, "node", F.round("alpha_centrality", 6).alias("alpha_centrality"))
