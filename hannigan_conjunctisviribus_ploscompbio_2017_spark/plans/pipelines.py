"""End-to-end analysis pipelines (SURVEY §3 — the reference's entry
points as single Catalyst DAGs).

Entry point A (bin/interpersonaldiversity.R in /root/reference): the
reference splits this across Neo4j (Cypher over REST) and single-threaded
R; here it is ONE lazy plan from the edge tables to the final statistics
table — Catalyst optimizes across every stage boundary, and only the
final small stats frame ever reaches the driver.

Stage trace (reference line cites):
 1. Q5 sample-network join (bin/interpersonaldiversity.R:18-36)
 2. length-normalize abundances — F6 (:41-42)
 3. anti-filter removal list — P8 (:49-53)
 4. rarefaction depth = min per-sample total — A7 (:56-57)
 5. seeded per-sample rarefaction — M1 (:60-76)
 6. log10 edge weight — F7 (:78)
 7. per-sample eigenvector centrality — G6, ALL samples jointly (:98-114)
 8. sample×node centrality matrix — R2 (:116-120)
 9. Bray-Curtis sample distances — M2 (:122)
10. intra/inter-class labeling — F8 (:130) + grouped means (:132-147)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hannigan_conjunctisviribus_ploscompbio_2017_spark.functions.scalar import edge_weight, length_normalize
from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.kernels import eigenvector_centrality
from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.relational import anti_filter
from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.stats import bray_curtis, rarefy


def interpersonal_diversity(
    sample_edges: DataFrame,
    node_lengths: DataFrame | None = None,
    removal_list: DataFrame | None = None,
    sample_class: DataFrame | None = None,
    seed: int = 42,
    eigen_iter: int = 12,
) -> dict[str, DataFrame]:
    """The full interpersonal-diversity analysis.

    Inputs:
      sample_edges: (sample, phage, host, phage_abundance, host_abundance)
                    — the Q5 output (plans.queries.q5_sample_network or a
                    testdata instantiation).
      node_lengths: optional (id, length) for F6 normalization.
      removal_list: optional (phage,) anti-filter list.
      sample_class: optional (sample, cls) grouping for the final stats.

    Returns dict of lazy DataFrames:
      rarefied   — per (sample, phage) rarefied abundances
      centrality — per (sample, node) eigenvector centrality
      distances  — per (sample_a, sample_b) Bray-Curtis + class label
      stats      — per class-pair mean/stddev distance
    """
    e = sample_edges
    # 2. length-normalize phage abundance (F6)
    if node_lengths is not None:
        ln = node_lengths.select(F.col("id").alias("phage"), "length")
        e = (
            e.join(F.broadcast(ln), "phage", "left")
            .withColumn(
                "phage_abundance",
                length_normalize("phage_abundance", F.coalesce("length", F.lit(1000)))
                .cast("long"),
            )
            .drop("length")
        )
    # 3. anti-filter (P8)
    if removal_list is not None:
        e = anti_filter(e, removal_list, "phage")

    # 4-5. rarefy per-sample phage abundances to the global min depth (A7+M1)
    ab = e.select("sample", "phage", "phage_abundance").dropDuplicates(
        ["sample", "phage"]
    )
    depth_row = (
        ab.groupBy("sample")
        .agg(F.sum("phage_abundance").alias("t"))
        .agg(F.min("t").alias("depth"))
        .collect()[0]
    )
    depth = int(depth_row["depth"])
    rarefied = rarefy(ab, "sample", "phage", "phage_abundance", depth=depth, seed=seed)

    # 6. weighted per-sample interaction graph (F7): join rarefied phage
    # abundance back to the host side of each edge
    weighted = (
        e.select("sample", "phage", "host", "host_abundance")
        .join(rarefied, ["sample", "phage"])
        .withColumn(
            "weight",
            edge_weight(F.col("phage_abundance") + 1, F.col("host_abundance") + 1),
        )
        .select("sample", F.col("phage").alias("src"), F.col("host").alias("dst"), "weight")
    )

    # 7. eigenvector centrality for EVERY per-sample subgraph in one job (G6)
    centrality = eigenvector_centrality(
        weighted, group_cols=["sample"], weight_col="weight", max_iter=eigen_iter
    )

    # 8-9. Bray-Curtis over the sample×node centrality vectors (R2+M2):
    # bray_curtis consumes the long form directly — the pivot matrix is
    # implicit (sparse), never materialized densely.
    distances = bray_curtis(centrality, "sample", "node", "centrality")

    # 10. class labeling + grouped stats (F8 + A2)
    if sample_class is not None:
        ca = sample_class.select(F.col("sample").alias("sample_a"), F.col("cls").alias("_ca"))
        cb = sample_class.select(F.col("sample").alias("sample_b"), F.col("cls").alias("_cb"))
        distances = (
            distances.join(F.broadcast(ca), "sample_a")
            .join(F.broadcast(cb), "sample_b")
            .withColumn(
                "pair_class",
                F.when(F.col("_ca") == F.col("_cb"), "intra").otherwise("inter"),
            )
            .drop("_ca", "_cb")
        )
        stats = distances.groupBy("pair_class").agg(
            F.round(F.avg("bray_curtis"), 6).alias("mean_distance"),
            F.round(F.stddev_pop("bray_curtis"), 6).alias("sd_distance"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    else:
        stats = distances.agg(
            F.round(F.avg("bray_curtis"), 6).alias("mean_distance"),
            F.round(F.stddev_pop("bray_curtis"), 6).alias("sd_distance"),
            F.count(F.lit(1)).alias("n_pairs"),
        )

    return {
        "rarefied": rarefied,
        "centrality": centrality,
        "distances": distances,
        "stats": stats,
    }
