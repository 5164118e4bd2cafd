"""Canonical pattern-query suite Q1-Q7 (SURVEY §2.9) — the reference's
Cypher templates as parameterized DataFrame builders.

Each function takes the graph tables (nodes, edges) and returns a lazy
DataFrame; Catalyst fuses the multi-hop joins, pushes predicates into the
parquet scans, and broadcasts the metadata-dimension hops (Study/Disease/
Patient/TimePoint fan-out is tiny next to the Sampled/Infects fact edges).

Cypher sources cited per function are in /root/reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hannigan_conjunctisviribus_ploscompbio_2017_spark.functions.scalar import edge_weight, length_normalize

SCORE_COLS = ["interaction", "crispr", "blast", "blastx", "pfam"]


def _names(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    n = nodes.select("id", "name")
    return (
        edges.join(n.withColumnRenamed("name", "from_name"), edges.src == n.id)
        .drop("id")
        .join(
            nodes.select(F.col("id"), F.col("name").alias("to_name")),
            edges.dst == F.col("id"),
        )
        .drop("id")
    )


def q1_interaction_scores(
    edges: DataFrame, nodes: DataFrame, interaction: int | None = None
) -> DataFrame:
    """Q1 — full edge scan with score properties ± Interaction filter.
    Cypher at bin/CalculatePredModel.R:181-205, bin/PredictRelationships.R:52-61."""
    e = edges.filter(F.col("type") == "Infects")
    if interaction is not None:
        e = e.filter(F.col("interaction") == interaction)
    return _names(e, nodes).select("from_name", "to_name", *SCORE_COLS)


def q2_predicted_links(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Q2 — predicted-interaction scan projecting species
    (bin/GeneralNetworkProperties.R:95-99)."""
    e = edges.filter(
        (F.col("type") == "PredictedInteraction") & (F.col("prediction") == "Interacts")
    )
    n = nodes.select("id", "name", "species")
    return (
        e.join(n.select(F.col("id"), F.col("name").alias("from_name")), e.src == F.col("id"))
        .drop("id")
        .join(
            n.select(F.col("id"), F.col("species").alias("to_species")),
            e.dst == F.col("id"),
        )
        .drop("id")
        .select("from_name", "to_species")
    )


def q3_triadic_closure(
    edges: DataFrame, limit: int | None = 50_000, edge_type: str = "Infects"
) -> DataFrame:
    """Q3 — 2-hop co-target pairs: (n)-->(m)<--(k), n≠k, DISTINCT
    (bin/TriadicClosures.R:88-89; LIMIT 50000 in the reference).

    Scale: self-join on dst shuffles once on the shared-target key; skewed
    hub targets are split by AQE skew-join handling.
    """
    # both sides of the self-join derive e and Catalyst shares no
    # subtrees — one materialized pass of the (src, dst) projection
    # (r12 optimization round; same rationale + A/B as the testdata
    # gq3 entry: the edge projection is tiny next to the pair explosion)
    e = (
        edges.filter(F.col("type") == edge_type)
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    a, b = e.alias("a"), e.alias("b")
    # n != k (not <): the Cypher's symmetric MATCH emits BOTH (n,k) and
    # (k,n) — reference row counts and per-'from' degree tallies depend
    # on both orientations being present
    pairs = (
        a.join(b, F.col("a.dst") == F.col("b.dst"))
        .filter(F.col("a.src") != F.col("b.src"))
        .select(F.col("a.src").alias("n"), F.col("b.src").alias("k"))
        .distinct()
    )
    if limit is not None:  # not `if limit`: limit=0 means zero rows
        pairs = pairs.orderBy("n", "k").limit(limit)
    return pairs


def q4_study_network(edges: DataFrame, study: str) -> DataFrame:
    """Q4 — study-scoped sample-edge expansion
    (bin/VisGraphByGroup.R:52-62):
    (study)-->(sample)-[:Sampled]->(phage)-[:Infects]->(host)<-[:Sampled]-(sample2)<--(study)."""
    member = edges.filter(
        (F.col("type") == "IncludedInStudy") & (F.col("src") == study)
    ).select(F.col("dst").alias("sample"))
    sampled = edges.filter((F.col("type") == "Sampled") & (F.col("abundance") > 0))
    infects = edges.filter(F.col("type") == "Infects")
    # NB: the column is named "sample" — always address it via F.col();
    # DataFrame.sample is a method and attribute access returns it.
    s1 = sampled.join(F.broadcast(member), sampled.src == F.col("sample")).select(
        F.col("sample").alias("sample1"),
        F.col("dst").alias("phage"),
        F.col("abundance").alias("phage_abundance"),
    )
    hop = s1.join(infects.select(F.col("src").alias("phage"), F.col("dst").alias("host")), "phage")
    s2 = sampled.join(F.broadcast(member), sampled.src == F.col("sample")).select(
        F.col("sample").alias("sample2"),
        F.col("dst").alias("host"),
        F.col("abundance").alias("host_abundance"),
    )
    return hop.join(s2, "host").select(
        "sample1", "phage", "phage_abundance", "host", "sample2", "host_abundance"
    )


def q5_sample_network(
    edges: DataFrame,
    nodes: DataFrame,
    study: str | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Q5 — the flagship per-sample enriched network
    (bin/GetSkinGraphs.R:55-98; bin/interpersonaldiversity.R:18-36):
    study/patient anchors + phage & host abundances + lengths, DISTINCT,
    with length-normalized abundances (F6) and log10 edge weight (F7).
    """
    sampled = edges.filter((F.col("type") == "Sampled") & (F.col("abundance") > 0))
    infects = edges.filter(F.col("type") == "Infects")
    if study is not None:
        member = edges.filter(
            (F.col("type") == "IncludedInStudy") & (F.col("src") == study)
        ).select(F.col("dst").alias("_sample"))
        sampled = sampled.join(
            F.broadcast(member), sampled.src == F.col("_sample")
        ).drop("_sample")

    phage_ab = sampled.select(
        F.col("src").alias("sample"),
        F.col("dst").alias("phage"),
        F.col("abundance").alias("phage_abundance"),
    )
    host_ab = sampled.select(
        F.col("src").alias("sample"),
        F.col("dst").alias("host"),
        F.col("abundance").alias("host_abundance"),
    )
    lengths = nodes.select("id", "length")
    out = (
        phage_ab.join(
            infects.select(F.col("src").alias("phage"), F.col("dst").alias("host")),
            "phage",
        )
        .join(host_ab, ["sample", "host"])
        .join(
            F.broadcast(lengths.select(F.col("id"), F.col("length").alias("phage_length"))),
            F.col("phage") == F.col("id"),
            "left",
        )
        .drop("id")
        .join(
            F.broadcast(lengths.select(F.col("id"), F.col("length").alias("host_length"))),
            F.col("host") == F.col("id"),
            "left",
        )
        .drop("id")
        .distinct()
    )
    if normalize:
        # BOTH sides length-normalize (interpersonaldiversity.R:41-42
        # corrects PhageAbundance AND BacteriaAbundance), and the F7
        # edge weight is log10 of the NORMALIZED product (:78) — raw
        # abundances would put every downstream network statistic on a
        # different scale than the paper. (The reference computes the
        # weight after rarefaction; pipelines recompute it there — this
        # is the pre-rarefaction edge weight.)
        out = (
            out.withColumn(
                "phage_norm",
                length_normalize(
                    "phage_abundance", F.coalesce("phage_length", F.lit(1000))
                ),
            )
            .withColumn(
                "host_norm",
                length_normalize(
                    "host_abundance", F.coalesce("host_length", F.lit(1000))
                ),
            )
            .withColumn("weight", F.round(edge_weight("phage_norm", "host_norm"), 6))
        )
    return out


def q6_label_scan(nodes: DataFrame, label: str) -> DataFrame:
    """Q6 — node-label scan (bin/VisGraphByGroup.R:45-47)."""
    return nodes.filter(F.col("label") == label).select("name")


def q7_disease_scope(edges: DataFrame, disease: str, min_abundance: int = 0) -> DataFrame:
    """Q7 — disease-scoped 3-hop expansion with abundance predicate
    (bin/CompareNetworkGroups.R:147-201)."""
    diseased = edges.filter(
        (F.col("type") == "Diseased") & (F.col("src") == disease)
    ).select(F.col("dst").alias("sample"))
    sampled = edges.filter(
        (F.col("type") == "Sampled") & (F.col("abundance") > min_abundance)
    )
    infects = edges.filter(F.col("type") == "Infects")
    return (
        sampled.join(F.broadcast(diseased), sampled.src == F.col("sample"))
        .select("sample", F.col("dst").alias("n"))
        .join(infects.select(F.col("src").alias("n"), F.col("dst").alias("m")), "n")
        .select("sample", "n", "m")
    )
