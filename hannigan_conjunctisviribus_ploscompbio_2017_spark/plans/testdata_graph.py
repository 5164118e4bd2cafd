"""Adapter: driver testdata (TPC-H-ish star schema) → the engine's
property-graph tables, so the reference's graph query suite (SURVEY §2.9
Q1-Q7) runs against /root/testdata.

Mapping (bipartite interaction network + metadata dimensions, mirroring
the reference's Phage/Bacterial_Host/SampleID/Disease/StudyID/PatientID/
TimePoint model — SURVEY §1.1):

| reference          | testdata                                       |
|--------------------|------------------------------------------------|
| Phage              | part        (id 'P<p_partkey>')                |
| Bacterial_Host     | supplier    (id 'S<s_suppkey>')                |
| Infects edge       | lineitem (l_partkey → l_suppkey), scores =     |
|                    | avg quantity/extendedprice/discount/tax        |
| SampleID           | customer    (id 'C<c_custkey>')                |
| Sampled edge       | customer →{orders×lineitem}→ part / supplier,  |
|                    | abundance = sum(l_quantity)                    |
| Disease            | c_mktsegment ('D<mktsegment>')                 |
| StudyID            | region      (id 'R<r_regionkey>')              |
| PatientID          | nation      (id 'N<n_nationkey>')              |
| TimePoint          | o_orderpriority ('T<priority>')                |

The numeric 'gold label' analog: interaction = 1 when max(l_quantity) for
the pair > 45 (≈ top decile), else 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hannigan_conjunctisviribus_ploscompbio_2017_spark.schemas import load_table


def infects_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Infects edge table: one row per (part, supplier) pair with the four
    feature scores + gold label. This is the §2.9 feature-merge output
    (here the four 'score files' come from one fact table, so a single
    grouped aggregation replaces the full-outer cascade — same result, one
    shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.concat(F.lit("P"), F.col("l_partkey")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
        )
        .agg(
            F.round(F.avg("l_quantity"), 4).alias("crispr"),
            F.round(F.avg("l_extendedprice"), 4).alias("blast"),
            F.round(F.avg("l_discount"), 4).alias("blastx"),
            F.round(F.avg("l_tax"), 4).alias("pfam"),
            F.when(F.max("l_quantity") > 45, 1).otherwise(0).alias("interaction"),
        )
        .withColumn("type", F.lit("Infects"))
    )


def sampled_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled edges: customer → part and customer → supplier with
    abundance = sum(l_quantity)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey)
    # explode each fact row to BOTH dst keys before one groupBy: a
    # union of two independent groupBys would scan and join the fact
    # table twice (Catalyst does not share the subtree) — one pass,
    # one shuffle, identical per-key sums
    both = fact.select(
        F.concat(F.lit("C"), F.col("o_custkey")).alias("src"),
        F.explode(
            F.array(
                F.concat(F.lit("P"), F.col("l_partkey")),
                F.concat(F.lit("S"), F.col("l_suppkey")),
            )
        ).alias("dst"),
        "l_quantity",
    )
    return (
        both.groupBy("src", "dst")
        .agg(F.sum("l_quantity").cast("long").alias("abundance"))
        .withColumn("type", F.lit("Sampled"))
    )


def nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node table across all seven labels."""
    part = load_table(spark, sf_dir, "part").select(
        F.concat(F.lit("P"), F.col("p_partkey")).alias("id"),
        F.lit("Phage").alias("label"),
        F.col("p_name").alias("name"),
        F.col("p_size").cast("long").alias("length"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.concat(F.lit("S"), F.col("s_suppkey")).alias("id"),
        F.lit("Bacterial_Host").alias("label"),
        F.col("s_name").alias("name"),
        F.lit(None).cast("long").alias("length"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.concat(F.lit("C"), F.col("c_custkey")).alias("id"),
        F.lit("SampleID").alias("label"),
        F.col("c_name").alias("name"),
        F.lit(None).cast("long").alias("length"),
    )
    region = load_table(spark, sf_dir, "region").select(
        F.concat(F.lit("R"), F.col("r_regionkey")).alias("id"),
        F.lit("StudyID").alias("label"),
        F.col("r_name").alias("name"),
        F.lit(None).cast("long").alias("length"),
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.concat(F.lit("N"), F.col("n_nationkey")).alias("id"),
        F.lit("PatientID").alias("label"),
        F.col("n_name").alias("name"),
        F.lit(None).cast("long").alias("length"),
    )
    disease = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("name"))
        .distinct()
        .select(
            F.concat(F.lit("D"), F.col("name")).alias("id"),
            F.lit("Disease").alias("label"),
            F.col("name"),
            F.lit(None).cast("long").alias("length"),
        )
    )
    timepoint = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("name"))
        .distinct()
        .select(
            F.concat(F.lit("T"), F.col("name")).alias("id"),
            F.lit("TimePoint").alias("label"),
            F.col("name"),
            F.lit(None).cast("long").alias("length"),
        )
    )
    return (
        part.unionByName(supp)
        .unionByName(cust)
        .unionByName(region)
        .unionByName(nation)
        .unionByName(disease)
        .unionByName(timepoint)
    )
