"""Persistent graph store — the engine's replacement for the Neo4j store
directory (data/Databases/benchmark/neostore* in /root/reference).

Layout:
    <root>/nodes/    parquet, partitioned by label
    <root>/edges/    parquet, partitioned by type

Why this layout at 100 TB:
- **Partition pruning**: every §2.9 pattern query anchors on an edge type
  and/or node label (Infects / Sampled / Diseased...; Phage / SampleID).
  Partitioning on those columns turns each anchor into a directory prune —
  the Sampled scan never reads Infects bytes (the analog of Neo4j's
  per-label index, but free on read).
- **Sort-within-partitions by (src, dst)**: parquet min/max row-group
  stats make src-anchored point lookups skip row groups — the analog of
  the reference's label-as-name point index
  (bin/BenchmarkDatabaseCreation.pl:103-105).
- **Bucketing (optional, saveAsTable path)**: bucketBy(src) co-locates
  both sides of repeated src-keyed joins, removing the shuffle from the
  Q3/Q5 self-joins. Requires a metastore table rather than a raw path, so
  it's opt-in here.
- Writes are idempotent overwrite-by-partition: re-running a build stage
  replaces only the edge types it produced (dynamic partition overwrite),
  which is the engine's version of the reference's drop-and-rebuild —
  without dropping everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.graph_build import EDGE_COLS


def write_graph(
    nodes: DataFrame,
    edges: DataFrame,
    root: str,
    mode: str = "overwrite",
    dynamic_partitions: bool = True,
) -> None:
    """Persist the property graph partitioned by label/type, row-group
    sorted by the join keys.

    The partitionOverwriteMode conf is saved and RESTORED around the
    write: leaking 'dynamic' into the shared session would silently
    change unrelated overwrite-partitioned writes from replace-table to
    replace-matching-partitions semantics."""
    spark = nodes.sparkSession
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, None)
    try:
        if dynamic_partitions:
            spark.conf.set(conf_key, "dynamic")
        (
            nodes.repartition("label")
            .sortWithinPartitions("id")
            .write.mode(mode)
            .partitionBy("label")
            .parquet(f"{root}/nodes")
        )
        (
            edges.repartition("type")
            .sortWithinPartitions("src", "dst")
            .write.mode(mode)
            .partitionBy("type")
            .parquet(f"{root}/edges")
        )
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def read_graph(spark: SparkSession, root: str) -> tuple[DataFrame, DataFrame]:
    nodes = spark.read.parquet(f"{root}/nodes")
    edges = spark.read.parquet(f"{root}/edges")
    # conform column order (partition column comes back last)
    return nodes, edges.select(*EDGE_COLS)


def write_bucketed_edges(
    edges: DataFrame, table: str, buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Metastore-backed bucketed edge table: co-locates src-keyed joins
    (Q3 triadic self-join, Q5 sampled⋈infects) without a shuffle.
    Requires a warehouse dir; used on deployments, exercised in tests."""
    (
        edges.write.mode(mode)
        .bucketBy(buckets, "src")
        .sortBy("src", "dst")
        .format("parquet")
        .saveAsTable(table)
    )
