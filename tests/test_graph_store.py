"""Graph store: partition layout, pruning, roundtrip, bucketed join."""

from pyspark.sql import functions as F

from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators import graph_store as GS
from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.graph_build import (
    add_metadata_edges,
    build_infects_edges,
    build_nodes,
)
from hannigan_conjunctisviribus_ploscompbio_2017_spark.plans import testdata_graph as TG
from tests.conftest import SF0001


def _graph(spark):
    nodes = build_nodes([TG.nodes(spark, SF0001)], assert_unique=False)
    infects = TG.infects_edges(spark, SF0001)
    edges = build_infects_edges(
        infects.select("src", "dst", "interaction"),
        {c: infects.select("src", "dst", F.col(c).alias("score"))
         for c in ("crispr", "blast", "blastx", "pfam")},
    )
    return nodes, add_metadata_edges(edges, TG.sampled_edges(spark, SF0001))


def test_write_read_roundtrip(spark, tmp_path):
    nodes, edges = _graph(spark)
    root = str(tmp_path / "graph")
    GS.write_graph(nodes, edges, root)
    n2, e2 = GS.read_graph(spark, root)
    assert n2.count() == nodes.count()
    assert e2.count() == edges.count()
    # per-type counts survive
    a = {r.type: r.n for r in edges.groupBy("type").agg(F.count(F.lit(1)).alias("n")).collect()}
    b = {r.type: r.n for r in e2.groupBy("type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert a == b


def test_partition_pruning_on_type(spark, tmp_path):
    nodes, edges = _graph(spark)
    root = str(tmp_path / "graph")
    GS.write_graph(nodes, edges, root)
    _, e2 = GS.read_graph(spark, root)
    df = e2.filter(F.col("type") == "Sampled")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the type predicate must become a partition filter, not a data filter
    assert "PartitionFilters" in plan
    assert "type" in plan.split("PartitionFilters", 1)[1][:200]


def test_dynamic_partition_overwrite_preserves_other_types(spark, tmp_path):
    nodes, edges = _graph(spark)
    root = str(tmp_path / "graph")
    GS.write_graph(nodes, edges, root)
    # overwrite ONLY the Sampled partition with a 1-row table — the
    # incremental updater must opt into dynamic overwrite itself
    # (write_graph restores the session conf; it no longer leaks
    # 'dynamic' for later writes to silently inherit)
    one = edges.filter(F.col("type") == "Sampled").limit(1)
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        one.repartition("type").write.mode("overwrite").partitionBy("type").parquet(
            f"{root}/edges"
        )
    finally:
        spark.conf.unset(key) if prev is None else spark.conf.set(key, prev)
    _, e2 = GS.read_graph(spark, root)
    counts = {r.type: r.n for r in e2.groupBy("type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["Sampled"] == 1            # replaced
    assert counts["Infects"] > 1000          # untouched


def test_bucketed_edges_join_without_shuffle(spark, tmp_path):
    # warehouse dir is a static conf → uses the session default
    # (spark-warehouse under cwd, gitignored). The in-memory catalog
    # forgets tables between sessions but leaves the location dir, so
    # clear both.
    import shutil

    nodes, edges = _graph(spark)
    spark.sql("DROP TABLE IF EXISTS e_bucketed")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/e_bucketed", ignore_errors=True)
    GS.write_bucketed_edges(edges.filter(F.col("type") == "Infects"), "e_bucketed", buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-or-not decision (broadcast would hide it)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t = spark.table("e_bucketed")
        joined = t.alias("a").join(t.alias("b"), "src")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        # bucket co-location: the src-keyed self-join runs with NO
        # shuffle exchange (the whole point of bucketBy for Q3/Q5 joins)
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS e_bucketed")
