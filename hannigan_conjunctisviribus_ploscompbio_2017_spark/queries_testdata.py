"""The driver-facing query inventory: every SURVEY §2 operator instantiated
against the driver testdata tables, each with a DuckDB oracle SQL twin.

Registry pattern: `@query(name, oracle=...)` adds a (spark, sf_dir) →
DataFrame builder to QUERIES and its oracle to ORACLES.  Builders with no
oracle (iterative graph kernels, seeded resampling, ML, streaming-stateful)
get the driver's weaker rows-only check.

Parity rules (driver hashes values order-insensitively, columns sorted by
name):
- alias every computed column identically on both sides;
- round float aggregates identically (4-6 dp) on both sides;
- cast counts to BIGINT on both sides;
- deterministic LIMIT only after a total ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hannigan_conjunctisviribus_ploscompbio_2017_spark.schemas import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# =========================================================================
# Aggregations (SURVEY §2.4)
# =========================================================================


@query(
    "a1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A6 — multi-agg group-by (the reference's per-cluster collapse
    family, bin/CollapseContigCounts.R:29 / bin/ClusterStats.R:19-21),
    TPC-H-Q1-shaped. Partial aggregation is map-side; one shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "a2_mean_score_per_pair",
    oracle="""
    SELECT l_partkey, l_suppkey, ROUND(AVG(l_extendedprice), 4) AS mean_score
    FROM lineitem GROUP BY l_partkey, l_suppkey
    """,
)
def a2_mean_score_per_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — collapse scores to pair mean (bin/CollapseGeneScores.R:38)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.avg("l_extendedprice"), 4).alias("mean_score")
    )


@query(
    "a3_min_score_per_pair",
    oracle="""
    SELECT l_partkey, l_suppkey, ROUND(MIN(l_extendedprice), 2) AS min_score
    FROM lineitem GROUP BY l_partkey, l_suppkey
    """,
)
def a3_min_score_per_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — group-by min 'low bitscore as feature'
    (bin/iteratePredictedRelationships.R:30-33)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.min("l_extendedprice"), 2).alias("min_score")
    )


@query(
    "a4_degree_count",
    oracle="""
    SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS degree
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    GROUP BY l_suppkey
    """,
)
def a4_degree_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/G1 — edges-per-node degree histogram source
    (bin/GetNetworkLinkCounts.R:80,101)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


@query(
    "a5_count_distinct",
    oracle="""
    SELECT o_custkey, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_custkey
    """,
)
def a5_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — group-by count distinct (bin/interpersonaldiversity.R:406-407)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
    )


@query(
    "a7_rarefaction_depth",
    oracle="""
    SELECT CAST(MIN(total) AS BIGINT) AS min_depth,
           CAST(COUNT(*) AS BIGINT) AS n_samples
    FROM (
      SELECT o_custkey, SUM(l_quantity) AS total
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_custkey
    )
    """,
)
def a7_rarefaction_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — rarefaction depth = min of per-sample totals
    (bin/interpersonaldiversity.R:56-57)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    sums = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("l_quantity").alias("total"))
    )
    return sums.agg(
        F.min("total").cast("long").alias("min_depth"),
        F.count(F.lit(1)).alias("n_samples"),
    )


@query(
    "a9_best_hit_dedup",
    oracle="""
    SELECT l_orderkey, l_partkey, l_extendedprice AS best_price
    FROM (
      SELECT l_orderkey, l_partkey, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def a9_best_hit_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/W2 — keep best hit per query (awk '!seen[$1$2]' on rank-sorted
    BLAST output, bin/AssembleBlastDistances.sh:42-46)."""
    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", F.col("l_extendedprice").alias("best_price"))
    )


@query(
    "a12_row_votes",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity + l_extendedprice + l_discount + l_tax, 4) AS votes
    FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def a12_row_votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — horizontal row sum (rowSums, bin/CalculateModelSpecSens.R:32)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag") == "A").select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_quantity") + F.col("l_extendedprice") + F.col("l_discount") + F.col("l_tax"),
            4,
        ).alias("votes"),
    )


# =========================================================================
# Filters / projections (SURVEY §2.2)
# =========================================================================


@query(
    "p3_p4_predicate_filters",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity > 30 AND l_returnflag = 'R' AND l_linestatus LIKE 'F%'
    """,
)
def p3_p4_predicate_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4 — numeric + equality + pattern predicates, pushed to the
    parquet scan (reference: toInt casts defeat Neo4j's index,
    bin/GetSkinGraphs.R:62-63 — typed schema makes pushdown automatic)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & (F.col("l_returnflag") == "R")
        & F.col("l_linestatus").startswith("F")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "p6_any_positive",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE GREATEST(l_discount, l_tax) > 0.07
    """,
)
def p6_any_positive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — row-anyhit filter (bin/PredictRelationships.R:68)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.greatest("l_discount", "l_tax") > 0.07).select(
        "l_orderkey", "l_linenumber"
    )


@query(
    "p7_length_range",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE LENGTH(p_name) BETWEEN 10 AND 20
    """,
)
def p7_length_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — length-window filter on sequences (bin/LengthFilterSeqs.pl:44-61)."""
    part = _t(spark, sf_dir, "part")
    return part.filter(F.length("p_name").between(10, 20)).select("p_partkey", "p_name")


@query(
    "p8_anti_filter",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 40)
    """,
)
def p8_anti_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — anti-filter by key list (bin/interpersonaldiversity.R:49-53)."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    removal = li.filter(F.col("l_quantity") > 40).select(
        F.col("l_partkey").alias("p_partkey")
    )
    return part.join(removal, "p_partkey", "left_anti").select("p_partkey", "p_name")


@query(
    "p9_semi_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O')
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 25)
    """,
)
def p9_semi_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — semi-filter by two keep-lists (bin/ApplySepAbund.R:38-39)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") < 25)
    return (
        li.join(orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_semi")
        .join(part.select(F.col("p_partkey").alias("l_partkey")), "l_partkey", "left_semi")
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )


# =========================================================================
# Joins (SURVEY §2.3)
# =========================================================================


@query(
    "j1_equi_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_name, s_name,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_size > 30
    """,
)
def j1_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — fact-dim equi-joins; dims broadcast (no shuffle of lineitem)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") > 30)
    supp = _t(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_name",
            "s_name",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
    )


@query(
    "j2_broadcast_annotate",
    oracle="""
    SELECT c_custkey, COALESCE(n_name, 'NoClusterPhage') AS cluster
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey AND n_regionkey < 4
    """,
)
def j2_broadcast_annotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — broadcast annotation with miss-default (awk map join +
    NoClusterPhage fallback, bin/ClusterContigScores.sh:29-35)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") < 4)
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("n_name"), F.lit("NoClusterPhage")).alias("cluster"),
        )
    )


@query(
    "j3_feature_merge",
    oracle="""
    WITH crispr AS (
      SELECT l_partkey AS src, l_suppkey AS dst, ROUND(AVG(l_quantity), 4) AS crispr
      FROM lineitem WHERE l_linenumber = 1 GROUP BY 1, 2
    ), blast AS (
      SELECT l_partkey AS src, l_suppkey AS dst, ROUND(AVG(l_extendedprice), 4) AS blast
      FROM lineitem WHERE l_linenumber = 2 GROUP BY 1, 2
    ), blastx AS (
      SELECT l_partkey AS src, l_suppkey AS dst, ROUND(AVG(l_discount), 4) AS blastx
      FROM lineitem WHERE l_linenumber = 3 GROUP BY 1, 2
    ), pfam AS (
      SELECT l_partkey AS src, l_suppkey AS dst, ROUND(AVG(l_tax), 4) AS pfam
      FROM lineitem WHERE l_linenumber = 4 GROUP BY 1, 2
    )
    SELECT COALESCE(crispr.src, blast.src, blastx.src, pfam.src) AS src,
           COALESCE(crispr.dst, blast.dst, blastx.dst, pfam.dst) AS dst,
           COALESCE(crispr.crispr, 0.0) AS crispr,
           COALESCE(blast.blast, 0.0) AS blast,
           COALESCE(blastx.blastx, 0.0) AS blastx,
           COALESCE(pfam.pfam, 0.0) AS pfam
    FROM crispr
    FULL OUTER JOIN blast  ON crispr.src = blast.src AND crispr.dst = blast.dst
    FULL OUTER JOIN blastx ON COALESCE(crispr.src, blast.src) = blastx.src
                          AND COALESCE(crispr.dst, blast.dst) = blastx.dst
    FULL OUTER JOIN pfam   ON COALESCE(crispr.src, blast.src, blastx.src) = pfam.src
                          AND COALESCE(crispr.dst, blast.dst, blastx.dst) = pfam.dst
    """,
)
def j3_feature_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — the §2.9 edge build: full-outer merge of 4 per-feature score
    tables on (src, dst) + fillna(0)
    (bin/iteratePredictedRelationships.R:50-52). Uses the engine's
    feature_merge operator."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.relational import feature_merge

    li = _t(spark, sf_dir, "lineitem")

    def score(line: int, col: str) -> DataFrame:
        return (
            li.filter(F.col("l_linenumber") == line)
            .groupBy(F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"))
            .agg(F.round(F.avg(col), 4).alias("score"))
        )

    tables = {
        "crispr": score(1, "l_quantity"),
        "blast": score(2, "l_extendedprice"),
        "blastx": score(3, "l_discount"),
        "pfam": score(4, "l_tax"),
    }
    return feature_merge(tables, keys=["src", "dst"], value_col="score", fill=0.0)


@query(
    "j7_cross_join",
    oracle="""
    SELECT r_name, o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    """,
)
def j7_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — tiny cross join (bin/ProteinNetworkCreation.pl:122-127)."""
    region = _t(spark, sf_dir, "region").select("r_name")
    status = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(status)


# =========================================================================
# Windows / sorts / set ops (SURVEY §2.5, §2.6)
# =========================================================================


@query(
    "w1_top_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
      FROM part
    ) WHERE rn <= 2
    """,
)
def w1_top_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — per-group top-N (longest contig per cluster,
    bin/GetLongestContig.R:46). Uses the engine's best_hit operator."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.relational import best_hit

    part = _t(spark, sf_dir, "part")
    return best_hit(
        part,
        keys=["p_brand"],
        order=[F.desc("p_retailprice"), F.asc("p_partkey")],
        n=2,
    ).select("p_brand", "p_partkey", "p_retailprice")


@query(
    "o1_distinct_sorted",
    oracle="SELECT DISTINCT l_partkey FROM lineitem",
)
def o1_distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — sort|uniq ID list (Makefile:37-41)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_partkey").distinct()


@query(
    "o4_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'high' AS bucket FROM orders WHERE o_totalprice > 200000
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'low' AS bucket FROM orders WHERE o_totalprice < 50000
    """,
)
def o4_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — UNION ALL of per-slice tables (rbind,
    bin/interpersonaldiversity.R:205-225)."""
    orders = _t(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 200000).select(
        "o_orderkey", "o_totalprice", F.lit("high").alias("bucket")
    )
    lo = orders.filter(F.col("o_totalprice") < 50000).select(
        "o_orderkey", "o_totalprice", F.lit("low").alias("bucket")
    )
    return hi.unionByName(lo)


@query(
    "o5_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def o5_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 — INTERSECT (paired-read reconciliation, bin/get_trimmed_pairs.py:10-11)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.intersect(b)


@query(
    "o6_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def o6_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 — EXCEPT / anti list (prophage exclusion, Makefile:628-634)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    open_orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return cust.exceptAll(open_orders.distinct()).distinct()


# =========================================================================
# Reshape (SURVEY §2.8)
# =========================================================================


@query(
    "r1_pivot_matrix",
    oracle="""
    SELECT p_brand,
           ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 0), 2) AS A,
           ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 0), 2) AS N,
           ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0), 2) AS R
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def r1_pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 — long→wide abundance matrix (bin/ReshapeAlignedAbundance.R:36-39).
    Pivot values passed explicitly (skips the distinct-discovery job)."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.relational import pivot_matrix

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    piv = pivot_matrix(
        joined, "p_brand", "l_returnflag", "l_quantity", values=["A", "N", "R"]
    )
    return piv.select(
        "p_brand",
        F.round("A", 2).alias("A"),
        F.round("N", 2).alias("N"),
        F.round("R", 2).alias("R"),
    )


@query(
    "r4_melt",
    oracle="""
    WITH piv AS (
      SELECT p_brand,
             ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 0), 2) AS A,
             ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0), 2) AS R
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
    )
    SELECT p_brand, 'A' AS flag, A AS qty FROM piv
    UNION ALL
    SELECT p_brand, 'R' AS flag, R AS qty FROM piv
    """,
)
def r4_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 — wide→long melt via native stack() (bin/interpersonaldiversity.R:123-128)."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.relational import melt, pivot_matrix

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    piv = pivot_matrix(joined, "p_brand", "l_returnflag", "l_quantity", values=["A", "R"])
    piv = piv.select("p_brand", F.round("A", 2).alias("A"), F.round("R", 2).alias("R"))
    return melt(piv, id_cols=["p_brand"], value_cols=["A", "R"], var_name="flag", value_name="qty")


# =========================================================================
# Scalar function chain (SURVEY §2.7)
# =========================================================================


@query(
    "f_scalar_chain",
    oracle="""
    SELECT p_partkey,
           REGEXP_REPLACE(p_name, '[^A-Za-z0-9]+', '_', 'g') AS sanitized,
           STRING_SPLIT(REGEXP_REPLACE(p_name, '[^A-Za-z0-9]+', '_', 'g'), '_')[1] AS genus,
           CONCAT(p_brand, '__', p_type) AS combo_key,
           ROUND(1e7 * p_retailprice / p_size, 0) AS norm,
           ROUND(LOG10(p_retailprice * p_size), 6) AS weight,
           CASE WHEN p_size > 25 THEN 'Interacts' ELSE 'NotInteracts' END AS verdict,
           CAST(p_size AS DOUBLE) AS size_d
    FROM part
    """,
)
def f_scalar_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F10 — the scalar surface in one projection: key sanitizer
    (bin/BenchmarkDatabaseCreation.pl:99-101), genus extraction, composite
    key, length-normalize round(1e7*a/l), log10 edge weight, threshold
    recode, cast."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.functions.scalar import (
        composite_key,
        edge_weight,
        extract_genus,
        length_normalize,
        recode_threshold,
        sanitize_key,
    )

    part = _t(spark, sf_dir, "part")
    sanitized = sanitize_key("p_name")
    return part.select(
        "p_partkey",
        sanitized.alias("sanitized"),
        extract_genus(sanitized).alias("genus"),
        composite_key("p_brand", "p_type").alias("combo_key"),
        length_normalize("p_retailprice", "p_size").alias("norm"),
        F.round(edge_weight("p_retailprice", "p_size"), 6).alias("weight"),
        recode_threshold(F.col("p_size").cast("double"), 25.0).alias("verdict"),
        F.col("p_size").cast("double").alias("size_d"),
    )


# =========================================================================
# Flagship (graph Q5) — also the entry() smoke query
# =========================================================================

FLAGSHIP_ORACLE = """
    WITH sampled_part AS (
      SELECT 'C' || o_custkey AS sample, 'P' || l_partkey AS phage,
             CAST(SUM(l_quantity) AS BIGINT) AS phage_abundance
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2 HAVING SUM(l_quantity) > 0
    ), sampled_supp AS (
      SELECT 'C' || o_custkey AS sample, 'S' || l_suppkey AS host,
             CAST(SUM(l_quantity) AS BIGINT) AS host_abundance
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2 HAVING SUM(l_quantity) > 0
    ), infects AS (
      SELECT DISTINCT 'P' || l_partkey AS phage, 'S' || l_suppkey AS host
      FROM lineitem
    ), members AS (
      SELECT 'C' || c_custkey AS sample
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE n_regionkey = 0
    ), lengths AS (
      SELECT 'P' || p_partkey AS phage, CAST(p_size AS BIGINT) AS phage_length
      FROM part
    )
    SELECT DISTINCT sp.sample, sp.phage, sp.phage_abundance, i.host,
           ss.host_abundance, l.phage_length,
           ROUND(1e7 * sp.phage_abundance / COALESCE(l.phage_length, 1000), 0) AS phage_norm,
           ROUND(LOG10(sp.phage_abundance * ss.host_abundance), 6) AS weight
    FROM sampled_part sp
    JOIN members m ON sp.sample = m.sample
    JOIN infects i ON sp.phage = i.phage
    JOIN sampled_supp ss ON ss.sample = sp.sample AND ss.host = i.host
    LEFT JOIN lengths l ON sp.phage = l.phage
"""


@query("gq5_sample_network", oracle=FLAGSHIP_ORACLE)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 flagship — per-sample enriched interaction network scoped to one
    study (bin/GetSkinGraphs.R:55-98): 7-way join producing, per (sample,
    phage, host): both abundances, phage length, length-normalized phage
    abundance (F6) and log10 co-abundance edge weight (F7), DISTINCT.

    Plan shape at scale: Sampled/Infects both derive from the lineitem
    fact; the study-membership list and the length dim are broadcast; the
    three fact-fact joins co-partition on (sample, host)/(phage) and AQE
    handles hub-phage skew.
    """
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.functions.scalar import edge_weight, length_normalize
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.plans.testdata_graph import (
        infects_edges,
        sampled_edges,
    )

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    members = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select(F.concat(F.lit("C"), F.col("c_custkey")).alias("sample"))

    sampled = sampled_edges(spark, sf_dir).filter(F.col("abundance") > 0)
    infects = infects_edges(spark, sf_dir).select(
        F.col("src").alias("phage"), F.col("dst").alias("host")
    )
    lengths = _t(spark, sf_dir, "part").select(
        F.concat(F.lit("P"), F.col("p_partkey")).alias("phage"),
        F.col("p_size").cast("long").alias("phage_length"),
    )

    phage_ab = sampled.filter(F.col("dst").startswith("P")).select(
        F.col("src").alias("sample"),
        F.col("dst").alias("phage"),
        F.col("abundance").alias("phage_abundance"),
    )
    host_ab = sampled.filter(F.col("dst").startswith("S")).select(
        F.col("src").alias("sample"),
        F.col("dst").alias("host"),
        F.col("abundance").alias("host_abundance"),
    )

    return (
        phage_ab.join(F.broadcast(members), "sample")
        .join(infects, "phage")
        .join(host_ab, ["sample", "host"])
        .join(F.broadcast(lengths), "phage", "left")
        .select(
            "sample",
            "phage",
            "phage_abundance",
            "host",
            "host_abundance",
            "phage_length",
            length_normalize(
                "phage_abundance", F.coalesce("phage_length", F.lit(1000))
            ).alias("phage_norm"),
            F.round(edge_weight("phage_abundance", "host_abundance"), 6).alias("weight"),
        )
        .distinct()
    )
