"""End-to-end on reference-shaped data (FIXTURES.md): headerless TSVs in
the exact formats the reference's Makefile moves between stages →
sources → §2.9 graph build → Q1 → RF model → predicted edges → Q2 →
nestats-shaped summary. A user of the reference could run this path on
their real files.

Fixture mirrors data/ValidationSet/Interactions.tsv + the 4 score tables
(bin/BenchmarkingModel.sh outputs) + abundance + metadata shapes.
"""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hannigan_conjunctisviribus_ploscompbio_2017_spark import schemas as S
from hannigan_conjunctisviribus_ploscompbio_2017_spark.functions.scalar import sanitize_key
from hannigan_conjunctisviribus_ploscompbio_2017_spark.ml import model as M
from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators import graph_build as GB
from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.relational import collapse_mean
from hannigan_conjunctisviribus_ploscompbio_2017_spark.plans import queries as Q
from hannigan_conjunctisviribus_ploscompbio_2017_spark.sources import readers as R

PHAGES = [f"Pseudomonas_phage_F{i}" for i in range(30)]
BACTERIA = [f"Pseudomonas_aeruginosa_strain_{i}" for i in range(43)]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """Write reference-shaped headerless TSVs (deterministic, seed 7)."""
    rng = random.Random(7)
    d = tmp_path_factory.mktemp("refshape")

    # interactions: phage \t bacterium \t 0/1  (101 rows like the reference)
    import zlib

    inter = []
    for _ in range(101):
        p, b = rng.choice(PHAGES), rng.choice(BACTERIA)
        # crc32, not hash(): str hash() is salted per interpreter run
        label = 1 if (zlib.crc32(f"{p}|{b}".encode()) % 3) == 0 else 0
        inter.append((p, b, label))
    (d / "interactions.tsv").write_text(
        "".join(f"{p}\t{b}\t{l}\n" for p, b, l in inter)
    )

    # 4 score tables: bacterium \t phage \t score, multiple rows per pair
    # (pre-collapse, bin/CollapseGeneScores.R semantics), positives scored
    # higher so the model has signal; ~10% extra keys absent from
    # interactions (FIXTURES.md §2)
    for name, lo, hi in [
        ("crispr", 70, 100),
        ("blast", 50, 5000),
        ("blastx", 50, 5000),
        ("pfam", 50, 1000),
    ]:
        rows = []
        for p, b, label in inter:
            if rng.random() < 0.7:
                for _ in range(rng.randint(1, 3)):
                    base = rng.uniform(lo, hi)
                    score = base * (1.6 if label else 0.4)
                    rows.append((b, p, round(score, 2)))
        for _ in range(10):  # keys outside the gold set
            rows.append((rng.choice(BACTERIA), f"Novel_phage_{rng.randint(0,5)}",
                         round(rng.uniform(lo, hi), 2)))
        (d / f"{name}.tsv").write_text("".join(f"{b}\t{p}\t{s}\n" for b, p, s in rows))

    # lengths: id \t length (some ids missing — loader must skip)
    (d / "lengths.tsv").write_text(
        "".join(f"{p}\t{rng.randint(10_000, 100_000)}\n" for p in PHAGES[:25])
    )
    return str(d)


@pytest.fixture(scope="module")
def built_graph(spark, fixture_dir):
    """sources → sanitize → collapse → §2.9 build."""
    inter = R.read_tsv(spark, f"{fixture_dir}/interactions.tsv", S.INTERACTIONS)
    inter = inter.select(
        sanitize_key("phage").alias("src"),
        sanitize_key("bacterium").alias("dst"),
        "interaction",
    ).dropDuplicates(["src", "dst"])

    score_tables = {}
    for name in ("crispr", "blast", "blastx", "pfam"):
        raw = R.read_tsv(spark, f"{fixture_dir}/{name}.tsv", S.SCORES)
        collapsed = collapse_mean(
            raw.select(
                sanitize_key("phage").alias("src"),
                sanitize_key("bacterium").alias("dst"),
                "score",
            ),
            ["src", "dst"],
            "score",
            "score",
        )
        score_tables[name] = collapsed

    edges = GB.build_infects_edges(inter, score_tables)

    node_ids = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    phage_nodes = node_ids.filter(F.col("id").contains("phage")).select(
        "id", F.lit("Phage").alias("label"), F.col("id").alias("name")
    )
    bact_nodes = node_ids.filter(~F.col("id").contains("phage")).select(
        "id", F.lit("Bacterial_Host").alias("label"), F.col("id").alias("name")
    )
    nodes = GB.build_nodes([phage_nodes, bact_nodes])
    lengths = R.read_tsv(spark, f"{fixture_dir}/lengths.tsv", S.LENGTHS)
    nodes = GB.update_node_lengths(
        nodes, lengths.select(sanitize_key("id").alias("id"), "length")
    )
    return nodes, edges


def test_build_shapes(built_graph):
    nodes, edges = built_graph
    n_phage = nodes.filter(F.col("label") == "Phage").count()
    n_bact = nodes.filter(F.col("label") == "Bacterial_Host").count()
    assert n_phage >= 30  # 30 gold + novel phages from score tables
    assert n_bact >= 40
    infects = edges.filter(F.col("type") == "Infects")
    assert infects.count() == infects.select("src", "dst").distinct().count()  # ≤1 edge/pair


def test_lengths_applied_and_missing_skipped(built_graph):
    nodes, _ = built_graph
    with_len = nodes.filter(F.col("length").isNotNull())
    assert 0 < with_len.count() <= 25  # only ids present in lengths.tsv


def test_q1_and_model_roundtrip(spark, built_graph):
    nodes, edges = built_graph
    # Q1: labeled edge scan → train RF → predict unlabeled pairs →
    # write PredictedInteraction edges → Q2 returns them
    labeled = Q.q1_interaction_scores(edges, nodes)
    assert labeled.count() > 0

    train = M.prepare_training(edges.filter(F.col("type") == "Infects"))
    model = M.build_pipeline(num_trees=30, seed=1).fit(train)
    metrics = M.evaluate(model, train)
    assert metrics["auc"] > 0.8  # scores were built with signal

    unlabeled = (
        edges.filter(F.col("type") == "Infects")
        .filter(F.col("interaction").isNull())
        .select("src", "dst", "crispr", "blast", "blastx", "pfam")
    )
    preds = M.predict_interactions(model, unlabeled)
    e2 = GB.add_predicted_edges(edges, preds)
    q2 = Q.q2_predicted_links(e2, nodes)
    assert q2.count() == preds.filter(F.col("prediction") == "Interacts").count()


def test_nestats_summary_shape(built_graph):
    """rtables/nestats.tsv shape: label → node count, type → edge count."""
    nodes, edges = built_graph
    node_counts = {r.label: r.n for r in nodes.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    edge_counts = {r.type: r.n for r in edges.groupBy("type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(node_counts) == {"Phage", "Bacterial_Host"}
    assert set(edge_counts) == {"Infects"}
    assert sum(node_counts.values()) == nodes.count()
