"""ML interaction model (§2.11 M7-M12) on a separable synthetic fixture."""

import pytest
from pyspark.sql import functions as F

from hannigan_conjunctisviribus_ploscompbio_2017_spark.ml import model as M


@pytest.fixture(scope="module")
def labeled(spark):
    """Separable: positives have high crispr/blast, negatives low."""
    import random

    rng = random.Random(42)
    rows = []
    for i in range(300):
        pos = i % 2 == 0
        rows.append(
            (
                f"p{i}",
                f"h{i}",
                rng.uniform(70, 100) if pos else rng.uniform(0, 20),
                rng.uniform(500, 1000) if pos else rng.uniform(0, 100),
                rng.uniform(0, 1),
                None if rng.random() < 0.3 else rng.uniform(0, 50),  # missing scores
                1 if pos else 0,
            )
        )
    return spark.createDataFrame(
        rows,
        "src string, dst string, crispr double, blast double, blastx double, "
        "pfam double, interaction int",
    )


def test_prepare_fills_missing(labeled):
    data = M.prepare_training(labeled)
    assert data.filter(F.col("pfam").isNull()).count() == 0  # NA→0 semantics


def test_stratified_split_preserves_classes(labeled):
    data = M.prepare_training(labeled)
    train, test = M.stratified_split(data, 0.8, seed=1)
    assert train.count() + test.count() == 300
    assert train.filter(F.col("label") == 1).count() > 0
    assert test.filter(F.col("label") == 1).count() > 0


def test_stratified_split_exact_per_stratum(labeled):
    """caret createDataPartition contract: train takes EXACTLY
    ⌈frac·n_s⌉ rows per label stratum, not just frac in expectation."""
    import math

    data = M.prepare_training(labeled)
    n_by_label = {r.label: r.n for r in data.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    for frac in (0.5, 0.8):
        train, _ = M.stratified_split(data, frac, seed=1)
        got = {r.label: r.n for r in train.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert got == {lbl: math.ceil(frac * n) for lbl, n in n_by_label.items()}


def test_stratified_split_partition_invariant(labeled):
    """Split membership is a pure function of (src, dst, seed, stratum
    ranks) — repartitioning the input must not move a single row."""
    data = M.prepare_training(labeled)
    base, _ = M.stratified_split(data, 0.8, seed=3)
    perturbed, _ = M.stratified_split(data.repartition(13), 0.8, seed=3)
    keys = lambda df: {(r.src, r.dst) for r in df.select("src", "dst").collect()}
    assert keys(base) == keys(perturbed)


def test_train_predict_separable(labeled):
    data = M.prepare_training(labeled)
    train, test = M.stratified_split(data, 0.8, seed=1)
    model = M.build_pipeline(num_trees=20).fit(train)
    metrics = M.evaluate(model, test)
    assert metrics["auc"] > 0.95  # trivially separable
    assert metrics["sensitivity"] > 0.9
    assert metrics["specificity"] > 0.9
    imps = M.feature_importances(model)
    # crispr/blast carry the signal
    assert imps["crispr"] + imps["blast"] > imps["blastx"] + imps["pfam"]


def test_predict_interactions_labels(labeled):
    data = M.prepare_training(labeled)
    model = M.build_pipeline(num_trees=20).fit(data)
    preds = M.predict_interactions(model, data.drop("label"))
    vals = {r.prediction for r in preds.collect()}
    assert vals <= {"Interacts", "NotInteracts"}
    assert preds.filter(F.col("p_interacts").between(0, 1)).count() == 300


def test_cv_runs(labeled):
    data = M.prepare_training(labeled)
    model, auc = M.train_cv(data, num_folds=3, num_trees=10, parallelism=2)
    assert auc > 0.9


def test_nested_cv_frame(labeled):
    data = M.prepare_training(labeled)
    res = M.nested_cv(data, n_outer=2, num_folds=3, num_trees=10, seed=7)
    rows = res.collect()
    assert len(rows) == 2
    assert [r.iteration for r in rows] == [0, 1]
    for r in rows:
        assert r.auc > 0.9  # separable fixture
        assert 0.0 <= r.sensitivity <= 1.0
        assert 0.0 <= r.specificity <= 1.0
        assert r.n_test > 0


def test_roc_from_scores_closed_form(spark):
    # scores desc: 0.9(+), 0.8(+), 0.6(-), 0.4(+), 0.2(-)
    # thresholds: .9→(0, 1/3) .8→(0, 2/3) .6→(1/2, 2/3) .4→(1/2,1) .2→(1,1)
    rows = [(0.9, 1), (0.8, 1), (0.6, 0), (0.4, 1), (0.2, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    pts = {r.threshold: (r.fpr, r.tpr) for r in M.roc_from_scores(df).collect()}
    assert pts[float("inf")] == (0.0, 0.0)
    assert pts[0.9] == (0.0, pytest.approx(1 / 3, abs=1e-6))
    assert pts[0.8] == (0.0, pytest.approx(2 / 3, abs=1e-6))
    assert pts[0.6] == (pytest.approx(0.5), pytest.approx(2 / 3, abs=1e-6))
    assert pts[0.4] == (pytest.approx(0.5), 1.0)
    assert pts[0.2] == (1.0, 1.0)


def test_roc_points_separable_auc_one(labeled):
    data = M.prepare_training(labeled)
    train, test = M.stratified_split(data, 0.8, seed=1)
    model = M.build_pipeline(num_trees=20).fit(train)
    pts = sorted(
        ((r.fpr, r.tpr) for r in M.roc_points(model, test).collect())
    )
    # trapezoid AUC over the curve ≈ 1 on the separable fixture
    auc = sum(
        (x2 - x1) * (y1 + y2) / 2.0
        for (x1, y1), (x2, y2) in zip(pts, pts[1:])
    )
    assert auc > 0.95
    assert pts[0] == (0.0, 0.0)
    assert pts[-1] == (1.0, 1.0)


def test_prepare_training_binarizes_nonbinary_labels(spark):
    from pyspark.sql import functions as F

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.ml.model import prepare_training, stratified_split

    rows = [("p1", "h1", 1.0, 2.0, 0.0, 0.0, 2),   # evidence-count label
            ("p2", "h2", 0.0, 1.0, 0.0, 0.0, 1),
            ("p3", "h3", 0.0, 0.0, 1.0, 0.0, 0),
            ("p4", "h4", 0.0, 0.0, 0.0, 1.0, None)]
    df = spark.createDataFrame(
        rows, "src string, dst string, crispr double, blast double, blastx double, pfam double, interaction int"
    )
    out = prepare_training(df)
    labels = {r.src: r.label for r in out.collect()}
    assert labels == {"p1": 1.0, "p2": 1.0, "p3": 0.0}  # 2 -> 1.0; NULL dropped
    # every surviving row lands in exactly one split (no stratum gap)
    train, test = stratified_split(out, train_frac=0.5, seed=1)
    assert train.count() + test.count() == out.count()


def test_quality_classifier_separates_clean_from_soup(spark):
    from pyspark.sql import functions as F

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.ml.quality import (
        score_quality,
        train_quality_classifier,
    )

    clean = [
        (i, "the quick brown fox and the lazy dog walked to town with a friend", 1)
        for i in range(40)
    ]
    soup = [
        (100 + i, "@@!! 9932 $$%% ??? ## 111 &&& ~~ ^^ 00", 0) for i in range(40)
    ]
    df = spark.createDataFrame(clean + soup, "doc_id long, text string, curated int")
    model = train_quality_classifier(df, label_col="curated")
    probs = {r.id: r.quality_prob for r in score_quality(model, df).collect()}
    assert min(probs[i] for i, _, _ in clean) > 0.8
    assert max(probs[i] for i, _, _ in soup) < 0.2
    # null text scores as a (low-quality) empty doc, never crashes
    nulls = spark.createDataFrame([(999, None)], "doc_id long, text string")
    out = score_quality(model, nulls).collect()[0]
    assert 0.0 <= out.quality_prob <= 1.0
