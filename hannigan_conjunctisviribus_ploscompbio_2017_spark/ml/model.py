"""Interaction-prediction model (SURVEY §2.11 M7-M12), mirroring
bin/CalculatePredModel.R + bin/PredictRelationships.R in /root/reference.

Semantics preserved from the reference:
- missing scores mean absence of evidence → fillna(0)
  (bin/CalculatePredModel.R:35; doc/manuscript.md:180);
- stratified train/test split (caret::createDataPartition,
  bin/CalculatePredModel.R:72-77) → partition-invariant md5-hash
  threshold per row (sampleBy draws per-partition and would tie the
  split to physical layout);
- random forest, CV'd, ROC-AUC metric (caret train method='rf',
  bin/CalculatePredModel.R:47-57) → MLlib RandomForestClassifier +
  CrossValidator + BinaryClassificationEvaluator;
- predictions written back as Interacts/NotInteracts
  (bin/PredictRelationships.R:70-75, bin/AddPredictedRelationships.pl:85-92).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURES = ["crispr", "blast", "blastx", "pfam"]


def prepare_training(edges: DataFrame, label_col: str = "interaction") -> DataFrame:
    """Q1 output → ML input: fillna(0) on features, binary label.

    The label is BINARIZED (> 0 → 1.0), matching the reference's recode
    (bin/CalculatePredModel.R:41-44 treats any positive Interaction as
    the positive class). Every row reaches exactly one side of the
    downstream stratified_split regardless of its raw label value — the
    split ranks within each binarized stratum, it never filters."""
    df = edges.select(
        "src", "dst", *FEATURES, F.col(label_col).cast("double").alias("_raw_label")
    ).fillna(0.0, subset=FEATURES)
    out = (
        df.dropna(subset=["_raw_label"])
        .withColumn("label", F.when(F.col("_raw_label") > 0, 1.0).otherwise(0.0))
        .drop("_raw_label")
    )
    # Canonical physical layout: fixed-width hash repartition + in-
    # partition sort. Every seeded MLlib stage downstream (RF bagging,
    # CrossValidator fold assignment) draws per-partition randomness in
    # row order, so without this the trained model — and every fixture
    # built on it — silently depends on the INPUT's split count (core
    # count, maxPartitionBytes). 8 partitions is sized for the
    # dimension-scale candidate-interaction table the reference trains
    # on (thousands of rows), not corpus-scale data; raise it if a
    # training table ever genuinely outgrows a few partitions.
    return out.repartition(8, "src", "dst").sortWithinPartitions("src", "dst")


def stratified_split(
    df: DataFrame, train_frac: float = 0.8, seed: int = 42, label_col: str = "label"
) -> tuple[DataFrame, DataFrame]:
    """M7 — EXACT per-label-stratum split (caret createDataPartition,
    bin/CalculatePredModel.R:72-77, guarantees proportional strata).

    Within each label stratum, rows are ranked by md5-60(src|dst|seed)
    (deterministic tie-break on the (src, dst) key itself) and the top
    ⌈frac·n_s⌉ go to train.  This keeps BOTH properties at once:

    - partition-invariant: the rank orders by pure row functions, so
      the split never depends on the input's physical layout (a plain
      sampleBy seeds its Bernoulli draw per PARTITION and silently
      reshuffles train/test when core count or maxPartitionBytes
      changes — the round-3 perturbation sweep caught exactly that);
    - exactly stratified: per-stratum train counts are ⌈frac·n_s⌉ by
      construction, not merely frac·n_s in expectation — caret's
      createDataPartition contract.  The test set is the exact
      complement (rank > ⌈frac·n_s⌉), so no row is lost or duplicated.

    Cost: one hash shuffle on label_col shared by both window functions
    (row_number and the stratum count use the same partitioning).  The
    training tables this serves are dimension-scale (SURVEY §2.11), so
    the per-stratum window is nowhere near a skew hazard; for a
    corpus-scale labeled set prefer tx_split_assign's thresholds.

    Ties: rows sharing a (src, dst) key hash identically, so the rank
    breaks further ties on every remaining column — the split stays a
    pure function of row VALUES even if the caller feeds duplicate
    keys (full-duplicate rows are interchangeable by definition)."""
    from pyspark.sql import Window as W

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.dedup import portable_token_hash

    h = portable_token_hash(
        F.concat_ws("|", F.col("src"), F.col("dst"), F.lit(str(seed)))
    )
    rest = [
        F.col(c) for c in df.columns if c not in ("src", "dst", label_col)
    ]
    w_rank = W.partitionBy(label_col).orderBy(
        h.asc(), F.col("src"), F.col("dst"), *rest
    )
    w_stratum = W.partitionBy(label_col)
    # ⌈frac·n_s⌉ in EXACT decimal arithmetic: the double product can
    # round up across an integer (0.07·100 = 7.000000000000001 → ceil
    # 8); a 12-dp decimal of the fraction times an exact integer count
    # reproduces the mathematical ceiling for any sane fraction
    frac_dec = F.lit(float(train_frac)).cast("decimal(14,12)")
    ranked = df.withColumn("_rk", F.row_number().over(w_rank)).withColumn(
        "_k",
        F.ceil(frac_dec * F.count(F.lit(1)).over(w_stratum)).cast("long"),
    )
    train = ranked.filter(F.col("_rk") <= F.col("_k")).drop("_rk", "_k")
    test = ranked.filter(F.col("_rk") > F.col("_k")).drop("_rk", "_k")

    # Re-canonicalize AFTER the window: the rank shuffle hashes on
    # label_col into spark.sql.shuffle.partitions partitions — a width
    # that tracks core count — so without this the split OUTPUT's
    # physical layout (which seeded RF bagging / CV fold draws consume
    # in row order) would vary with the machine even though membership
    # is exact. Same fixed-width layout contract as prepare_training;
    # the r03 filter-based split preserved it for free, the windowed
    # split must restore it. (The CPUS=5/12 perturbation sweep catches
    # exactly this class of drift.)
    def canon(d: DataFrame) -> DataFrame:
        return d.repartition(8, "src", "dst").sortWithinPartitions("src", "dst")

    return canon(train), canon(test)


def build_pipeline(num_trees: int = 500, seed: int = 42) -> Pipeline:
    """RF pipeline (caret rf used 500 trees by default, mtry tuned;
    featureSubsetStrategy covers the mtry grid)."""
    assembler = VectorAssembler(inputCols=FEATURES, outputCol="features")
    rf = RandomForestClassifier(
        labelCol="label",
        featuresCol="features",
        numTrees=num_trees,
        seed=seed,
        probabilityCol="probability",
    )
    return Pipeline(stages=[assembler, rf])


def train_cv(
    train: DataFrame,
    num_folds: int = 5,
    num_trees: int = 100,
    parallelism: int = 4,
    seed: int = 42,
):
    """M8/M10 — 5-fold CV over an mtry-style grid with ROC-AUC metric
    (caret trainControl(method='cv', number=5) + twoClassSummary).
    Returns (best PipelineModel, cv AUC of best params)."""
    pipe = build_pipeline(num_trees=num_trees, seed=seed)
    rf = pipe.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(rf.featureSubsetStrategy, ["1", "2", "3"])  # mtry ∈ {1,2,3}
        .build()
    )
    evaluator = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=num_folds,
        parallelism=parallelism,
        seed=seed,
    )
    model = cv.fit(train)
    return model.bestModel, max(model.avgMetrics)


def evaluate(model: PipelineModel, test: DataFrame) -> dict:
    """M11 — AUC / sensitivity / specificity on held-out data
    (twoClassSummary semantics)."""
    pred = model.transform(test)
    auc = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    ).evaluate(pred)
    counts = (
        pred.groupBy("label", "prediction").count().collect()
    )
    tp = sum(r["count"] for r in counts if r["label"] == 1.0 and r["prediction"] == 1.0)
    fn = sum(r["count"] for r in counts if r["label"] == 1.0 and r["prediction"] == 0.0)
    tn = sum(r["count"] for r in counts if r["label"] == 0.0 and r["prediction"] == 0.0)
    fp = sum(r["count"] for r in counts if r["label"] == 0.0 and r["prediction"] == 1.0)
    return {
        "auc": auc,
        "sensitivity": tp / (tp + fn) if tp + fn else float("nan"),
        "specificity": tn / (tn + fp) if tn + fp else float("nan"),
        "n_test": tp + fn + tn + fp,
    }


def predict_interactions(model: PipelineModel, pairs: DataFrame) -> DataFrame:
    """M9 — classify unlabeled pairs; returns (src, dst, prediction
    ∈ {Interacts, NotInteracts}, p_interacts) ready for
    add_predicted_edges (graph_build)."""
    from pyspark.ml.functions import vector_to_array

    pred = model.transform(pairs.fillna(0.0, subset=FEATURES))

    pred = pred.withColumn("_p", vector_to_array("probability").getItem(1))
    return pred.select(
        "src",
        "dst",
        F.when(F.col("prediction") == 1.0, "Interacts")
        .otherwise("NotInteracts")
        .alias("prediction"),
        F.round(F.col("_p"), 6).alias("p_interacts"),
    )


def feature_importances(model: PipelineModel) -> dict[str, float]:
    """M11 — varImp analog."""
    rf = model.stages[-1]
    return dict(zip(FEATURES, [float(x) for x in rf.featureImportances.toArray()]))


def nested_cv(
    df: DataFrame,
    n_outer: int = 5,
    train_frac: float = 0.8,
    num_folds: int = 5,
    num_trees: int = 100,
    seed: int = 42,
) -> DataFrame:
    """M10 — explicit nested cross-validation: `n_outer` outer
    iterations of stratified split → inner CV model selection → held-out
    evaluation, the reference's avgaucnested.tsv loop
    (bin/CalculatePredModel.R:68-170: `for (i in 1:iterationcount)`
    around createDataPartition + caret CV).

    The outer loop is a driver loop by nature (each iteration trains a
    model), but every iteration's fit/evaluate is fully distributed.
    Returns one Spark DataFrame: (iteration, cv_auc, auc, sensitivity,
    specificity, n_test) — mean of the auc column reproduces the
    reference's nested-average AUC."""
    rows = []
    for i in range(n_outer):
        it_seed = seed + i
        train, test = stratified_split(df, train_frac=train_frac, seed=it_seed)
        model, cv_auc = train_cv(
            train, num_folds=num_folds, num_trees=num_trees, seed=it_seed
        )
        m = evaluate(model, test)
        rows.append(
            (
                i,
                round(float(cv_auc), 6),
                round(float(m["auc"]), 6),
                round(float(m["sensitivity"]), 6),
                round(float(m["specificity"]), 6),
                int(m["n_test"]),
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "iteration int, cv_auc double, auc double, sensitivity double, "
        "specificity double, n_test long",
    )


def roc_from_scores(
    scored: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """ROC curve points from (score, binary label) rows — distributed:
    group ties by score, one global-ordered cumulative window (ROC is a
    total order by construction; the windowed frame is the already-
    aggregated distinct-score table, not the raw rows). Returns
    (threshold, fpr, tpr) descending by threshold, starting at (0, 0).
    """
    from pyspark.sql import Window as W

    agg = (
        scored.select(
            F.col(score_col).cast("double").alias("threshold"),
            F.col(label_col).cast("double").alias("_l"),
        )
        .groupBy("threshold")
        .agg(
            F.sum("_l").alias("_pos"),
            (F.count(F.lit(1)) - F.sum("_l")).alias("_neg"),
        )
    )
    w_cum = W.orderBy(F.desc("threshold")).rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.partitionBy()
    pts = agg.select(
        "threshold",
        (F.sum("_neg").over(w_cum) / F.sum("_neg").over(w_all)).alias("fpr"),
        (F.sum("_pos").over(w_cum) / F.sum("_pos").over(w_all)).alias("tpr"),
    )
    anchor = scored.sparkSession.createDataFrame(
        [(float("inf"), 0.0, 0.0)], "threshold double, fpr double, tpr double"
    )
    return anchor.unionByName(
        pts.select(
            "threshold", F.round("fpr", 6).alias("fpr"), F.round("tpr", 6).alias("tpr")
        )
    )


def roc_points(model: PipelineModel, test: DataFrame) -> DataFrame:
    """M12 — ROC curve points for a fitted model on held-out pairs
    (bin/CalculatePredModel.R:302-313: the roc() object the reference
    plots/averages). Returns (threshold, fpr, tpr)."""
    from pyspark.ml.functions import vector_to_array

    pred = model.transform(test.fillna(0.0, subset=FEATURES))
    scored = pred.select(
        vector_to_array("probability").getItem(1).alias("score"),
        F.col("label"),
    )
    return roc_from_scores(scored, "score", "label")
