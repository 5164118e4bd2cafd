"""Trained corpus-quality classifier — the GPT-3/LLaMA-style filter that
scores every document by its similarity to a trusted corpus.

The heuristic rules in functions/text.py (C4/Gopher) are hand-set
thresholds; the production complement is a cheap linear classifier
trained on weak labels (docs from a curated source = positive, raw crawl
= negative) over the SAME engine-computed text signals, then swept over
the whole corpus to produce a keep-probability per doc. Logistic
regression keeps scoring a single JVM-side dot product — the 100 TB
sweep is one codegen'd scan + model.transform, no Python.

Reference scope note: the reference's only classifier is the RF
interaction model (ml/model.py); this module is part of the
training-data-pipeline extension surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hannigan_conjunctisviribus_ploscompbio_2017_spark.functions import text as TX

QUALITY_FEATURES = [
    "f_n_tok",
    "f_punct",
    "f_stopword",
    "f_avg_word_len",
    "f_digit_ratio",
    "f_caps_ratio",
]


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc feature vector of pure-Catalyst text signals (no UDF, no
    shuffle): token count, punctuation/stopword ratios, mean word
    length, digit and uppercase character ratios. NULL-safe: null text
    is coalesced to '' up front and featurizes all-zero (TX.tokens
    maps the empty string to an empty array, and every ratio guards
    n == 0), so all empties land in one consistent feature point."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_char = F.length(t)
    safe_char = F.greatest(n_char, F.lit(1)).cast("double")
    n_tok = TX.token_count(t).cast("double")
    safe_tok = F.greatest(n_tok, F.lit(1.0))
    digits = n_char - F.length(F.regexp_replace(t, r"[0-9]", ""))
    caps = n_char - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    return df.select(
        F.col(id_col).alias("id"),
        n_tok.alias("f_n_tok"),
        TX.punct_ratio(t).alias("f_punct"),
        TX.stopword_ratio(t).alias("f_stopword"),
        (n_char.cast("double") / safe_tok).alias("f_avg_word_len"),
        (digits.cast("double") / safe_char).alias("f_digit_ratio"),
        (caps.cast("double") / safe_char).alias("f_caps_ratio"),
    )


def train_quality_classifier(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    max_iter: int = 50,
):
    """Fit the weak-label quality model: label_col is 1.0 for trusted/
    curated docs, 0.0 for raw. Returns a fitted PipelineModel whose
    transform adds `probability`/`prediction` to quality_features
    output. Logistic regression: convex, seeded, deterministic."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feats = quality_features(docs, id_col, text_col).join(
        docs.select(
            F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("label")
        ),
        "id",
    )
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=QUALITY_FEATURES, outputCol="_raw"),
            StandardScaler(inputCol="_raw", outputCol="features"),
            LogisticRegression(maxIter=max_iter, labelCol="label"),
        ]
    )
    return pipe.fit(feats)


def score_quality(
    model, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, quality_prob) for every doc — P(curated | text signals).
    One scan + a linear transform; filter `quality_prob >= tau`
    downstream (tau tuned on held-out curated data)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(quality_features(docs, id_col, text_col))
    return scored.select(
        "id", vector_to_array("probability")[1].alias("quality_prob")
    )
