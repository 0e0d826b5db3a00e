"""Learned quality classifier: distill a document-quality signal into
a logistic-regression scorer trained and applied distributed with
pyspark.ml — the FineWeb-Edu pattern (label a small sample with an
expensive judge, train a cheap classifier, score the whole corpus).

Reference parity: the reference's IntelligentPreprocessor picks a
strategy from a hand-tuned quality score
(/root/reference/src/advanced_ocr/preprocessing/quality_analyzer.py);
this module is the corpus-scale, learned version of that scorer.  The
default labeler is the Gopher rule gate (operators/curate.gopher_rules)
so the module is runnable end-to-end without external labels — in a
real pipeline, pass ``labels`` from an LLM-judge or human sample
instead; the feature plumbing and the distributed train/score path are
identical either way.

Not oracle-checked by design (model weights are not SQL-replayable);
pinned by pytest instead: held-out AUC against the labeler, refit
stability, one output row per input document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_COLS = [
    "n_words",
    "mean_word_len",
    "symbol_ratio",
    "alpha_frac",
    "n_stop",
    "quality",
]


def quality_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gopher_kwargs: dict | None = None,
) -> DataFrame:
    """One row per document with the FEATURE_COLS numeric profile:
    the Gopher document metrics (word count, mean word length, symbol
    ratio, alpha fraction, distinct-stopword count) plus the composite
    heuristic quality score.  A single projection of array HOFs over
    the scan — no shuffle, no Python — so featurizing 10^12 docs costs
    one pass."""
    from ocr_project_spark.functions.text import quality_score
    from ocr_project_spark.operators.curate import gopher_rules

    # gopher_kwargs tunes only the heuristic_keep gate thresholds; the
    # numeric features themselves are threshold-free.  Matters because
    # a labeler whose gates are all-pass or all-fail on a given corpus
    # (e.g. Gopher's 2-distinct-stopword rule on a narrow-vocabulary
    # domain) yields single-class labels no classifier can fit.
    g = gopher_rules(docs, id_col=id_col, text_col=text_col, **(gopher_kwargs or {}))
    q = docs.select(
        F.col(id_col),
        F.round(quality_score(F.col(text_col)), 4).alias("quality"),
    )
    return g.join(q, id_col).select(
        F.col(id_col),
        F.col("n_words").cast("double").alias("n_words"),
        "mean_word_len",
        "symbol_ratio",
        "alpha_frac",
        F.col("n_stop").cast("double").alias("n_stop"),
        "quality",
        F.col("keep").alias("heuristic_keep"),
    )


def train_quality_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    labels: DataFrame | None = None,
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
    gopher_kwargs: dict | None = None,
):
    """Fit a logistic-regression quality scorer.  ``labels`` is an
    (id, label in {0,1}) DataFrame — typically a judged SAMPLE of the
    corpus (inner-joined, so unlabeled docs simply don't train); when
    omitted, the Gopher rule verdict labels every document and the
    model distills the heuristic into a smooth, rankable probability.

    Returns a pyspark.ml PipelineModel (VectorAssembler +
    LogisticRegression).  Training is one pyspark.ml LBFGS run —
    treeAggregate over the feature table, executor-parallel."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(docs, id_col, text_col, gopher_kwargs)
    if labels is not None:
        train = feats.join(
            labels.select(
                F.col(id_col), F.col(label_col).cast("double").alias("label")
            ),
            id_col,
        )
    else:
        train = feats.withColumn(
            "label", F.col("heuristic_keep").cast("double")
        )
    # single-class labels fit a degenerate model (infinite intercept,
    # empty coefficients) that silently scores everything identically —
    # fail loudly instead; one cheap 2-row aggregate over a scan the
    # fit performs anyway
    if train.select("label").distinct().count() < 2:
        raise ValueError(
            "labels are single-class on this corpus — tune the labeler "
            "(gopher_kwargs) or supply a mixed `labels` sample"
        )
    assembler = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol="features", handleInvalid="keep"
    )
    lr = LogisticRegression(
        maxIter=max_iter,
        regParam=reg_param,
        featuresCol="features",
        labelCol="label",
    )
    return Pipeline(stages=[assembler, lr]).fit(train)


def apply_quality_classifier(
    docs: DataFrame,
    model,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document with a trained model: returns
    (id, quality_prob, keep_pred), one row per input document.
    Scoring is the same single featurize pass plus the model's local
    vector math per row — embarrassingly parallel, no shuffle."""
    from pyspark.ml.functions import vector_to_array

    feats = quality_features(docs, id_col, text_col)
    scored = model.transform(feats)
    prob = vector_to_array(F.col("probability")).getItem(1)
    return scored.select(
        F.col(id_col),
        F.round(prob, 6).alias("quality_prob"),
        (prob >= F.lit(float(threshold))).alias("keep_pred"),
    )
