"""Learned quality classifier: distillation AUC, custom-label path,
row contract, refit stability (pytest-pinned — model weights are not
SQL-replayable, so no oracle by design)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ocr_project_spark.operators.classifier import (
    FEATURE_COLS,
    apply_quality_classifier,
    quality_features,
    train_quality_classifier,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_quality_features_row_contract(spark, docs):
    f = quality_features(docs)
    rows = f.collect()
    assert len(rows) == docs.count()
    cols = set(f.columns)
    assert set(FEATURE_COLS) <= cols and "heuristic_keep" in cols
    for r in rows[:50]:
        assert r.n_words >= 0 and 0.0 <= r.alpha_frac <= 1.0
        assert 0.0 <= r.quality <= 1.0


def test_distilled_model_recovers_heuristic(spark, docs):
    # the synthetic corpus carries only one Gopher stopword, so the
    # default 2-distinct-stopword gate is all-fail there; relax it to
    # get mixed labels (the single-class case has its own test below)
    gk = {"min_stopwords": 1}
    model = train_quality_classifier(docs, gopher_kwargs=gk)
    out = apply_quality_classifier(docs, model)
    assert out.count() == docs.count()
    r = out.agg(
        F.min("quality_prob").alias("lo"), F.max("quality_prob").alias("hi")
    ).collect()[0]
    assert 0.0 <= r.lo <= r.hi <= 1.0

    # held-out AUC vs the labeler it distilled: the heuristic is a
    # deterministic function of the features, so a calibrated LR must
    # rank it nearly perfectly
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    feats = quality_features(docs, gopher_kwargs=gk).withColumn(
        "label", F.col("heuristic_keep").cast("double")
    )
    test = feats.where(F.col("doc_id") % 5 == 0)      # 20% holdout
    train_docs = docs.where(F.col("doc_id") % 5 != 0)
    m2 = train_quality_classifier(train_docs, gopher_kwargs=gk)
    scored = m2.transform(test)
    auc = BinaryClassificationEvaluator(labelCol="label").evaluate(scored)
    assert auc > 0.9, auc


def test_custom_labels_sample_training(spark, docs):
    # judge-labeled SAMPLE: only 40% of docs carry a label; the rest
    # must still be scorable
    labels = (
        quality_features(docs, gopher_kwargs={"min_stopwords": 1})
        .where(F.col("doc_id") % 5 <= 1)
        .select("doc_id", F.col("heuristic_keep").cast("int").alias("label"))
    )
    model = train_quality_classifier(docs, labels=labels)
    out = apply_quality_classifier(docs, model, threshold=0.5)
    assert out.count() == docs.count()
    assert {r.keep_pred for r in out.collect()} == {True, False}


def test_refit_is_stable(spark, docs):
    gk = {"min_stopwords": 1}
    a = apply_quality_classifier(docs, train_quality_classifier(docs, gopher_kwargs=gk))
    b = apply_quality_classifier(docs, train_quality_classifier(docs, gopher_kwargs=gk))
    j = a.alias("a").join(b.alias("b"), "doc_id")
    disagree = j.where(
        F.abs(F.col("a.quality_prob") - F.col("b.quality_prob")) > 1e-6
    ).count()
    assert disagree == 0


def test_single_class_labels_raise(spark, docs):
    # default Gopher gate is all-fail on the synthetic corpus (only one
    # distinct stopword exists in its vocabulary) -> must fail loudly,
    # not fit a degenerate always-0 model
    with pytest.raises(ValueError):
        train_quality_classifier(docs)
