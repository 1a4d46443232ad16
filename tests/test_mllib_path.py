"""MLlib LinearSVC+OneVsRest scale path (SURVEY §2.6 M1 variant)."""

from __future__ import annotations

import pytest

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.ml.mllib_path import (predict_linear_ovr,
                                               train_linear_ovr)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_linear_ovr_trains_and_scores_all_rows(emb):
    model = train_linear_ovr(emb, max_iter=5)
    assert len(model.models) == 10  # one binary SVC per class
    pred = predict_linear_ovr(model, emb)
    assert pred.count() == emb.count()
    cols = dict(pred.dtypes)
    assert cols == {"vec_id": "bigint", "label": "int", "pred": "int"}
    # predictions land in the label domain
    assert pred.filter("pred < 0 OR pred > 9").count() == 0


def test_expression_scorer_equals_ovr_transform(emb):
    """r11: the argmax-expression scorer must reproduce
    OneVsRestModel.transform's predictions row-for-row (same margins —
    dot + add over the same doubles — and the same first-max tie
    rule)."""
    from parallel_svms_spark.ml.mllib_path import (
        predict_linear_ovr_transform)
    model = train_linear_ovr(emb, max_iter=5)
    fast = predict_linear_ovr(model, emb)
    ref = predict_linear_ovr_transform(model, emb)
    assert fast.exceptAll(ref).count() == 0
    assert ref.exceptAll(fast).count() == 0


def test_linear_ovr_separable_sanity(spark):
    # two clearly separable classes -> near-perfect linear fit
    rows = [(i, [float(i % 7), 1.0 if i < 50 else -1.0], 0 if i < 50 else 1)
            for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    model = train_linear_ovr(df, max_iter=20)
    pred = predict_linear_ovr(model, df)
    acc = pred.filter("label = pred").count() / 100
    assert acc >= 0.98
