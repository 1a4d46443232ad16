"""MLlib linear path: LinearSVC + OneVsRest (SURVEY §2.6 M1, scale
variant).

The numpy-SMO trainer (ml.smo / ml.trainer) reproduces the reference's
LibSVM semantics — kernelized C-SVC, one-vs-one — at per-bucket scale
(cascade_svm/Midcascade.java:62-94). This module is the
100 TB-single-model alternative: MLlib's distributed LinearSVC
(hinge-loss OWLQN, data-parallel treeAggregate over all executors)
wrapped in OneVsRest.

Documented semantic delta from the reference (SURVEY §7): one-vs-REST
(N models) instead of LibSVM's one-vs-one (N(N−1)/2), and linear-only
— the standard trade for training a single model on data that no
longer fits one bucket.
"""

from __future__ import annotations

from pyspark.ml.classification import LinearSVC, OneVsRest, OneVsRestModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _to_mllib(df: DataFrame, features_col: str = "embedding",
              label_col: str = "label") -> DataFrame:
    from pyspark.ml.functions import array_to_vector
    return df.select(
        F.col("vec_id"),
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(F.col(features_col).cast("array<double>"))
        .alias("features"))


def train_linear_ovr(df: DataFrame, features_col: str = "embedding",
                     label_col: str = "label", max_iter: int = 20,
                     reg_param: float = 0.0,
                     parallelism: int | None = None) -> OneVsRestModel:
    """Fit N binary LinearSVCs, one per class, each a distributed
    optimization over the full DataFrame — no bucketing needed; this
    is the path where the *solver* parallelizes instead of the data
    being partitioned into independent problems.

    ``parallelism`` defaults to min(class count, defaultParallelism)
    so binary fits interleave without launching an unbounded number of
    concurrent driver threads/job groups on many-class data — each fit
    is itself a sequence of small treeAggregate jobs, so on an
    underutilized cluster the OvR wall-clock approaches one binary
    fit. Pass ``parallelism`` explicitly when the class count is known
    to skip the extra distinct().count() job the default costs."""
    data = _to_mllib(df, features_col, label_col)
    if parallelism is None:
        n_classes = max(data.select("label").distinct().count(), 1)
        cap = df.sparkSession.sparkContext.defaultParallelism
        parallelism = min(n_classes, max(cap, 1))
    svc = LinearSVC(maxIter=max_iter, regParam=reg_param)
    return OneVsRest(classifier=svc, parallelism=parallelism).fit(data)


def predict_linear_ovr(model: OneVsRestModel, df: DataFrame,
                       features_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """(vec_id, label, pred) — JVM-side scoring, no Python in the loop."""
    scored = model.transform(_to_mllib(df, features_col, label_col))
    return scored.select(
        "vec_id", F.col("label").cast("int").alias("label"),
        F.col("prediction").cast("int").alias("pred"))
