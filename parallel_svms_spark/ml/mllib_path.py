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
    from pyspark.storagelevel import StorageLevel
    data = _to_mllib(df, features_col, label_col)
    if parallelism is None:
        n_classes = max(data.select("label").distinct().count(), 1)
        cap = df.sparkSession.sparkContext.defaultParallelism
        parallelism = min(n_classes, max(cap, 1))
    svc = LinearSVC(maxIter=max_iter, regParam=reg_param)
    # r11 (guide §5, the r10 thundering-herd lesson): persist + warm the
    # featurized input BEFORE the per-class fits. OneVsRest's own
    # persist is lazy, so its N parallel binary fits race to build the
    # same cache partitions on their first job; warming here means
    # every fit job (and the numClasses max(label) head job) reads a
    # built cache. persist() keeps partition boundaries, so each
    # treeAggregate sees the identical partitioning — coefficients are
    # unchanged (goldens + the transform-equality pin re-verified).
    data = data.persist(StorageLevel.MEMORY_AND_DISK)
    data.count()
    try:
        return OneVsRest(classifier=svc, parallelism=parallelism).fit(data)
    finally:
        data.unpersist()


def _lit_double_sql(v: float) -> str:
    """Exact double literal as SQL text: ``repr`` is the shortest
    round-tripping decimal, and Java's Double.parseDouble of it is
    exact (the r10 quantize_with precedent)."""
    return f"CAST('{repr(float(v))}' AS DOUBLE)"


def _ovr_margin_sql(w, b: float, xcol: str) -> str:
    """SQL text for one binary model's margin dot(w, x) + b — the
    quantity ``vector_get(rawPrediction, 1)`` exposes."""
    lits = ",".join(_lit_double_sql(v) for v in w)
    return (f"aggregate(zip_with({xcol}, array({lits}), (x, y) -> x * y),"
            f" 0D, (acc, v) -> acc + v) + {_lit_double_sql(b)}")


def predict_linear_ovr(model: OneVsRestModel, df: DataFrame,
                       features_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """(vec_id, label, pred) — JVM-side scoring, no Python in the loop.

    r11 (guide §1.2 step 2 / §5 driver cost): scoring is ONE argmax
    expression over the fitted models' (coefficients, intercept) pairs
    instead of ``OneVsRestModel.transform`` — the pyspark transform
    chains one full binary-model transform + accumulator-array rebuild
    PER CLASS (N plan layers, a persist/unpersist cycle, and a uuid
    column per class; measured 0.8 s of plan build + 0.3 s exec at
    sf0.1 vs ~0.1 s total for the expression). pred = index of the
    max margin, first-max-wins on ties — OneVsRest's own
    ``array_argmax`` rule (margins are finite, so the NaN corner where
    array_max and array_argmax differ cannot arise). Prediction
    equality with OneVsRestModel.transform is pinned on the fixture in
    tests/test_mllib_path.py; the model literals are embedded as exact
    round-trip double text, so the arithmetic is the same dot + add on
    the same doubles."""
    margins = ", ".join(
        _ovr_margin_sql(m.coefficients.toArray(), m.intercept, "__x")
        for m in model.models)
    return (df.selectExpr(
                "vec_id",
                f"cast({label_col} as int) as label",
                f"cast({features_col} as array<double>) as __x")
            .selectExpr("vec_id", "label", f"array({margins}) as __m")
            .selectExpr("vec_id", "label",
                        "cast(array_position(__m, array_max(__m)) - 1 "
                        "as int) as pred"))


def predict_linear_ovr_transform(model: OneVsRestModel, df: DataFrame,
                                 features_col: str = "embedding",
                                 label_col: str = "label") -> DataFrame:
    """The pre-r11 scoring path via ``OneVsRestModel.transform`` —
    kept as the equality oracle for the expression scorer (and for
    models whose classifier lacks array coefficients)."""
    scored = model.transform(_to_mllib(df, features_col, label_col))
    return scored.select(
        "vec_id", F.col("label").cast("int").alias("label"),
        F.col("prediction").cast("int").alias("pred"))
