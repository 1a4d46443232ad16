"""Bagging SVM driver (entry point 2 — Bagging_svm/Driver.main,
Driver.java:36-66; SURVEY §3.2).

Reference shape: pre-partition into k subsets, then ONE map-only job
(0 reducers, Bagging1.java:5) trains an independent model per subset
and persists each (`model-<taskId>.model`, Bagging1.java:28,126).
Majority-vote inference is described in the paper (PDF slides 14-15)
but absent from the code — implemented here as scoring + argmax-vote
(documented addition, SURVEY §7.6).

Scale: embarrassingly parallel — one shuffle to form buckets, then a
single grouped-map stage; inference broadcasts the k models once and
scores map-side (no shuffle at all).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from parallel_svms_spark.ml import trainer
from parallel_svms_spark.ml.smo import SVCModel
from parallel_svms_spark.operators.partitioning import balanced_buckets


def bagging_train(df: DataFrame, k: int, C: float = 1.0,
                  gamma: float | None = None, kernel: str = "rbf",
                  ) -> tuple[dict[int, SVCModel], DataFrame]:
    """Train k independent per-subset models; returns
    ({bucket: model}, all SVs unioned — the `base-model-SVs` output of
    Bagging1.java:127-131)."""
    cur = balanced_buckets(df, k)
    fit = trainer.fit_buckets(cur, C=C, gamma=gamma, kernel=kernel,
                              with_model=True, k=k).localCheckpoint()
    return trainer.collect_models(fit), trainer.svs_only(fit)


def bagging_predict(df: DataFrame, models: dict[int, SVCModel],
                    id_col: str = "vec_id", label_col: str = "label",
                    features_col: str = "embedding") -> DataFrame:
    """Majority vote over the k models; ties → lowest class label
    (deterministic — the paper does not specify a tie rule)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {b: m.to_dict() for b, m in models.items()})
    has_label = label_col in df.columns
    cols = [id_col, features_col] + ([label_col] if has_label else [])
    schema = f"{id_col} long, " + (f"{label_col} int, " if has_label else "") \
             + "pred int"

    def vote(it):
        ms = [SVCModel.from_dict(d) for _, d in sorted(bc.value.items())]
        all_classes = np.unique(np.concatenate([m.classes for m in ms]))
        cls_pos = {c: i for i, c in enumerate(all_classes)}
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[features_col].to_numpy()).astype(np.float64)
            votes = np.zeros((len(X), len(all_classes)), dtype=np.int64)
            for m in ms:
                p = m.predict(X)
                votes[np.arange(len(X)), [cls_pos[c] for c in p]] += 1
            pred = all_classes[np.argmax(votes, axis=1)]  # argmax→lowest tie
            out = {id_col: pdf[id_col].to_numpy()}
            if has_label:
                out[label_col] = pdf[label_col].to_numpy()
            out["pred"] = pred.astype(np.int32)
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(vote, schema=schema)
