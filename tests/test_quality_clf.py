"""The SVM-stack quality classifier (ml/quality.py, r10): SMO-trained
linear model over hashed bag-of-tokens, scored corpus-wide as one
codegen'd JVM expression."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.ml import quality as Q
from parallel_svms_spark.ml import smo
from parallel_svms_spark.operators.text import quality_cols


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def artifact(docs):
    return Q.train_quality_classifier(docs, dim=64, sample_rows=256)


def _featurize(texts, dim):
    X = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        for tok in Q._tokens(t):
            X[i, Q._py_bucket(tok, dim)] += 1.0
    return X


def test_score_expr_matches_driver_dot_product(spark, docs, artifact):
    """The Catalyst expression computes the SAME dot product as the
    driver-side featurize-then-dot — the JVM hash/bucket/weight walk
    is the python twin exactly."""
    rows = (Q.score_quality(docs, artifact)
            .select("doc_id", "text", "clf_score")
            .limit(100).collect())
    w = np.asarray(artifact["w"])
    X = _featurize([r.text for r in rows], artifact["dim"])
    want = X @ w + artifact["b"]
    got = np.asarray([r.clf_score for r in rows])
    assert np.allclose(got, want, atol=1e-9)


def test_predictions_match_svcmodel_predict(spark, docs):
    """The collapsed primal (w, b) reproduces SVCModel.predict on the
    training sample, including LibSVM's d <= 0 tie rule (score >= 0
    ⇒ high after the sign flip)."""
    dim, n = 64, 256
    art = Q.train_quality_classifier(docs, dim=dim, sample_rows=n)
    *_, q = quality_cols("text")
    rows = (docs.select("doc_id", "text", q.alias("q"),
                        F.md5(F.col("doc_id").cast("string")).alias("o"))
            .orderBy("o", "doc_id").limit(n).collect())
    X = _featurize([r.text for r in rows], dim)
    y = np.asarray([1 if r.q >= art["median"] else 0 for r in rows])
    model = smo.train_svc(X, y, C=1.0, kernel="linear")
    pred = model.predict(X)
    s = X @ np.asarray(art["w"]) + art["b"]
    # away from the boundary the two decision paths must agree
    clear = np.abs(s) > 1e-9
    assert clear.mean() > 0.9
    assert ((s[clear] >= 0).astype(int) == pred[clear]).all()


def test_classifier_generalizes_beyond_sample(docs):
    """The receipt the qkey rolls up: token evidence recovers the
    heuristic's decision on the FULL corpus (not just the 256-doc
    sample) well above chance."""
    agg = (Q.quality_classifier(docs, sample_rows=256)
           .agg(F.sum("n_agree").alias("a"),
                F.sum("n_docs").alias("n")).first())
    assert agg.a / agg.n > 0.7


def test_score_plan_zero_exchange_pure_jvm(docs, artifact):
    """Scoring is a narrow codegen'd projection: no Exchange, no
    Python evaluation of any kind in the plan."""
    p = (Q.score_quality(docs, artifact)
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in p
    for marker in ("ArrowEval", "BatchEval", "MapInPandas", "PythonUDF"):
        assert marker not in p, marker


def test_artifact_deterministic_and_roundtrips(docs, artifact,
                                               tmp_path):
    art2 = Q.train_quality_classifier(docs, dim=64, sample_rows=256)
    assert art2 == artifact  # two trainings, identical artifact
    path = str(tmp_path / "clf.json")
    Q.save_classifier(artifact, path)
    assert Q.load_classifier(path) == artifact


def test_single_class_sample_raises(spark):
    """A degenerate corpus slice (all weak labels equal on the
    sample) must fail loudly, not train a vacuous separator."""
    df = spark.createDataFrame(
        [(i, "x") for i in range(20)], "doc_id long, text string")
    with pytest.raises(ValueError, match="single-class"):
        Q.train_quality_classifier(df, dim=16, sample_rows=20)


def test_frozen_artifact_scores_new_batch(spark, docs, artifact):
    """Day-N shape: a frozen artifact scores a batch the trainer
    never saw — scoring depends only on (artifact, text), so the
    stateless streaming twin is the same expression verbatim."""
    batch = spark.createDataFrame(
        [(1_000_001, "the of and to in a is it for on"),
         (1_000_002, "zzz qqq")],
        "doc_id long, text string")
    got = {r.doc_id: r.clf_score
           for r in Q.score_quality(batch, artifact).collect()}
    w = np.asarray(artifact["w"])
    for did, text in [(1_000_001, "the of and to in a is it for on"),
                      (1_000_002, "zzz qqq")]:
        want = _featurize([text], artifact["dim"])[0] @ w + artifact["b"]
        assert abs(got[did] - want) < 1e-9


def test_streaming_score_quality_matches_batch(spark, docs, artifact):
    """The stateless scoring twin: arriving docs score exactly as the
    batch expression does, across micro-batch boundaries (streamed
    file-by-file)."""
    import glob
    import os
    import shutil
    import tempfile

    from parallel_svms_spark.streaming import windows as SW

    sub = docs.select("doc_id", "text").filter("doc_id < 40")
    batch = {(r.doc_id, r.clf_score, r.clf_high)
             for r in Q.score_quality(sub, artifact).collect()}
    with tempfile.TemporaryDirectory() as tmp:
        sub.filter("doc_id < 20").coalesce(1).write.parquet(f"{tmp}/d/0")
        sub.filter("doc_id >= 20").coalesce(1).write.parquet(f"{tmp}/d/1")
        dst = f"{tmp}/flat"
        os.makedirs(dst)
        for i, p in enumerate(sorted(glob.glob(f"{tmp}/d/*/part-*"))):
            shutil.copy(p, f"{dst}/{i:04d}.parquet")
            os.utime(f"{dst}/{i:04d}.parquet", (1000 + i, 1000 + i))
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1).parquet(dst))
        scored = SW.streaming_score_quality(stream, artifact)
        name = "stream_qclf_test"
        q = (scored.writeStream.outputMode("append")
             .format("memory").queryName(name).start())
        q.processAllAvailable()
        q.stop()
        got = {(r.doc_id, r.clf_score, r.clf_high) for r in
               spark.sql(f"SELECT * FROM {name}").collect()}
    assert got == batch and len(got) > 0


def test_pipeline_model_curate_matches_staged(spark, sf_dir, docs):
    """The composed DAG equals the explicitly staged computation —
    column contracts and determinism survive chaining (the pipeline
    family's stage-equivalence convention)."""
    import __spark_entry__ as em
    from parallel_svms_spark.operators import sharding as SH

    got = {(r.split, r.source):
           (r.n_docs, r.n_tokens, r.score_milli_sum, r.id_sum)
           for r in em.queries_all()["pipeline_model_curate"](
               spark, sf_dir).collect()}
    art = Q.train_quality_classifier(docs)
    kept = Q.score_quality(docs, art).filter("clf_high = 1")
    split = {r.doc_id: r.split
             for r in SH.split_by_cluster(kept).collect()}
    want: dict = {}
    for r in kept.select("doc_id", "source", "text",
                         "clf_score").collect():
        key = (split[r.doc_id], r.source)
        d = want.setdefault(key, [0, 0, 0, 0])
        d[0] += 1
        d[1] += len((r.text or "").split(" "))
        import math
        d[2] += math.floor(r.clf_score * 1000)
        d[3] += r.doc_id
    assert got == {k: tuple(v) for k, v in want.items()}
    assert len(got) > 1
