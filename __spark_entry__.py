"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

qkey names follow SURVEY.md §2's operator inventory; each callable is
a thin wrapper over a named, tested function in parallel_svms_spark.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parallel_svms_spark.io.sources import load_table
from parallel_svms_spark.operators import relational as R
from parallel_svms_spark.operators import partitioning as X

K_BUCKETS = 8  # reference runs k ∈ {2,4,8,16} (PDF slide 23); 8 is the middle
SVM_K = 4      # bucket count for the ML qkeys (500-row embeddings at sf0.01)
SVM_GAMMA = 2.0  # fixture embeddings are unit-norm → γ≈2 (see ml/smo.train_svc)


# ---------------------------------------------------------------------------
# ML qkeys (rows-only: genuinely non-SQL-expressible — SMO training)
# ---------------------------------------------------------------------------

def _svm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2: per-bucket SVM train → per-bucket SV count (deterministic)."""
    from pyspark.sql import functions as F
    from parallel_svms_spark.ml import trainer
    emb = load_table(spark, sf_dir, "embeddings")
    fit = trainer.fit_buckets(X.balanced_buckets(emb, SVM_K), gamma=SVM_GAMMA)
    return (trainer.svs_only(fit).groupBy("bucket")
            .agg(F.count("*").alias("n_sv")).orderBy("bucket"))


def _cascade_svm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1-M3 + X3 + C1: full cascade; returns final-model summary."""
    from parallel_svms_spark.ml import evaluate, trainer
    from parallel_svms_spark.ml.cascade import cascade_train
    emb = load_table(spark, sf_dir, "embeddings")
    model, svs = cascade_train(emb, k=SVM_K, gamma=SVM_GAMMA)
    acc = evaluate.accuracy(trainer.predict_df(emb, model))
    return spark.createDataFrame(
        [(int(model.n_sv), round(acc, 4))], "final_n_sv int, train_acc double")


def _bagging_svm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: k independent models + majority-vote inference."""
    from parallel_svms_spark.ml import evaluate
    from parallel_svms_spark.ml.bagging import bagging_predict, bagging_train
    emb = load_table(spark, sf_dir, "embeddings")
    models, _ = bagging_train(emb, k=SVM_K, gamma=SVM_GAMMA)
    acc = evaluate.accuracy(bagging_predict(emb, models))
    return spark.createDataFrame(
        [(int(b), int(m.n_sv), round(acc, 4)) for b, m in sorted(models.items())],
        "bucket int, n_sv int, vote_acc double")


def _iterative_svm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 + U1/U2 + A4: convergence-controlled iteration."""
    from parallel_svms_spark.ml.iterative import iterative_train
    emb = load_table(spark, sf_dir, "embeddings")
    gsv, errs = iterative_train(emb, k=SVM_K, gamma=SVM_GAMMA)
    n_gsv = gsv.count()
    return spark.createDataFrame(
        [(i, int(e), int(n_gsv)) for i, e in enumerate(errs)],
        "iteration int, errorsum bigint, final_gsv_count int")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-class histogram of the training set — the
    reference's first dataflow step (CLASS_<l>_COUNT counters,
    cascade_svm/Precascade1.java:27) on the MNIST-analog fixture."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    return R.agg_groupby_count(emb).orderBy("label")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def q(table_fn):
        return table_fn

    return {
        # §2.1 / §2.3 — scans + counter-style aggregations
        "scan_count": lambda s, d: R.scan_count(load_table(s, d, "lineitem")),
        "agg_count": lambda s, d: R.agg_count(load_table(s, d, "lineitem")),
        "agg_groupby_count": lambda s, d: R.agg_groupby_count(load_table(s, d, "embeddings")),
        "agg_error_sum": lambda s, d: R.agg_error_sum(load_table(s, d, "events")),
        # §2.2 — projections / parsing / join-filters
        "proj_label": lambda s, d: R.proj_label(load_table(s, d, "embeddings")),
        "parse_project": lambda s, d: R.parse_project(load_table(s, d, "embeddings")),
        "filter_semijoin": lambda s, d: R.filter_semijoin(
            load_table(s, d, "lineitem"), load_table(s, d, "orders")),
        "dedup_anti": lambda s, d: R.dedup_anti(
            load_table(s, d, "customer"), load_table(s, d, "orders")),
        # §2.4 — partitioning / exchange / cascade merge
        "repartition_balanced": lambda s, d: X.balanced_buckets(
            load_table(s, d, "embeddings"), K_BUCKETS).select("vec_id", "bucket"),
        "agg_bucket_count": lambda s, d: X.agg_bucket_count(
            X.balanced_buckets(load_table(s, d, "embeddings"), K_BUCKETS)),
        "merge_pairs": lambda s, d: X.halve_buckets_count(
            X.balanced_buckets(load_table(s, d, "embeddings"), K_BUCKETS)),
        # §2.5 — set operations
        "set_union": lambda s, d: R.set_union(load_table(s, d, "orders")),
        "set_except": lambda s, d: R.set_except(
            load_table(s, d, "lineitem"), load_table(s, d, "orders")),
        # §2.6 — evaluation-shaped aggregation
        "eval_confusion": lambda s, d: R.eval_confusion(load_table(s, d, "embeddings")),
        # §2.6 ML operators — rows-only (no SQL oracle: SMO training)
        "svm_train": _svm_train,
        "cascade_svm": _cascade_svm,
        "bagging_svm": _bagging_svm,
        "iterative_svm": _iterative_svm,
    }


def oracle_sql() -> dict[str, str]:
    """ANSI SQL (DuckDB) twins of queries(); same column names/aliases."""
    k = K_BUCKETS
    return {
        "scan_count": "SELECT COUNT(*) AS n_rows FROM lineitem",
        "agg_count": "SELECT COUNT(*) AS total_record_count FROM lineitem",
        "agg_groupby_count": (
            "SELECT label, COUNT(*) AS class_count FROM embeddings GROUP BY label"
        ),
        "agg_error_sum": (
            "SELECT event_type, CAST(SUM(FLOOR(value*100)) AS BIGINT) AS errorsum "
            "FROM events GROUP BY event_type"
        ),
        "proj_label": (
            "SELECT vec_id, CAST(split_part(label::VARCHAR || ',' || vec_id::VARCHAR, ',', 1) AS INT) "
            "AS parsed_label FROM embeddings"
        ),
        "parse_project": (
            "SELECT vec_id, label AS parsed_label, "
            "CAST(len(embedding) AS INT) AS n_features, "
            "ROUND(list_sum(CAST(embedding AS DOUBLE[])), 6) AS feature_sum "
            "FROM embeddings"
        ),
        "filter_semijoin": (
            "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey IN "
            "(SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')"
        ),
        "dedup_anti": (
            "SELECT c_custkey FROM customer c WHERE NOT EXISTS "
            "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
        ),
        "repartition_balanced": (
            f"SELECT vec_id, CAST(vec_id % {k} AS INT) AS bucket FROM embeddings"
        ),
        "agg_bucket_count": (
            f"SELECT CAST(vec_id % {k} AS INT) AS bucket, COUNT(*) AS subset_count "
            "FROM embeddings GROUP BY 1"
        ),
        "merge_pairs": (
            f"SELECT CAST(FLOOR((vec_id % {k}) / 2) AS INT) AS bucket, "
            "COUNT(*) AS merged_count FROM embeddings GROUP BY 1"
        ),
        "set_union": (
            "SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT' "
            "UNION ALL "
            "SELECT o_orderkey FROM orders WHERE o_orderpriority = '2-HIGH'"
        ),
        "set_except": (
            "SELECT l_orderkey AS okey FROM lineitem "
            "EXCEPT "
            "SELECT o_orderkey AS okey FROM orders WHERE o_orderstatus = 'F'"
        ),
        "eval_confusion": (
            "SELECT label, CAST(vec_id % 10 AS INT) AS pred, COUNT(*) AS n "
            "FROM embeddings GROUP BY 1, 2"
        ),
    }
