"""Relational operator layer — the reference's dataflow steps as named,
tested DataFrame functions (SURVEY §2.1-§2.6 qkeys).

Every function here is a thin declarative wrapper over Spark SQL so
Catalyst keeps predicate pushdown / column pruning / join selection;
none of them drop to Python. Each docstring cites the reference
construct it re-expresses.

Scale notes per operator are inline; the common themes:
- aggregations are partial (map-side combine) by construction,
- semi/anti joins stay joins (not collects) so they distribute,
- every computed column is aliased for the DuckDB oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


# ---------------------------------------------------------------------------
# Scans / projections / parsing (S1, P1, P2)
# ---------------------------------------------------------------------------

def scan_count(lineitem: DataFrame) -> DataFrame:
    """S1+A1: scan + global count (TOTAL_RECORD_COUNT counter,
    cascade_svm/Precascade1.java:23, read back by the driver at
    cascade_svm/Driver.java:67-68).

    Catalyst rewrites this to a metadata-only parquet count at any
    scale — no row materialization.
    """
    return lineitem.agg(F.count("*").alias("n_rows"))


def proj_label(embeddings: DataFrame) -> DataFrame:
    """P1: label projection — the reference takes
    ``substring(line, 0, indexOf(','))`` (cascade_svm/Precascade1.java:24-27).

    Re-expressed on a synthesized ``label,vec_id`` line so the string
    surgery is exercised with deterministic (integer) formatting.
    """
    line = F.concat_ws(",", F.col("label").cast("string"),
                       F.col("vec_id").cast("string"))
    return embeddings.select(
        F.col("vec_id").alias("vec_id"),
        F.substring_index(line, ",", 1).cast("int").alias("parsed_label"),
    )


def parse_project(embeddings: DataFrame) -> DataFrame:
    """P2: dense record parse, CSV line → (label, double[]) —
    cascade_svm/Midcascade.java:110-118 (repeated ×5 in the reference).

    Round-trips each row through the reference's text encoding and
    back, then projects per-row stats. All JVM-side: split / transform
    / aggregate stay inside whole-stage codegen — at 100 TB this is a
    single narrow map stage, no shuffle.
    """
    line = F.concat_ws(",", F.col("label").cast("string"),
                       F.array_join(F.col("embedding").cast("array<double>"), ","))
    parts = F.split(line, ",")
    feats = F.slice(parts, 2, F.size(parts) - 1).cast("array<double>")
    return embeddings.select(
        F.col("vec_id").alias("vec_id"),
        parts.getItem(0).cast("int").alias("parsed_label"),
        F.size(feats).alias("n_features"),
        F.round(F.aggregate(feats, F.lit(0.0), lambda acc, x: acc + x), 6)
         .alias("feature_sum"),
    )


# ---------------------------------------------------------------------------
# Filters as joins (P4, P5)
# ---------------------------------------------------------------------------

def filter_semijoin(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """P4: SV row filter — keep only rows whose id is in a computed
    keep-list (``model.sv_indices`` positional filter,
    cascade_svm/Midcascade.java:123-129). A semi-join, not a collect:
    the keep-list never has to fit on the driver.

    At scale: Catalyst picks broadcast-hash when the keep-side is small
    (it is here — filtered orders), sort-merge otherwise; AQE converts
    at runtime on real sizes.
    """
    keep = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return (
        lineitem.join(keep, lineitem.l_orderkey == keep.o_orderkey, "left_semi")
        .select(F.col("l_orderkey").alias("l_orderkey"),
                F.col("l_linenumber").alias("l_linenumber"))
    )


def dedup_anti(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """P5: anti-membership filter — emit only records NOT already in an
    accumulated set (``!ds_gsv.contains(...)``,
    Iterative_svm/Itergsv.java:102-108). Left-anti join replaces the
    driver-side HashSet: distributes, and the "set" side can be any
    size.
    """
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("c_custkey"))
    )


# ---------------------------------------------------------------------------
# Aggregations (A1-A4) — the reference does ALL of these via Hadoop
# Counters, i.e. side-effect scalar aggregates. Spark expresses them as
# real (partial+final) aggregations; driver-visible scalars via observe().
# ---------------------------------------------------------------------------

def agg_count(lineitem: DataFrame) -> DataFrame:
    """A1: global record count (cascade_svm/Precascade1.java:23)."""
    return lineitem.agg(F.count("*").alias("total_record_count"))


def agg_groupby_count(embeddings: DataFrame) -> DataFrame:
    """A2: per-class count — ``CLASS_<l>_COUNT`` counters
    (cascade_svm/Precascade1.java:27), the input to stratified
    partitioning. Map-side partial aggregation: shuffle carries
    ≤ n_classes rows per task regardless of input size.
    """
    return embeddings.groupBy("label").agg(F.count("*").alias("class_count"))


def agg_error_sum(events: DataFrame) -> DataFrame:
    """A4: errorsum — per-class error rates ×100, floored, summed
    (``TOTAL_MIS_CLF/errorsum``, Iterative_svm/Itergsv.java:95-97; the
    iterative driver's convergence signal,
    Iterative_svm/Driver.java:81). Same floor(rate*100)→sum shape over
    the events fixture's rate-like ``value`` column.
    """
    return (
        events.groupBy("event_type")
        .agg(F.sum(F.floor(F.col("value") * 100)).alias("errorsum"))
    )


# ---------------------------------------------------------------------------
# Set operations (U1, U2)
# ---------------------------------------------------------------------------

def set_union(orders: DataFrame) -> DataFrame:
    """U1: union — local subset ∪ global SV set before retraining
    (``ds.addAll(ds_gsv)``, Iterative_svm/Itergsv.java:91). UNION ALL
    semantics (addAll keeps duplicates).
    """
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT") \
                   .select(F.col("o_orderkey").alias("o_orderkey"))
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH") \
                 .select(F.col("o_orderkey").alias("o_orderkey"))
    return urgent.unionByName(high)


def set_except(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """U2: except — new SVs = model SVs minus already-global SVs
    (Iterative_svm/Itergsv.java:102-108). EXCEPT DISTINCT, matching the
    reference's contains()-guarded append into a de-facto set.
    """
    shipped = lineitem.select(F.col("l_orderkey").alias("okey"))
    finished = orders.filter(F.col("o_orderstatus") == "F") \
                     .select(F.col("o_orderkey").alias("okey"))
    return shipped.subtract(finished)


# ---------------------------------------------------------------------------
# Evaluation-shaped aggregation (M5)
# ---------------------------------------------------------------------------

def eval_confusion(embeddings: DataFrame) -> DataFrame:
    """M5: confusion-matrix aggregation
    (``EvaluateDataset.testDataset`` → per-class PerformanceMeasure,
    Iterative_svm/Itergsv.java:95-97).

    The *aggregation* is the operator under test, so the predictor here
    is a deterministic SQL-expressible stand-in (vec_id mod 10); the
    real SVM predictions flow through the same groupBy in
    ml/evaluate.py.
    """
    pred = (F.col("vec_id") % 10).cast("int")
    return (
        embeddings.select(F.col("label").alias("label"), pred.alias("pred"))
        .groupBy("label", "pred").agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# CDC merge (lakehouse MERGE INTO, the insert/update subset)
# ---------------------------------------------------------------------------

def merge_upsert(target: DataFrame, updates: DataFrame,
                 key: str = "doc_id") -> DataFrame:
    """Upsert merge: on key collision the updates row wins, surviving
    target rows pass through, brand-new update keys insert — MERGE
    INTO's WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT, expressed as
    left-anti + UNION ALL so it runs on any DataFrame source.

    Scale shape: ONE shuffle (the anti join on key; broadcast when the
    update batch is small — the common CDC case, and AQE picks that
    automatically); the union is a zero-exchange merge of the two
    legs. Writing the result back with a partitioned sink +
    dynamic-partition-overwrite touches only partitions containing
    updated keys. The reference analog is Itergsv's contains()-guarded
    global-SV append (Iterative_svm/Itergsv.java:102-108) — same
    keep-newest-wins semantics, distributed.
    """
    survivors = target.join(updates.select(key), on=key, how="left_anti")
    return survivors.unionByName(updates.select(*target.columns))


def set_intersect(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """U3: intersect — keys present on BOTH sides (SURVEY §2.9 lists
    INTERSECT as absent from the reference; this names the
    free-from-Spark rewrite as a checked qkey like U1/U2). INTERSECT
    DISTINCT: Spark plans it as a distinct + left-semi hash join —
    both sides collapse to distinct keys before the exchange, so the
    shuffle carries keys only.
    """
    shipped = lineitem.select(F.col("l_orderkey").alias("okey"))
    finished = orders.filter(F.col("o_orderstatus") == "F") \
                     .select(F.col("o_orderkey").alias("okey"))
    return shipped.intersect(finished)


def merge_survivorship(changes: DataFrame, key: str = "user_id",
                       ts_col: str = "ts", tiebreak: str = "event_id",
                       cols: tuple[str, ...] = ("event_type", "value"),
                       ) -> DataFrame:
    """Survivorship merge — the column-level generalization of
    ``merge_upsert``: collapse a change stream to ONE row per key
    where each attribute carries its LATEST NON-NULL value (ordered by
    ``(ts_col, tiebreak)``). This is the "golden record" rule CDC
    compaction and master-data pipelines apply: a later partial update
    (NULL = "not touched") must not erase an earlier attribute, which
    plain keep-newest-row upserting would do.

    Expressed as ``last(col, ignorenulls=True)`` over an
    unbounded key-ordered window plus a keep-one-row-per-key rank —
    the DuckDB oracle is the identical ``LAST_VALUE(col IGNORE
    NULLS)`` window, so the per-attribute survivorship (not just the
    row count) is pinned engine-portably.

    Scale shape: one hash exchange on the key, per-key sorted window —
    the sessionize plan shape; state per task is one key-group. Keys
    are users/entities, so group sizes are event-scale bounded (the
    mega-key hazard and its bucketing fix are shared with
    ``sessionize_bucketed``).
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak).asc()]
    w = (W.partitionBy(key).orderBy(*order)
         .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    rn = F.row_number().over(
        W.partitionBy(key).orderBy(F.col(ts_col).desc(),
                                   F.col(tiebreak).desc()))
    lasts = [F.last(c, ignorenulls=True).over(w).alias(f"last_{c}")
             for c in cols]
    return (changes
            .select(key, *lasts, rn.alias("__rn"))
            .filter(F.col("__rn") == 1)
            .drop("__rn"))
