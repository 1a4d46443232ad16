"""Data-quality constraint validation over the warehouse tables.

A 100 TB ingest pipeline runs integrity checks before every training
data release: primary-key uniqueness, NOT-NULL columns, value-domain
and range rules, and referential integrity between fact tables. The
reference has no audit surface at all (its dataflows trust their
LibSVM-format inputs; SURVEY §2.9); this module supplies the missing
gate in the shape a Spark cluster wants:

- **One scan per table.** Every per-row rule over a table (nulls,
  ranges, domains, duplicate keys) is fused into a SINGLE conditional
  aggregation — ``SUM(CASE WHEN violated)`` columns side by side — so
  k rules cost one pass, not k passes. The single wide agg row is then
  unpivoted with ``stack`` into one row per check (a zero-shuffle
  projection of a 1-row frame). At 100 TB the audit reads each table
  exactly once, and partial aggregation means the shuffle carries one
  row per partition.
- **Uniqueness without a second scan.** Duplicate-key counting is
  ``count(*) - count(DISTINCT key)`` inside the same aggregate (Spark
  plans the distinct via partial aggregation; the shuffle carries
  distinct keys, never rows).
- **Referential integrity as a key-only join.** Orphan detection joins
  the fact's key column against the dimension's DISTINCT key column
  (left outer + ``SUM(CASE WHEN missing)``), producing both the checked
  and violated counts in one pass. The probe side is pruned to ONE
  column before the exchange, so the shuffle carries 8-byte keys. No
  broadcast hint: at 100 TB both sides of an FK check are fact-sized,
  and AQE picks broadcast on its own whenever the key side is small.

Output contract (all checks, both engines): one row per check,
``(check_name string, n_violations bigint, n_checked bigint)``.
A clean table yields all-zero ``n_violations``; the row count equals
the number of registered checks, so a disappearing check is itself
detectable downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _viol(cond) -> F.Column:
    """LONG count of rows where the violation predicate holds.

    NULL predicate outcomes (e.g. a range rule over a NULL value) count
    as non-violations here; dedicated NOT-NULL checks own nullness.
    """
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long")


def _stack_checks(agg: DataFrame, checks: list[str]) -> DataFrame:
    """Unpivot a 1-row wide aggregate into (check_name, n_violations,
    n_checked) rows. ``stack`` is a projection — no shuffle, no join."""
    pairs = ", ".join(f"'{c}', {c}" for c in checks)
    return agg.select(
        F.expr(f"stack({len(checks)}, {pairs}) AS (check_name, n_violations)"),
        F.col("n_checked"),
    ).select("check_name", "n_violations", "n_checked")


def _fk_check(name: str, fact: DataFrame, key: str,
              dim: DataFrame, dim_key: str) -> DataFrame:
    """Orphan count for ``fact.key -> dim.dim_key`` as one key-only
    pass: prune both sides to the key column, distinct the dimension
    side, left-outer join, and count rows whose match is missing.
    Returns a single (check_name, n_violations, n_checked) row."""
    probe = fact.select(F.col(key).alias("fk"))
    build = dim.select(F.col(dim_key).alias("pk")).distinct()
    joined = probe.join(build, probe["fk"] == build["pk"], "left_outer")
    return joined.agg(
        F.lit(name).alias("check_name"),
        _viol(F.col("pk").isNull()).alias("n_violations"),
        F.count(F.lit(1)).cast("long").alias("n_checked"),
    ).select("check_name", "n_violations", "n_checked")


def validate_constraints(orders: DataFrame, customer: DataFrame,
                         lineitem: DataFrame) -> DataFrame:
    """Run the standard warehouse constraint suite in three table scans
    plus two key-only FK joins; see the module docstring for the plan
    shape. Eleven checks:

    orders (one scan): ``orders_orderkey_not_null``,
    ``orders_orderkey_unique`` — ``count(*) - count(DISTINCT key)``:
    every row beyond the first per non-NULL key, PLUS every NULL-key
    row (a NULL key cannot be proven unique; COUNT(DISTINCT) ignores
    NULLs identically in Spark and DuckDB) —
    ``orders_totalprice_nonneg``, ``orders_status_domain``
    (o_orderstatus ∈ {O, F, P}).

    customer (one scan): ``customer_custkey_not_null``,
    ``customer_name_nonempty``.

    lineitem (one scan): ``lineitem_quantity_range`` ([1, 50]),
    ``lineitem_discount_range`` ([0, 1]), ``lineitem_tax_nonneg``.

    FK joins: ``orders_custkey_fk`` (orders → customer),
    ``lineitem_orderkey_fk`` (lineitem → orders).
    """
    o_agg = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        _viol(F.col("o_orderkey").isNull()).alias("orders_orderkey_not_null"),
        (F.count(F.lit(1)) - F.countDistinct(F.col("o_orderkey")))
        .cast("long").alias("orders_orderkey_unique"),
        _viol(F.col("o_totalprice") < 0).alias("orders_totalprice_nonneg"),
        _viol(~F.col("o_orderstatus").isin("O", "F", "P")
              | F.col("o_orderstatus").isNull())
        .alias("orders_status_domain"),
    )
    o_rows = _stack_checks(o_agg, [
        "orders_orderkey_not_null", "orders_orderkey_unique",
        "orders_totalprice_nonneg", "orders_status_domain"])

    c_agg = customer.agg(
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        _viol(F.col("c_custkey").isNull()).alias("customer_custkey_not_null"),
        _viol(F.col("c_name").isNull() | (F.length("c_name") == 0))
        .alias("customer_name_nonempty"),
    )
    c_rows = _stack_checks(c_agg, [
        "customer_custkey_not_null", "customer_name_nonempty"])

    l_agg = lineitem.agg(
        F.count(F.lit(1)).cast("long").alias("n_checked"),
        _viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
        .alias("lineitem_quantity_range"),
        _viol((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
        .alias("lineitem_discount_range"),
        _viol(F.col("l_tax") < 0).alias("lineitem_tax_nonneg"),
    )
    l_rows = _stack_checks(l_agg, [
        "lineitem_quantity_range", "lineitem_discount_range",
        "lineitem_tax_nonneg"])

    fk1 = _fk_check("orders_custkey_fk", orders, "o_custkey",
                    customer, "c_custkey")
    fk2 = _fk_check("lineitem_orderkey_fk", lineitem, "l_orderkey",
                    orders, "o_orderkey")

    return o_rows.unionByName(c_rows).unionByName(l_rows) \
        .unionByName(fk1).unionByName(fk2)


def dataset_manifest(documents: DataFrame,
                     source_col: str = "source",
                     text_col: str = "text",
                     lang_col: str = "lang") -> DataFrame:
    """Dataset manifest — the one-pass datasheet published alongside a
    training-data release: per source (plus an ``__all__`` rollup
    row), document count, whitespace-token and character volume,
    length envelope, distinct-language and NULL-text counts, and the
    exact-duplicate rate (docs minus distinct text digests) in LONG
    ppm of docs. This is the release-gate summary a 100 TB pipeline
    prints before anyone trains on the data — the per-metric deep
    dives (``length_profile``, ``lang_confusion``,
    ``repeated_span_stats``, ``validate_constraints``) hang off its
    rows.

    Scale shape: ONE scan — every column is a conditional/plain
    aggregate over the same ``ROLLUP(source)`` grouping, so the
    shuffle carries one partial-agg row per (partition, source);
    the two COUNT(DISTINCT ...) columns ride Spark's expand-based
    distinct aggregation (shuffle carries distinct digests/langs per
    source, never documents). Output is |sources| + 1 rows.

    r9 (ADVICE r8): the rollup total row is labeled ``__all__`` via
    ``grouping()``, NOT a NULL-coalesce, so a source value that is
    genuinely NULL gets its own honest ``__null__`` row instead of
    silently merging with the grand total; and the language column
    is a parameter — on a schema without one, ``n_langs`` is emitted
    as NULL (not measured) rather than failing.
    """
    n_tok = F.when(F.col(text_col).isNotNull(),
                   F.size(F.split(F.col(text_col), " ")).cast("long"))
    n_langs = (F.countDistinct(lang_col)
               if lang_col in documents.columns
               else F.max(F.lit(None).cast("long")))
    return (documents
            .rollup(source_col)
            .agg(F.grouping(source_col).alias("_is_total"),
                 F.count("*").alias("n_docs"),
                 F.sum(F.coalesce(n_tok, F.lit(0))).alias("n_tokens"),
                 F.sum(F.coalesce(F.length(text_col).cast("long"),
                                  F.lit(0))).alias("n_chars"),
                 F.min(n_tok).alias("min_tokens"),
                 F.max(n_tok).alias("max_tokens"),
                 n_langs.alias("n_langs"),
                 F.sum(F.when(F.col(text_col).isNull(), 1)
                       .otherwise(0).cast("long")).alias("n_null_text"),
                 F.countDistinct(F.sha2(F.col(text_col), 256))
                 .alias("n_distinct_texts"))
            .select(F.when(F.col("_is_total") == 1, F.lit("__all__"))
                    .otherwise(F.coalesce(F.col(source_col),
                                          F.lit("__null__")))
                    .alias("source"),
                    "n_docs", "n_tokens", "n_chars", "min_tokens",
                    "max_tokens", "n_langs", "n_null_text",
                    F.expr("(n_docs - n_null_text - n_distinct_texts)"
                           " * 1000000 DIV n_docs").cast("long")
                    .alias("dup_ppm")))


def score_drift(archive: DataFrame, batch: DataFrame, score,
                k: int = 10) -> DataFrame:
    """Population Stability Index between the ARCHIVE and an ingest
    BATCH distribution of any per-row score — the drift monitor run
    before trusting a frozen filter/classifier threshold on day-N
    data: (bucket, n_archive, n_batch, psi_micro), where bucket
    edges are the archive's own k-quantiles and psi_micro =
    ⌊(pᵢ−qᵢ)·ln(pᵢ/qᵢ)·10⁶⌋ per bucket (sum the column for the
    headline PSI; the banking-scorecard convention reads < 0.1 as
    stable, > 0.25 as act).

    ``score`` is a Column expression evaluated identically on both
    frames (the shared-expression discipline: pass
    ``text.quality_cols()[3]`` or ``clf_score`` — drift monitoring
    composes with any scorer). Buckets are the archive's exact
    interior quantiles (one driver-collected k−1-float row, the
    ivf_centroids pattern; ``approx_percentile`` is the documented
    billion-row swap) with ``s ≤ edge`` tie semantics; add-one
    smoothing keeps every bucket's probability finite so PSI is
    defined even where a bucket empties — and the smoothed ratios
    are exact rationals, so both engines divide the same integers.

    Plan shape: two map-side-combinable bucket-count aggs (k-row
    outputs), a k-row spine join so empty buckets surface as zeros,
    and a 1-row totals reattach (the adjudicated 1-row-build
    BroadcastNestedLoop class) — nothing beyond the two scans ever
    exceeds k rows.
    """
    k = int(k)
    edges = archive.agg(F.percentile(
        score, F.lit([i / k for i in range(1, k)])).alias("e")
    ).first()["e"]

    def bucket(s):
        b = F.lit(k - 1)
        for i in reversed(range(k - 1)):
            b = F.when(s <= F.lit(float(edges[i])), F.lit(i)) \
                 .otherwise(b)
        return b.cast("int")

    spine = (archive.sparkSession.range(k)
             .select(F.col("id").cast("int").alias("bucket")))
    ca = (archive.select(bucket(score).alias("bucket"))
          .groupBy("bucket").agg(F.count("*").alias("n_archive")))
    cb = (batch.select(bucket(score).alias("bucket"))
          .groupBy("bucket").agg(F.count("*").alias("n_batch")))
    j = (spine.join(ca, "bucket", "left").join(cb, "bucket", "left")
         .select("bucket",
                 F.coalesce("n_archive", F.lit(0)).alias("n_archive"),
                 F.coalesce("n_batch", F.lit(0)).alias("n_batch")))
    tot = j.agg(F.sum("n_archive").alias("ta"),
                F.sum("n_batch").alias("tb"))
    p = (F.col("n_archive") + 1.0) / (F.col("ta") + F.lit(float(k)))
    q = (F.col("n_batch") + 1.0) / (F.col("tb") + F.lit(float(k)))
    return (j.crossJoin(tot)
            .select("bucket",
                    F.col("n_archive").cast("long").alias("n_archive"),
                    F.col("n_batch").cast("long").alias("n_batch"),
                    F.floor((p - q) * F.log(p / q) * 1e6)
                    .cast("long").alias("psi_micro")))
