"""Relational analytics over the warehouse tables — multi-way join +
aggregate dataflows in the classic decision-support shapes (TPC-H Q1 /
Q3 / Q4 / Q5 silhouettes on the fixture schema).

The reference's dataflows are single-table scans feeding counters
(SURVEY §2.1-§2.3); a user replacing it with this engine also gets the
join-heavy reporting side of an analytics stack. These four operators
are the canonical scale shapes:

- ``pricing_summary``  — scan + filter + low-cardinality group-by.
  Map-side partial aggregation means the shuffle carries ≤ |RF×LS|
  rows per task regardless of input size; the shipdate filter is a
  pushed-down parquet predicate.
- ``top_revenue_orders`` — 3-way join narrowed by selective dimension
  filters, then a global top-k. The top-k is TakeOrderedAndProject
  (per-partition heap + driver merge of k rows), never a full sort.
- ``revenue_by_nation`` — 6-way star join. The two genuinely tiny
  dims (nation 25 / region 5 rows at EVERY scale factor) are
  broadcast-hinted; the fact-fact joins stay shuffle joins keyed on
  orderkey so AQE can re-plan on runtime sizes.
- ``late_order_priority`` — EXISTS with a correlated inequality,
  expressed as a left-semi join with a composite condition (never a
  driver-side collect of the probe side).

Determinism contract for the DuckDB oracle: every money aggregate is
summed as exact integer cents (``floor(x*100)`` per row, LONG sum) so
the result is independent of partition/summation order; derived
averages divide exact integers, which is reproducible double math on
both engines. (Raw ``SUM(double)`` would be summation-order-dependent
and could differ in the last ulp across engines/partitionings.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cents(col) -> F.Column:
    """Exact integer cents for a money-valued double column.

    Both Spark and DuckDB evaluate ``floor(x * 100)`` on the identical
    IEEE-754 double, so per-row values agree bit-for-bit; summing LONGs
    is then associative and partition-order-independent.
    """
    return F.floor(col * 100).cast("long")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-01") -> DataFrame:
    """Q1 silhouette: pricing summary report.

    Filter on ship date (pushed to the parquet scan), group by the two
    low-cardinality flags, produce exact sums and derived averages.
    At 100 TB this is the best case for Spark: a single narrow scan
    stage with partial aggregation, a ≤|groups|-row shuffle, and a
    final reduce — no operator materializes more than a handful of rows.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    agg = (
        lineitem
        .filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantities are whole-valued; sum of integers ≤ 2^53 is exact
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(_cents(disc_price)).alias("sum_disc_cents"),
            F.sum(_cents(charge)).alias("sum_charge_cents"),
            F.count("*").alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
        "sum_disc_cents", "sum_charge_cents",
        # derived from exact integers → deterministic double division
        F.round(F.col("sum_qty") / F.col("count_order"), 6).alias("avg_qty"),
        F.round(F.col("sum_base_cents") / F.col("count_order") / 100.0, 6)
         .alias("avg_price"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def top_revenue_orders(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: str = "BUILDING",
                       cutoff: str = "1997-06-30", k: int = 10) -> DataFrame:
    """Q3 silhouette: unshipped-revenue top-k for one market segment.

    The segment filter prunes customers before the join (Catalyst pushes
    it below); orders/lineitem join on orderkey as a shuffle join that
    AQE can demote to broadcast at small SFs. The final top-k compiles
    to TakeOrderedAndProject — each partition keeps a k-row heap and the
    driver merges k·p rows, so no global sort ever runs. Ties broken by
    o_orderkey for cross-engine determinism.
    """
    cut = F.lit(cutoff).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < cut) \
                 .select("o_orderkey", "o_custkey", "o_orderdate")
    items = lineitem.filter(F.col("l_shipdate") > cut) \
                    .select("l_orderkey", "l_extendedprice", "l_discount")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        ords.join(cust, ords.o_custkey == cust.c_custkey, "inner")
        .join(items, ords.o_orderkey == items.l_orderkey, "inner")
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(_cents(disc_price)).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def revenue_by_nation(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame,
                      region_name: str = "ASIA",
                      year_start: str = "1996-01-01",
                      year_end: str = "1997-01-01") -> DataFrame:
    """Q5 silhouette: local-supplier revenue per nation in one region.

    Join graph: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, plus
    supplier with the "local" constraint s_nationkey = c_nationkey.
    nation (25 rows) and region (5 rows) are constant-size at every
    scale factor → explicit ``broadcast()``; supplier scales with SF so
    it stays a shuffle join on suppkey (AQE broadcasts it when it fits).
    The region filter reaches the nation join as a pre-broadcast filter,
    shrinking the star before any fact-side shuffle.
    """
    reg = region.filter(F.col("r_name") == region_name).select("r_regionkey")
    nat = (F.broadcast(nation.join(F.broadcast(reg),
                                   nation.n_regionkey == reg.r_regionkey))
           .select("n_nationkey", "n_name"))
    cust = customer.join(nat, customer.c_nationkey == nat.n_nationkey) \
                   .select("c_custkey", "c_nationkey", "n_name")
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(year_start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(year_end).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supplier.select("s_suppkey", "s_nationkey"),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .groupBy("n_name")
        .agg(F.sum(_cents(disc_price)).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("n_name"))
    )


def late_order_priority(orders: DataFrame, lineitem: DataFrame,
                        start: str = "1996-01-01", end: str = "1996-07-01",
                        grace_days: int = 90) -> DataFrame:
    """Q4 silhouette: per-priority count of orders with a late line item.

    EXISTS-with-inequality as a left-semi join: the probe side
    (lineitem keys + shipdates) is never collected, and the composite
    join condition keeps the inequality inside the join operator where
    the hash build is still on the equi-key. Map-side partial count
    after the semi-join → ≤|priorities| shuffle rows.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    )
    items = lineitem.select("l_orderkey", "l_shipdate")
    late = (ords.o_orderdate
            + F.expr(f"INTERVAL {int(grace_days)} DAYS"))
    return (
        ords.join(items,
                  (ords.o_orderkey == items.l_orderkey)
                  & (items.l_shipdate > late),
                  "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def promo_revenue_share(lineitem: DataFrame, part: DataFrame,
                        month_start: str = "1996-03-01",
                        month_end: str = "1996-04-01") -> DataFrame:
    """Q14 silhouette: share of one month's revenue from promo parts —
    a conditional-aggregate ratio over a fact⋈dim join.

    Scale shape: the shipdate filter prunes the fact scan to one month
    BEFORE the join; the part join is a plain equi-join on partkey (AQE
    broadcasts part when it fits — it scales with SF, so no forced
    hint); numerator and denominator are one pass of conditional exact
    cents, and the ratio divides two exact longs — deterministic across
    engines, unlike a SUM(double)/SUM(double) quotient.
    """
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(month_start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(month_end).cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    disc_cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", disc_cents).otherwise(F.lit(0))
    agg = (li.join(part.select("p_partkey", "p_type"),
                   li.l_partkey == F.col("p_partkey"))
           .agg(F.sum(promo).alias("promo_cents"),
                F.sum(disc_cents).alias("total_cents")))
    return agg.select(
        "promo_cents", "total_cents",
        F.round(F.lit(100.0) * F.col("promo_cents") / F.col("total_cents"), 6)
         .alias("promo_share_pct"))


def sales_rollup(lineitem: DataFrame) -> DataFrame:
    """Hierarchical subtotals: revenue and item counts at
    (returnflag, linestatus), per-returnflag, and grand-total levels in
    ONE pass — ``ROLLUP``, the reporting shape dashboards ask for.

    Spark plans rollup as Expand (one row fans out to one row per
    grouping set) feeding a partial aggregation, so the shuffle still
    carries ≤ Σ|grouping-set cardinalities| rows per task — subtotals
    at 100 TB cost the same as the finest group-by. NULL group columns
    mark subtotal rows (the fixture flags are non-null, so the marker
    is unambiguous).
    """
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("base_cents"),
             F.count("*").alias("n_items"))
    )


def sketch_profile(events: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Bounded-memory corpus statistics via sketches: distinct users
    (HyperLogLog++), value quantiles (approx_percentile's internal
    histogram sketch), and an exact row count for reference.

    THE 100 TB profiling path: exact COUNT(DISTINCT) shuffles every
    distinct key and exact percentile buffers the full value multiset
    per group, while both sketches are constant-size aggregation state
    that merges associatively — one narrow scan, one ≤KB-per-task
    shuffle, regardless of input size. No recomputing SQL oracle can
    exist (sketch estimates are engine-specific), but the estimates
    are deterministic functions of the input multiset — HLL register
    maxima are order-independent, digest merges follow the fixture's
    fixed partitioning — so the driver check pins them against a
    committed golden verified stable across independent sessions
    (tools/record_goldens.py); tests additionally pin the relative
    error against the exact answers (tests/test_analytics.py).
    """
    return events.agg(
        F.count("*").alias("n_rows"),
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.round(F.expr("approx_percentile(value, 0.5)"), 6)
         .alias("approx_p50_value"),
        F.round(F.expr("approx_percentile(value, 0.99)"), 6)
         .alias("approx_p99_value"),
    )


def daily_revenue_window(lineitem: DataFrame,
                         trail_days: int = 7) -> DataFrame:
    """Time-series window analytics: per (returnflag, ship-day)
    revenue with a running cumulative total and a trailing
    ``trail_days``-row moving average — the SUM/AVG OVER shapes every
    reporting layer runs.

    Scale shape: the pre-aggregation collapses the fact table to
    ≤ |flags| × |days| rows BEFORE any window runs (at 100 TB that is
    the difference between windowing billions of rows and a few
    thousand), and the windows are PARTITIONED by returnflag — each
    flag's day series sorts in its own task, never a global window.
    Determinism: windows order by day within flag (unique after the
    pre-agg), revenue is exact integer cents, and the moving average
    divides exact integers.
    """
    # DATE, not date_trunc: DuckDB's date_trunc('day') yields DATE while
    # Spark's yields TIMESTAMP — a plain date cast agrees on both engines
    day = F.col("l_shipdate").cast("date").alias("ship_day")
    daily = (lineitem
             .groupBy(F.col("l_returnflag"), day)
             .agg(F.sum(_cents(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))))
                  .alias("revenue_cents")))
    from pyspark.sql import Window as W
    by_flag = W.partitionBy("l_returnflag").orderBy("ship_day")
    running = by_flag.rowsBetween(W.unboundedPreceding, W.currentRow)
    trailing = by_flag.rowsBetween(-(int(trail_days) - 1), W.currentRow)
    return daily.select(
        "l_returnflag", "ship_day", "revenue_cents",
        F.sum("revenue_cents").over(running).alias("cum_revenue_cents"),
        F.round(F.avg("revenue_cents").over(trailing), 6)
         .alias("trailing_avg_cents"),
    )


def orders_reconcile(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Full-outer reconciliation: classify every orderkey seen on
    either side of the orders↔lineitem relationship as matched /
    order-only / items-only, with per-class counts — the data-quality
    audit query every ingest pipeline runs (and the full-outer member
    of the join-type matrix: inner/semi/anti are exercised elsewhere).

    Scale shape: both sides collapse to DISTINCT keys before the join
    (map-side partial dedup), so the full-outer join exchanges keys
    only — never fact rows; the classification is a null-pattern CASE
    and the rollup is a ≤3-row aggregate.
    """
    o = orders.select(F.col("o_orderkey").alias("k")).distinct()
    li = lineitem.select(F.col("l_orderkey").alias("k2")).distinct()
    j = o.join(li, o.k == li.k2, "full_outer")
    status = (F.when(F.col("k").isNotNull() & F.col("k2").isNotNull(),
                     F.lit("matched"))
              .when(F.col("k").isNotNull(), F.lit("order_only"))
              .otherwise(F.lit("items_only")))
    return (j.select(status.alias("status"))
            .groupBy("status").agg(F.count("*").alias("n_keys")))


def corr_profile(documents: DataFrame) -> DataFrame:
    """Pearson correlation between document length in characters and
    in whitespace tokens — the sanity statistic behind length-based
    quality cuts (they should correlate strongly; a weak corr flags a
    tokenizer or ingest bug).

    NOT ``F.corr``: streaming-covariance aggregates accumulate doubles
    in partition order, so Spark's and DuckDB's results can differ in
    the last ulp and break the value-hash. Both engines instead
    compute the five EXACT integer sums (n, Σx, Σy, Σxy, Σx², Σy² —
    all LONG, associative, order-independent) and derive r from them
    with the identical closed-form expression: deterministic double
    math on identical inputs. Also the right scale shape — one
    map-side-partial aggregate, six longs on the wire.
    """
    x = F.length("text").cast("long")
    y = F.size(F.split(F.col("text"), " ")).cast("long")
    agg = documents.agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = F.col("sxy") * n - sx * sy
    vx = F.col("sxx") * n - sx * sx
    vy = F.col("syy") * n - sy * sy
    # vx*vy would overflow LONG (each ~1e13 at sf0.1) — cast the exact
    # longs to double first; they're < 2^53 so the conversion is exact
    # on both engines (past ~1e15 per-term switch to a scaled variant)
    return agg.select(
        "n",
        F.round(cov / F.sqrt(vx.cast("double") * vy.cast("double")), 6)
         .alias("corr_chars_tokens"))


def pivot_counts(df: DataFrame, row_key: str = "source",
                 col_key: str = "lang",
                 values: tuple[str, ...] = ("de", "en", "es", "fr", "zh")
                 ) -> DataFrame:
    """Cross-tab pivot: one row per ``row_key``, one LONG count column
    per enumerated ``col_key`` value — the corpus composition matrix
    (source × language) every curation report opens with.

    Passing ``values`` explicitly matters at scale: without it Spark
    runs an extra full scan just to discover the pivot columns (and
    caps them at spark.sql.pivotMaxValues). With the list given, the
    plan is a single partial-aggregated groupBy — shuffle rows ≤
    |row_key| × |values|. Missing combinations surface as 0, not
    null, matching the SQL CASE-sum formulation.
    """
    out = df.groupBy(row_key).pivot(col_key, list(values)).count()
    return out.select(
        row_key,
        *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("long").alias(v)
          for v in values])


def unpivot_counts(wide: DataFrame, row_key: str = "source",
                   col_key: str = "lang",
                   values: tuple[str, ...] = ("de", "en", "es", "fr", "zh"),
                   value_col: str = "n") -> DataFrame:
    """Unpivot/melt — the inverse of ``pivot_counts``: one (row_key,
    col_key, value) row per cell of the crosstab. DataFrame.unpivot
    plans as a single Expand over the wide rows (|rows| × |values|
    output, no shuffle at all) — the shape that turns a report matrix
    back into the tidy relation joins and filters want.

    Zero-filled cells survive the round trip (pivot emits 0, unpivot
    keeps it), so ``unpivot_counts(pivot_counts(df))`` equals the
    plain group-by count over observed pairs UNION the zero cells —
    the round-trip is equivalence-tested and the qkey oracle is the
    CASE-sum cross join, including the zeros.
    """
    out = wide.unpivot(
        ids=[row_key], values=list(values),
        variableColumnName=col_key, valueColumnName=value_col)
    return out.select(row_key, col_key, F.col(value_col).cast("long"))


def segment_top_orders(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, k: int = 3) -> DataFrame:
    """Top-k orders by revenue within every market segment.

    Per-group top-k is THE reporting shape a plain global top-k
    (``top_revenue_orders``) doesn't cover. Revenue is pre-aggregated
    per order first (map-side combinable, shuffle keyed on orderkey),
    the segment arrives via the orders⋈customer join, and the ranking
    runs through ``partitioning.topk_per_group`` — the two-phase local
    heap + bounded final window, never a per-segment global sort (5
    segments over 1.5 B orders would otherwise be 5 giant sort tasks).

    Total order for the rank: (revenue DESC, orderkey ASC) — orderkey
    is unique, so the k boundary is deterministic and the DuckDB
    one-window oracle must hash-match.
    """
    from .partitioning import topk_per_group

    rev = (lineitem.groupBy("l_orderkey")
           .agg(F.sum(_cents(F.col("l_extendedprice")
                             * (1 - F.col("l_discount"))))
                .cast("long").alias("revenue_cents")))
    j = (orders.select("o_orderkey", "o_custkey")
         .join(customer.select("c_custkey", "c_mktsegment"),
               F.col("o_custkey") == F.col("c_custkey"))
         .join(rev, F.col("l_orderkey") == F.col("o_orderkey")))
    return topk_per_group(
        j.select("c_mktsegment", "o_orderkey", "revenue_cents"),
        ["c_mktsegment"],
        [F.desc("revenue_cents"), F.asc("o_orderkey")], k)


def supplier_diversity(lineitem: DataFrame, part: DataFrame,
                       supplier: DataFrame, max_size: int = 10) -> DataFrame:
    """Q16 silhouette: distinct-supplier count per (brand, type) for
    small parts, excluding blacklisted suppliers.

    The scale-defining pieces: the blacklist (suppliers with negative
    balance — Q16's complaint predicate on the fixture schema) is a
    tiny filtered dim, broadcast as a left-anti join so the fact side
    never exchanges for the exclusion; ``countDistinct`` plans as
    Spark's two-stage distinct aggregate — partial (brand, type,
    suppkey) dedup before the count shuffle, so the second exchange
    carries at most |groups|×|suppliers| rows, not the fact table.
    The part join stays a shuffle join for AQE to re-plan (at 100 TB
    part is not constant-size like nation/region).
    """
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = (lineitem.select("l_partkey", "l_suppkey")
          .join(F.broadcast(bad),
                F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"))
    pj = (part.filter(F.col("p_size") <= max_size)
          .select("p_partkey", "p_brand", "p_type"))
    return (li.join(pj, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame,
                           brand: str = "Brand#1",
                           frac: float = 0.5) -> DataFrame:
    """Q17 silhouette: revenue from lineitems whose quantity is below
    ``frac`` × that part's average quantity, for one brand.

    The correlated scalar subquery (``l_quantity < 0.5 * (SELECT
    avg(l_quantity) ... WHERE l_partkey = ...)``) is decorrelated the
    way Catalyst would: pre-aggregate avg quantity per part (partial
    agg, one ≤|parts|-row shuffle), then a key join back to the fact —
    never a per-row subquery re-execution. The brand filter prunes the
    part side to a broadcastable sliver; the per-part average is
    computed over ALL lineitems of the part (Q17 semantics), so the
    avg aggregate cannot be pushed under the brand filter.

    Determinism: fixture quantities are integral doubles, so
    sum/count — and therefore the avg and the ``frac×avg`` threshold —
    are exact and engine-identical; revenue sums exact cents.
    """
    pa = (lineitem.groupBy("l_partkey")
          .agg(F.avg("l_quantity").alias("avg_qty")))
    pk = part.filter(F.col("p_brand") == brand).select("p_partkey")
    return (lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
            .join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
            .join(pa, "l_partkey")
            .filter(F.col("l_quantity") < frac * F.col("avg_qty"))
            .agg(F.count("*").alias("n_small"),
                 F.sum(_cents(F.col("l_extendedprice")))
                 .cast("long").alias("small_revenue_cents")))


def sales_cube(lineitem: DataFrame) -> DataFrame:
    """CUBE over (returnflag, linestatus): every subtotal combination
    plus the grand total in one pass — the grouping-sets completion of
    ``sales_rollup`` (ROLLUP emits only the prefix hierarchy).

    Spark plans CUBE as one Expand (×4 grouping sets here) feeding the
    SAME partial-aggregate pipeline as a plain group-by, so the
    shuffle still carries ≤ Σ|set cardinalities| rows — subtotals cost
    the expand factor on the map side, never a second scan.
    ``grouping_id`` (bit i set ⇔ column i rolled up, first column =
    MSB in both engines) disambiguates a rolled-up NULL from a data
    NULL and pins the grouping-set semantics in the oracle hash.
    """
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().cast("int").alias("gid"),
             F.count("*").alias("n"),
             F.sum(_cents(F.col("l_extendedprice")))
             .cast("long").alias("rev_cents"))
        .select("l_returnflag", "l_linestatus", "gid", "n", "rev_cents")
    )


def profile_table(documents: DataFrame) -> DataFrame:
    """Per-column data-profiling snapshot: row count, null count,
    exact distinct count, min and max (as strings for a uniform
    schema), one output row per column — the ingest-time sanity
    screen every pipeline runs before trusting a new drop.

    One aggregation over one scan: the multi-column distinct counts
    plan as a single multi-distinct aggregate (Catalyst rewrites k
    distinct aggs into one Expand ×k + two-stage agg — k× map-side
    rows, never k scans). min/max are computed on the NATIVE type and
    cast to string after (lexicographic min of a numeric column would
    be wrong). Exact distincts are the fixture-correctness twin; the
    bounded-state billion-row path is approx_count_distinct, the same
    trade recorded for sketch_profile/length_profile.
    """
    cols = documents.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = documents.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(column, n_nulls, n_distinct, min_val, max_val)",
        "__n AS n_rows",
    ).select("column", "n_rows", "n_nulls", "n_distinct",
             "min_val", "max_val")


def agg_incremental(archive: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental aggregate maintenance: merge a pre-aggregated
    archive state with a fresh delta batch and get EXACTLY the
    full-recompute answer — the contract that lets a 100 TB nightly
    ETL touch only the new day's partition instead of re-scanning
    history.

    Works because every statistic kept is a mergeable partial state:
    counts and exact-cents sums add; min/max combine. (An avg would be
    kept as (sum, n), never as the finished ratio.) Both inputs
    collapse to ≤|groups| rows before the union, so the merge step is
    constant-size regardless of history length.

    Returns per (returnflag, linestatus): n_items, rev_cents,
    max_ship_day. The qkey feeds a shipdate-split lineitem through
    this and the oracle computes the UNSPLIT aggregate — hash equality
    IS the merge-correctness proof.
    """
    def partial(df: DataFrame) -> DataFrame:
        return (df.groupBy("l_returnflag", "l_linestatus")
                .agg(F.count("*").alias("n_items"),
                     F.sum(_cents(F.col("l_extendedprice")))
                     .cast("long").alias("rev_cents"),
                     F.max(F.to_date("l_shipdate")).alias("max_ship_day")))

    return (partial(archive).unionByName(partial(delta))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("n_items").cast("long").alias("n_items"),
                 F.sum("rev_cents").cast("long").alias("rev_cents"),
                 F.max("max_ship_day").alias("max_ship_day")))


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key: str = "doc_id") -> DataFrame:
    """CDC snapshot diff: classify every key across two table versions
    as added / removed / changed / same and count each class — the
    audit step between merge_upsert (which applies changes) and
    orders_reconcile (which only checks key presence).

    Both sides collapse to (key, row_digest) BEFORE the full-outer
    join — ~40 bytes per row on the wire however wide the table — and
    the digest comparison classifies changes without shipping
    payloads. xxhash64 over the concatenated row is engine-specific,
    so the qkey pins the CLASSIFICATION (which compares digests only
    within one engine); the oracle classifies via direct column
    comparison — agreement proves digest equality ⇔ value equality on
    the fixture.
    """
    def keyed(df: DataFrame, tag: str) -> DataFrame:
        payload = [c for c in df.columns if c != key]
        # NULL-safe digest: interleave a (never-null) null-flag with
        # each value so NULL and any literal sentinel cannot collide,
        # and NULL==NULL compares as 'same' — matching the oracle's
        # IS NOT DISTINCT FROM semantics
        cols = []
        for c in payload:
            cols.append(F.col(c).isNull().cast("int"))
            cols.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
        return df.select(F.col(key), F.xxhash64(*cols).alias(f"sig_{tag}"))

    j = keyed(old, "old").join(keyed(new, "new"), key, "full_outer")
    status = (F.when(F.col("sig_old").isNull(), "added")
              .when(F.col("sig_new").isNull(), "removed")
              .when(F.col("sig_old") == F.col("sig_new"), "same")
              .otherwise("changed"))
    return (j.select(status.alias("status"))
            .groupBy("status").agg(F.count("*").alias("n_keys")))


def big_spender_orders(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, min_qty: float = 200.0,
                       k: int = 20) -> DataFrame:
    """Q18 silhouette: large-volume orders — the HAVING-on-aggregate
    shape (``sum(quantity) > T``) feeding a join back to the order and
    customer rows.

    The aggregate-then-filter runs FIRST (partial agg, one
    ≤|orders|-row shuffle, then a selective filter), so the joins see
    only qualifying orderkeys — Catalyst cannot push a HAVING below
    its aggregate, but expressing the plan this way keeps the
    expensive fact-fact join on the post-filter sliver. Final top-k is
    TakeOrderedAndProject on (total_qty DESC, orderkey), never a full
    sort. Quantities are integral doubles → the LONG cast is exact.
    """
    q = (lineitem.groupBy("l_orderkey")
         .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
         .filter(F.col("total_qty") > min_qty))
    return (q.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(customer, F.col("c_custkey") == F.col("o_custkey"))
            .select("c_name", "o_custkey", "o_orderkey",
                    F.to_date("o_orderdate").alias("order_day"),
                    _cents(F.col("o_totalprice")).alias("totalprice_cents"),
                    "total_qty")
            .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
            .limit(k))


def returned_revenue_by_customer(customer: DataFrame, orders: DataFrame,
                                 lineitem: DataFrame,
                                 start: str = "1997-01-01",
                                 end: str = "1997-07-01",
                                 k: int = 20) -> DataFrame:
    """Q10 silhouette: returned-item revenue per customer in a date
    window, top-k offenders.

    Date filter prunes the orders scan (pushed), the returnflag filter
    prunes lineitem (pushed), revenue pre-aggregates per customer
    BEFORE the customer join — the dimension join touches ≤|customers|
    rows however large the facts. Top-k is the heap, tie-broken by
    custkey.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    returned = (lineitem.filter(F.col("l_returnflag") == "R")
                .select("l_orderkey", "l_extendedprice", "l_discount"))
    rev = (returned.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
           .groupBy("o_custkey")
           .agg(F.sum(_cents(F.col("l_extendedprice")
                             * (1 - F.col("l_discount"))))
                .cast("long").alias("revenue_cents")))
    return (rev.join(customer.select("c_custkey", "c_name"),
                     F.col("c_custkey") == F.col("o_custkey"))
            .select("c_custkey", "c_name", "revenue_cents")
            .orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
            .limit(k))


def nation_trade_flows(lineitem: DataFrame, orders: DataFrame,
                       customer: DataFrame, supplier: DataFrame,
                       nation: DataFrame, n1: str = "NATION_1",
                       n2: str = "NATION_2") -> DataFrame:
    """Q7 silhouette: bilateral trade volume between two nations per
    ship year — the two-role dimension join (nation joins the star
    TWICE, once through the customer and once through the supplier)
    with a disjunctive cross-pair predicate.

    Both nation roles are constant-size and broadcast; filtering each
    role to the two named nations BEFORE the broadcast makes the
    disjunction a cheap post-join filter on two tiny columns. Facts
    join on their natural keys and never see a cartesian.
    """
    pair = F.broadcast(
        nation.filter(F.col("n_name").isin(n1, n2)))
    cn = pair.select(F.col("n_nationkey").alias("c_nk"),
                     F.col("n_name").alias("cust_nation"))
    sn = pair.select(F.col("n_nationkey").alias("s_nk"),
                     F.col("n_name").alias("supp_nation"))
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate",
                        "l_extendedprice", "l_discount")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(cn, F.col("c_nationkey") == F.col("c_nk"))
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(sn, F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation",
                 F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(F.sum(_cents(F.col("l_extendedprice")
                          * (1 - F.col("l_discount"))))
             .cast("long").alias("revenue_cents")))


def best_supplier_per_part(lineitem: DataFrame, part: DataFrame,
                           supplier: DataFrame,
                           max_size: int = 5) -> DataFrame:
    """Q2 silhouette: for each small part, the best supplier that has
    actually shipped it (max account balance, suppkey tie-break) — the
    correlated argmax subquery, decorrelated.

    The distinct (part, supplier) projection collapses fact volume
    first (the only fact-sized exchange); the argmax is a window
    partitioned per part — millions of independent partitions, each a
    handful of rows, the opposite of a global sort. The supplier
    attribute join is dimension-sized.
    """
    ps = (lineitem.select("l_partkey", "l_suppkey")
          .join(part.filter(F.col("p_size") <= max_size)
                .select("p_partkey"),
                F.col("l_partkey") == F.col("p_partkey"))
          .select("l_partkey", "l_suppkey").distinct())
    j = ps.join(supplier.select("s_suppkey", "s_name", "s_acctbal"),
                F.col("l_suppkey") == F.col("s_suppkey"))
    w = Window.partitionBy("l_partkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("l_partkey").alias("p_partkey"),
                    "s_suppkey", "s_name", "s_acctbal"))


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Q19 silhouette: revenue under an OR-of-ANDs predicate spanning
    both join sides — the disjunction that defeats naive single-column
    pushdown.

    Expressed as one boolean expression over the joined row; Catalyst
    still pushes the implied per-side domains (brand/type IN-list to
    the part scan) and AQE picks the join strategy. The win at 100 TB
    is NOT pre-splitting into three unioned scans (three passes over
    the fact table); it is one pass with a vectorized predicate.
    """
    j = lineitem.select("l_partkey", "l_quantity",
                        "l_extendedprice", "l_discount") \
        .join(part.select("p_partkey", "p_brand", "p_type"),
              F.col("l_partkey") == F.col("p_partkey"))
    q = F.col("l_quantity")
    cond = (((F.col("p_brand") == "Brand#1") & (q <= 10))
            | ((F.col("p_brand") == "Brand#2") & q.between(10, 20))
            | ((F.col("p_type") == "PROMO") & (q >= 30)))
    return (j.filter(cond)
            .agg(F.count("*").alias("n_items"),
                 F.sum(_cents(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))))
                 .cast("long").alias("revenue_cents")))


def market_share(lineitem: DataFrame, orders: DataFrame,
                 customer: DataFrame, supplier: DataFrame,
                 nation: DataFrame, region: DataFrame,
                 region_name: str = "ASIA",
                 nation_name: str = "NATION_3") -> DataFrame:
    """Q8 silhouette: one supplier-nation's share of a region's import
    revenue per order year — the conditional-aggregate ratio over a
    6-way star with nation again in two roles.

    Share divides two exact LONG cent sums (promo_revenue_share's
    determinism contract), so the ratio is reproducible double math.
    Customer-side nation⋈region collapses to a broadcast key set;
    the supplier-side nation broadcast carries the name for the
    conditional sum — neither fact join widens.
    """
    reg = region.filter(F.col("r_name") == region_name) \
        .select("r_regionkey")
    cnat = F.broadcast(
        nation.join(F.broadcast(reg),
                    F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("c_nk")))
    snat = F.broadcast(nation.select(
        F.col("n_nationkey").alias("s_nk"),
        F.col("n_name").alias("supp_nation")))
    cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    base = (
        lineitem.select("l_orderkey", "l_suppkey",
                        "l_extendedprice", "l_discount")
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(cnat, F.col("c_nationkey") == F.col("c_nk"))
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(snat, F.col("s_nationkey") == F.col("s_nk"))
        .select(F.year("o_orderdate").cast("int").alias("yr"),
                cents.alias("cents"), "supp_nation"))
    is_n = F.col("supp_nation") == nation_name
    return (base.groupBy("yr")
            .agg(F.sum(F.when(is_n, F.col("cents")).otherwise(0))
                 .cast("long").alias("nation_cents"),
                 F.sum("cents").cast("long").alias("total_cents"))
            .select("yr", "nation_cents", "total_cents",
                    F.round(F.lit(1.0) * F.col("nation_cents")
                            / F.col("total_cents"), 6).alias("share")))
