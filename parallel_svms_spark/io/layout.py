"""Physical-layout management: Z-order clustering and small-file
compaction.

The reference never manages file layout — its stages communicate via
HDFS text directories whose shape is whatever the previous reducer
count produced (SURVEY §1.1). At 100 TB layout IS the query plan:
which files a scan can skip decides whether a selective query reads
gigabytes or terabytes. Two operators close that gap:

* ``write_zordered`` — multi-column data clustering via Morton
  (bit-interleaved) ordering, the publicly documented technique behind
  Delta Lake ``OPTIMIZE ZORDER BY`` and Databricks' data-skipping
  layout (Morton 1966; the lakehouse application is described in the
  Delta Lake VLDB'20 paper). Sorting by one column prunes one
  predicate dimension; interleaving k columns' bits gives every file a
  tight min/max envelope in ALL k dimensions, so conjunctive range
  predicates skip files on any subset of the clustered columns.

* ``compact_files`` — small-file compaction (the lakehouse
  ``OPTIMIZE``/bin-packing step). Streaming ingestion and
  fine-grained ``partitionBy`` writers emit many small files; each
  parquet file costs a footer read, an open, and a task schedule, so
  10⁶ kilobyte-files can be slower to scan than 10² gigabyte-files of
  the same bytes. Compaction reads the fragmented dataset and rewrites
  it as ``ceil(total_bytes / target_file_bytes)`` files WITHOUT a
  shuffle (``coalesce``, not ``repartition`` — merging partitions
  needs no exchange).

Both are pure re-layouts: the row multiset is unchanged, which is what
their round-trip qkeys (`zorder_roundtrip`, `compaction_roundtrip`)
pin against the DuckDB oracle reading the ORIGINAL table.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _scale_to_grid(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into the integer grid [0, 2**bits) by
    min/max normalization. Constant columns (hi == lo) collapse to
    cell 0 — they contribute nothing to the ordering, which is the
    right degenerate behavior."""
    cells = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(F.greatest(
        F.floor(scaled * F.lit(float(cells))).cast("long"),
        F.lit(0)), F.lit(int(cells)))


def zorder_key(grid_cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of grid column j lands at position
    ``b * k + j`` of the z-value. Pure JVM bit arithmetic (shiftleft /
    shiftright / bitwise and-or), codegen'd — ``bits * k`` terms, no
    UDF. ``bits * k`` must stay ≤ 62 to fit a signed long."""
    k = len(grid_cols)
    if bits * k > 62:
        raise ValueError(f"bits*k = {bits * k} exceeds a signed long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(grid_cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + j))
    return z


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 12, n_files: int = 16) -> None:
    """Write ``df`` as parquet clustered by the Morton order of
    ``cols``.

    Plan shape: ONE tiny min/max aggregate (k·2 scalars to the
    driver — the only driver-side data, by contract), then
    ``repartitionByRange`` on the z-value (one exchange, sampled range
    boundaries, so files hold contiguous z-ranges and their per-column
    min/max envelopes are tight) + ``sortWithinPartitions`` (no extra
    exchange) + parquet write. Parquet min/max footer stats then let
    any engine — Spark row-group skipping, DuckDB file pruning — skip
    files/row-groups for range predicates on ANY of the clustered
    columns; ``tests/test_layout.py`` measures the file-level envelope
    shrinkage directly from the footers.

    At 100 TB: the min/max agg is map-side-partial (bytes per task);
    the single range exchange is the same cost as the sort any
    clustered write needs; nothing else is added. Rewrite cadence and
    target file count are the operator's only knobs (``n_files`` maps
    to ~1 GB files in production, 16 small files in tests).
    """
    stats = df.agg(*[f(c).alias(f"{n}_{c}") for c in cols
                     for n, f in (("lo", F.min), ("hi", F.max))]).first()
    if any(stats[f"lo_{c}"] is None for c in cols):
        # empty input (or an all-NULL cluster column): no order to
        # impose — write the rows (if any) as-is
        df.write.mode("overwrite").parquet(path)
        return
    grid = [_scale_to_grid(F.col(c), float(stats[f"lo_{c}"]),
                           float(stats[f"hi_{c}"]), bits) for c in cols]
    (df.withColumn("__z", zorder_key(grid, bits))
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def file_column_envelopes(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per data file, straight from the parquet
    footers — the same statistics a scan's pruning consults. Local-FS
    helper for tests/audits (an object-store variant would list via
    the filesystem API)."""
    import pyarrow.parquet as pq
    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        idx = md.schema.names.index(col)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                los.append(st.min)
                his.append(st.max)
        if los:
            out.append((min(los), max(his)))
    return out


def files_overlapping(path: str, boxes: dict) -> tuple[int, int]:
    """(n_overlapping, n_total) data files whose per-column envelopes
    intersect EVERY [lo, hi] box in ``boxes`` — the files a pruned
    scan with that conjunctive range predicate must open."""
    cols = list(boxes)
    envs = {c: file_column_envelopes(path, c) for c in cols}
    n_files = len(envs[cols[0]])
    if any(len(envs[c]) != n_files for c in cols):
        raise ValueError("column stats missing from some files")
    n_hit = sum(
        1 for i in range(n_files)
        if all(not (envs[c][i][1] < boxes[c][0]
                    or envs[c][i][0] > boxes[c][1]) for c in cols))
    return n_hit, n_files


def dataset_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a local parquet dataset
    directory (recursive, so ``partitionBy`` layouts count too)."""
    n, total = 0, 0
    for root, _dirs, names in os.walk(path):
        for name in names:
            if name.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, name))
    return n, total


def compact_files(spark: SparkSession, path: str, out_path: str,
                  target_file_bytes: int = 128 << 20) -> int:
    """Rewrite a fragmented parquet dataset as
    ``ceil(total_bytes / target_file_bytes)`` files; returns the
    output file count.

    ``coalesce``, not ``repartition``: merging input splits into fewer
    tasks needs NO exchange — each output file is a concatenation of
    input partitions read straight through. (``repartition`` would
    shuffle every byte to achieve near-equal output sizes; bin-packing
    compaction does not need that precision.) The 128 MB default
    matches ``spark.sql.files.maxPartitionBytes`` so compacted files
    re-split cleanly on read.

    At 100 TB this runs per partition-directory of a partitioned lake
    (compact each day/source independently — embarrassingly parallel
    across partitions, and only partitions whose small-file count
    crosses a threshold need rewriting at all)."""
    _n_in, total = dataset_file_stats(path)
    n_out = max(1, math.ceil(total / float(target_file_bytes)))
    (spark.read.parquet(path).coalesce(n_out)
        .write.mode("overwrite").parquet(out_path))
    return dataset_file_stats(out_path)[0]


def write_bucketed_table(df: DataFrame, table: str, path: str,
                         bucket_col: str, n_buckets: int = 8,
                         one_file_per_bucket: bool = True) -> None:
    """Hash-bucketed, bucket-sorted parquet table (Hive bucketing
    spec): rows land in ``n_buckets`` files by ``hash(bucket_col)``,
    sorted by the key inside each bucket, and the bucket spec is
    recorded in the catalog so Catalyst can PROVE two tables with the
    same spec are co-partitioned.

    This is the pre-paid shuffle: a fact⋈fact join on the bucket key
    reads both sides bucket-aligned and plans a SortMergeJoin with NO
    Exchange on either side (pinned by tests/test_layout.py) — at
    100 TB, bucketing the two biggest tables once at ingest deletes
    the dominant recurring shuffle from every downstream join, the
    same trade the Z-order writer makes for range predicates.

    ``one_file_per_bucket`` repartitions by the key first so each
    bucket is a single file — that is the layout under which Spark
    can also elide the merge-sort on read (bucketed SortBy only
    guarantees per-file order; many files per bucket forces a re-sort
    even though the exchange is still saved).

    External table at ``path`` (an in-memory-catalog session keeps
    the bucket metadata for its lifetime; a metastore-backed cluster
    keeps it durably). Overwrites any previous table of this name.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df
    if one_file_per_bucket:
        w = w.repartition(n_buckets, F.col(bucket_col))
    (w.write.mode("overwrite")
     .bucketBy(n_buckets, bucket_col)
     .sortBy(bucket_col)
     .option("path", path)
     .saveAsTable(table))
