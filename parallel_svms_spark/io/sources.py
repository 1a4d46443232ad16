"""Typed IO layer.

The reference reads HDFS text directories line-at-a-time
(``TextInputFormat``, cascade_svm/Precascade1.java:10-14) and encodes
pipeline stage in *directory placement* (SURVEY §1.1). The rebuild is
columnar by construction: parquet in, DataFrame lineage instead of
stage directories, and a dense-CSV codec kept only for format parity
with the reference's record encoding (label,f1,...,fn —
cascade_svm/Midcascade.java:110-118).

Scale notes: ``spark.read.parquet`` gives vectorized reads, predicate
pushdown and partition pruning for free; at 100 TB the only knobs that
matter here are file layout (handled by the writers' ``partitionBy``)
and ``spark.sql.files.maxPartitionBytes`` (left at the 128 MB default,
correct for ~1 GB row-group parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


# Lazy-DataFrame memo keyed on (application, dir, table) — r10. One
# `spark.read.parquet` costs ~110 ms of DRIVER time (file listing +
# footer schema decode, guide §5/§6) and load_table is called once or
# more by every one of ~190 member queries per bench pass — tens of
# seconds of repeated listing of the SAME immutable files. The memo
# returns the same LAZY DataFrame object: no rows are cached or
# persisted anywhere (every action still scans parquet from disk —
# Spark's own filesourcePartitionFileCacheSize blesses exactly this
# listing-reuse, guide §6); only the driver-side listing/plan-build
# repeats are removed. Keyed by applicationId so a fresh session (the
# driver's own, a restarted local one) never sees another session's
# plans. Callers that rewrite a directory IN PLACE between loads must
# use spark.read.parquet directly (fixture tables are immutable; the
# repo's only mutated-dir readers already do).
_LOAD_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (S1 analog: the line-text scan of
    cascade_svm/Precascade1.java:10-14, columnar here).

    All fixture timestamp columns (``events.ts``, ``lineitem.l_shipdate``,
    ``orders.o_orderdate``) are parquet ``timestamp[us]`` with NO timezone
    (verified with pyarrow.parquet.read_schema), which Spark 4 loads as
    TIMESTAMP_NTZ. Time functions like ``unix_millis`` reject NTZ, so
    normalize EVERY timestamp_ntz column to TIMESTAMP here; the session
    timezone is pinned to UTC (session.py), making the cast
    value-identical to the naive timestamps DuckDB's oracle sees. A
    nanos-as-long compatibility branch is kept for older
    TIMESTAMP(NANOS) fixture layouts of ``events.ts``.
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    hit = _LOAD_MEMO.get(key)
    if hit is not None:
        return hit
    # runtime-settable confs; needed even when the caller's session was
    # not built by our session.py (e.g. the driver's own session). The
    # UTC pin matters on any non-UTC host: the NTZ→TIMESTAMP cast below
    # reinterprets wall-clock values in the SESSION zone, and only UTC
    # makes that value-identical to the naive timestamps DuckDB sees.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # legacy nanos-as-long: integer `div`, not float division —
        # ns values exceed double's 2^53 precision and would round
        # the microsecond off by one
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            # UTC session tz ⇒ value-identical reinterpretation; keeps
            # unix_millis/unix_micros/F.window/INTERVAL arithmetic legal
            # and the result schema aligned with the DuckDB oracle
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    _LOAD_MEMO[key] = df
    return df


def let_col(value, body):
    """Let-binding for higher-order-function expressions: evaluate
    ``value`` ONCE per row and expose it to ``body`` as a bound
    lambda variable (r9). Catalyst does NOT hoist loop-invariant
    subexpressions out of lambda bodies — referencing e.g.
    ``split(text)`` inside a ``transform`` lambda re-executes the
    split per array element, turning an O(L) projection into O(L²)
    per row (measured on one 30k-token document: 182 s inline vs
    0.9 s let-bound; a 200k-token document runs in 1.1 s let-bound
    and would be hours inline). Wrapping the value in a one-element
    array and transforming binds it as a materialized lambda
    variable, the classic HOF let-encoding:
    ``element_at(transform(array(v), x -> body(x)), 1)``."""
    return F.element_at(F.transform(F.array(value), body), 1)


# keyed on id(df) with the frame itself stored to guard against id
# reuse after gc (the stored ref also keeps the id stable)
_ENSURE_MEMO: dict[tuple[int, int], tuple[DataFrame, DataFrame]] = {}


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Guard against unsplittable scans for CPU-heavy per-row work: a
    parquet row group is the minimum split unit, so a table written as
    one fat row group (the fixtures; in production a mis-written
    ingest file) pins every downstream narrow stage to ONE task no
    matter how many cores the cluster has.

    Called by operators whose per-row cost is high (shingling, minhash,
    simhash — hundreds of string/hash ops per row), where one
    round-robin exchange of the input is repaid many times over. NOT
    applied in load_table: for cheap scans (counts, filters,
    projections) the extra exchange costs more than the work, and on a
    healthy many-row-group layout it's pure overhead.
    """
    if df.isStreaming:
        # micro-batch partitioning is the source's job (maxFilesPerTrigger
        # / kafka partitions); a blind repartition would also force an
        # exchange into every micro-batch
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    # r10: memoized per (DataFrame object, parallelism) — the probe
    # below compiles the plan (~11 ms driver time per call), and since
    # load_table now hands every caller the SAME lazy frame object,
    # repeated probes of it are pure waste (the partition count of an
    # immutable lazy plan cannot change under a fixed parallelism)
    key = (id(df), par)
    hit = _ENSURE_MEMO.get(key)
    if hit is not None and hit[0] is df:
        return hit[1]
    # public-API probe: df.rdd compiles the plan with an extra
    # InternalRow→Row deserializer appended, but that never changes the
    # partition count, and nothing executes — getNumPartitions is
    # metadata-only. (Previously used _jdf.queryExecution().toRdd(), a
    # private API of exactly the Spark-version-fragile kind that broke
    # the events family in round 3.)
    n_parts = df.rdd.getNumPartitions()
    out = df.repartition(par) if n_parts * 4 < par else df
    _ENSURE_MEMO[key] = (df, out)
    return out


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


# ---------------------------------------------------------------------------
# Reference-native dense CSV codec (format parity; FIXTURES.md §B.1)
# ---------------------------------------------------------------------------

DENSE_SCHEMA = T.StructType([
    T.StructField("label", T.IntegerType(), False),
    T.StructField("features", T.ArrayType(T.DoubleType()), False),
])


def to_dense_lines(df: DataFrame, label_col: str = "label",
                   features_col: str = "embedding") -> DataFrame:
    """Typed rows → reference dense-CSV lines ``label,f1,...,fn``
    (encoding of cascade_svm/Midcascade.java:110-118)."""
    return df.select(
        F.concat_ws(
            ",", F.col(label_col).cast("string"),
            F.array_join(F.col(features_col).cast("array<double>"), ","),
        ).alias("line")
    )


def parse_dense_lines(lines: DataFrame, col: str = "line") -> DataFrame:
    """Dense-CSV lines → ``(label INT, features ARRAY<DOUBLE>)``.

    Mirror of the parse repeated five times in the reference
    (cascade_svm/Midcascade.java:110-118, Lastcascade.java:117-125,
    Bagging_svm/Bagging1.java:111-119, Iterative_svm/Itergsv.java:53-61)
    — here once, JVM-side, no Python in the loop.
    """
    parts = F.split(F.col(col), ",")
    return lines.select(
        parts.getItem(0).cast("int").alias("label"),
        F.slice(parts, 2, F.size(parts) - 1).cast("array<double>").alias("features"),
    )


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 32,
                   sort_by: str | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) by its join
    key. Two tables bucketed the same way equi-join with NO exchange
    on either side — at 100 TB this converts the fact⋈fact shuffle
    (the single most expensive stage of a recurring pipeline) into a
    zero-movement co-located join, paid for once at write time.
    Plan-shape proof lives in tests/test_plan_shape.py."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table)


# ---------------------------------------------------------------------------
# Reference-native sparse codec (P3: label,idx1,val1,idx2,val2,...)
# ---------------------------------------------------------------------------

def to_sparse_lines(df: DataFrame, label_col: str = "label",
                    features_col: str = "embedding",
                    min_abs: float = 0.0) -> DataFrame:
    """Typed rows → reference sparse lines ``label,i1,v1,i2,v2,...``
    (the comma-alternating index/value encoding consumed by
    SvmTrainer.formSvmProblem, cascade_svm/Midcascade.java:31-49).
    Indices are 1-based ascending; features with |value| < ``min_abs``
    are dropped (that's what makes the encoding sparse)."""
    e = F.col(features_col).cast("array<double>")
    kept = F.filter(
        F.transform(e, lambda x, i: F.struct((i + 1).alias("i"),
                                             x.alias("v"))),
        lambda s: F.abs(s["v"]) >= F.lit(float(min_abs)))
    pairs = F.transform(
        kept, lambda s: F.concat_ws(",", s["i"].cast("string"),
                                    s["v"].cast("string")))
    return df.select(
        F.concat_ws(",", F.col(label_col).cast("string"),
                    F.array_join(pairs, ",")).alias("line"))


def parse_sparse_lines(lines: DataFrame, col: str = "line") -> DataFrame:
    """Sparse lines → ``(label DOUBLE, features MAP<INT,DOUBLE>)``.

    PySpark twin of the reference's formSvmProblem parse
    (cascade_svm/Midcascade.java:31-49): first comma token is the
    label, the remainder alternates index,value; featureCount =
    remaining_tokens / 2 (a trailing unpaired token is ignored, as
    StringTokenizer's countTokens()/2 does). Pure JVM expressions —
    at scale this is a narrow map pipelined out of the text scan."""
    parts = F.split(F.col(col), ",")

    # the split is let-bound per output column: element_at on an
    # inline split inside the transform lambda would re-split the
    # line per feature — O(F²·len) on wide rows (see let_col)
    def _every_other(offset):
        return let_col(parts, lambda p: F.when(
            ((F.size(p) - 1) / 2).cast("int") > 0, F.transform(
                F.sequence(F.lit(0),
                           ((F.size(p) - 1) / 2).cast("int") - 1),
                lambda j: F.element_at(p, 2 * j + offset)))
            .otherwise(F.array().cast("array<string>")))

    return lines.select(
        F.element_at(parts, 1).cast("double").alias("label"),
        F.map_from_arrays(
            F.transform(_every_other(2), lambda s: s.cast("int")),
            F.transform(_every_other(3), lambda s: s.cast("double")))
        .alias("features"))


def sparse_to_vectors(parsed: DataFrame, dim: int,
                      features_col: str = "features") -> DataFrame:
    """(label, MAP<INT,DOUBLE>) → (label, MLlib vector) for the
    linear-model path (ml/mllib_path). Indices arrive 1-based from the
    reference encoding and shift to 0-based here.

    Pure JVM: densify the map over 1..dim (element_at returns NULL for
    absent keys → 0.0) then ``array_to_vector``. MLlib treats dense
    and sparse vectors uniformly downstream; a true SparseVector
    constructor would require a row-at-a-time Python UDF (VectorUDT is
    not Arrow-batchable), which is the engine's one banned pattern —
    for very high-dim genuinely sparse data, keep the MAP column and
    aggregate on it directly instead of vectorizing."""
    from pyspark.ml.functions import array_to_vector

    dense = F.transform(
        F.sequence(F.lit(1), F.lit(int(dim))),
        lambda i: F.coalesce(F.element_at(F.col(features_col), i),
                             F.lit(0.0)))
    return parsed.select("label", array_to_vector(dense).alias("features"))


def read_dense_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: read reference-format training text from disk."""
    return parse_dense_lines(spark.read.text(path), col="value")


def write_dense_csv(df: DataFrame, path: str, label_col: str = "label",
                    features_col: str = "features") -> None:
    """S3 text sink, kept for reference format parity only."""
    to_dense_lines(df, label_col, features_col).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# JSONL corpus source/sink (the de-facto LLM training-corpus format)
# ---------------------------------------------------------------------------

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSONL sink: one JSON object per line, one file per task — the
    interchange format most public corpora (C4, the Pile, Dolma) ship
    in. Spark's JSON writer is JVM/Jackson (no Python in the path) and
    splits output by partition, so a 100 TB corpus writes with full
    parallelism; callers control file sizing with the usual
    repartition-before-write."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType | None = None) -> DataFrame:
    """JSONL source with an EXPLICIT schema (default: the documents
    table). Passing the schema skips Spark's inference pre-scan — at
    100 TB schema inference is a full extra read of the corpus — and
    pins column types so a malformed line becomes a null row
    (columnNameOfCorruptRecord semantics) instead of a type flip."""
    return spark.read.schema(schema or DOCUMENTS_SCHEMA).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink — the other columnar interchange format warehouse
    stacks (Hive/Trino) still hand over. Spark's native ORC writer:
    vectorized, predicate-pushdown-capable on read-back, splits by
    partition like parquet. Kept as a thin wrapper so the engine's IO
    surface names every supported format explicitly."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source. Schema travels in the file footer (no inference
    scan needed, unlike JSONL); vectorized read + pushdown apply as
    with parquet."""
    return spark.read.orc(path)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink: header + full RFC-4180 quoting (quote doubling via
    escape='\"') so free-text payloads with embedded commas, quotes,
    and JSON braces round-trip byte-exactly. One file per task, JVM
    writer (univocity) — same 100 TB parallel-write story as JSONL.
    CSV is the lowest-common-denominator handover format (spreadsheet
    exports, legacy ETL drops); the engine names it explicitly so
    consumers of the reference's text-file surface have a typed path
    in.

    Contract: payload cells must be NEWLINE-FREE. Embedded newlines
    would force ``multiLine`` on read, which makes files unsplittable
    (one task per file — a 100 TB non-starter); corpora with multiline
    text belong in JSONL/parquet (both handle them natively)."""
    (df.write.mode("overwrite")
     .option("header", True).option("escape", '"')
     # the writer TRIMS cell whitespace by default — a silent payload
     # mutation; pin both off so the codec is byte-lossless
     .option("ignoreLeadingWhiteSpace", False)
     .option("ignoreTrailingWhiteSpace", False)
     .csv(path))


def read_csv(spark: SparkSession, path: str,
             schema: T.StructType) -> DataFrame:
    """CSV source with a REQUIRED explicit schema (CSV carries no
    types at all, so inference is both an extra full scan AND a
    correctness hazard — '007' infers int). Quote/escape options
    mirror write_csv so the pair is a lossless codec; FAILFAST mode
    surfaces any malformed line instead of silently nulling it."""
    return (spark.read.schema(schema)
            .option("header", True).option("escape", '"')
            .option("mode", "FAILFAST")
            .csv(path))


def write_partitioned(df: DataFrame, path: str,
                      partition_col: str = "source") -> None:
    """Directory-partitioned parquet sink (`partition_col=value/`
    layout): the physical design that turns partition-key filters into
    pruned scans and makes CDC write-back partition-local."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def upsert_partitioned(spark: SparkSession, path: str, updates: DataFrame,
                       key: str = "doc_id",
                       partition_col: str = "source") -> list[str]:
    """CDC write-back over a partitioned table, touching ONLY the
    partitions the update batch lands in:

    1. enumerate the batch's distinct partition values (driver-small —
       a CDC batch touches few partitions by construction);
    2. read just those partitions (the `isin` filter is partition
       pruning, not a data filter — untouched directories are never
       scanned);
    3. `merge_upsert` the slice;
    4. write with ``partitionOverwriteMode=dynamic`` so Spark replaces
       exactly the partition directories present in the result —
       untouched partitions are neither read nor rewritten.

    At 100 TB this is the difference between rewriting the corpus and
    rewriting a few shards per ingest tick. Contract: a key's
    partition value must be stable across updates (standard for
    source-/date-partitioned corpora); a moved key would leave its old
    row in the old partition. Returns the touched partition values
    (handy for tests/metrics).
    """
    from parallel_svms_spark.operators.relational import merge_upsert
    parts = sorted(r[0] for r in
                   updates.select(partition_col).distinct().collect())
    cur = (spark.read.parquet(path)
           .filter(F.col(partition_col).isin(parts)))
    merged = merge_upsert(cur, updates, key=key)
    (merged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(partition_col).parquet(path))
    return parts


def read_jsonl_quarantine(spark: SparkSession, path: str,
                          schema: T.StructType | None = None
                          ) -> tuple[DataFrame, DataFrame]:
    """JSONL source with corrupt-line quarantine: returns
    (clean_rows, quarantined_raw_lines).

    Real corpus drops contain malformed lines; silently nulling them
    (read_jsonl's PERMISSIVE default) loses the evidence. This variant
    keeps the raw text of every unparseable line in a
    ``_corrupt_record`` column so the pipeline can count, sample, and
    re-ingest them after a fix — the quarantine-table pattern. One
    scan feeds both outputs (the split is two filters over the same
    cached-able plan, not two reads). Schema stays explicit: no
    inference pre-scan at any scale.
    """
    base = schema or DOCUMENTS_SCHEMA
    with_corrupt = T.StructType(
        list(base.fields)
        + [T.StructField("_corrupt_record", T.StringType())])
    # cache(): Spark refuses a query that reads ONLY the corrupt
    # column from a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN —
    # the column exists only during full-row parsing); materializing
    # the parsed rows once lifts the restriction and also means the
    # clean/quarantine split costs ONE parse, not two. The cache holds
    # one ingest batch — bounded by the drop being ingested, and
    # droppable by the caller via spark.catalog.clearCache().
    df = (spark.read.schema(with_corrupt)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(path)).cache()
    clean = (df.filter(F.col("_corrupt_record").isNull())
             .drop("_corrupt_record"))
    quarantined = (df.filter(F.col("_corrupt_record").isNotNull())
                   .select("_corrupt_record"))
    return clean, quarantined


def write_events_daily(events: DataFrame, path: str) -> None:
    """Date-partitioned event-lake sink (`event_date=YYYY-MM-DD/`
    directories): the standard physical design for append-heavy event
    data, making every time-range query a pruned scan and every
    daily-ingest overwrite partition-local (pair with
    ``partitionOverwriteMode=dynamic`` like upsert_partitioned).

    The partition key is DERIVED (``to_date(ts)``) and stored alongside
    the full-resolution ``ts`` — readers keep microsecond timestamps;
    the directory layout is pure physical design. One shuffle-free
    write: partitionBy splits files within each task, no exchange.
    Rows are sorted by ``ts`` WITHIN each task first (also no
    exchange), so parquet row-group min/max stats are tight and the
    residual sub-day ``ts`` predicate skips row groups, not just
    directories — directory pruning gets the day, statistics pruning
    gets the hour.
    """
    (events.withColumn("event_date", F.to_date("ts"))
     .sortWithinPartitions("ts")
     .write.mode("overwrite").partitionBy("event_date").parquet(path))


def read_events_range(spark: SparkSession, path: str,
                      start: str, end: str) -> DataFrame:
    """Time-range read over a ``write_events_daily`` lake: the
    [start, end) predicate lands on the partition column, so Spark
    enumerates only the matching ``event_date=`` directories
    (PartitionFilters in the scan — plan-tested) and never opens the
    rest. The residual sub-day bounds apply to ``ts`` inside the
    surviving partitions; the partition column is dropped so the
    result schema matches the unpartitioned events table.
    """
    df = spark.read.parquet(path)
    # partition bound is <= on the END day: a sub-day end (e.g.
    # '2024-01-05 12:00') lives INSIDE the event_date=2024-01-05
    # directory — `<` would prune it and silently drop the morning's
    # rows. The residual ts < end filter trims the tail; for an exact
    # midnight end the extra directory costs one row-group-stats probe
    return (df.filter((F.col("event_date") >= F.to_date(F.lit(start)))
                      & (F.col("event_date") <= F.to_date(F.lit(end))))
            .filter((F.col("ts") >= F.lit(start).cast("timestamp"))
                    & (F.col("ts") < F.lit(end).cast("timestamp")))
            .drop("event_date"))


def write_split_corpus(documents: DataFrame, path: str,
                       fractions: list[tuple[str, float]] | None = None,
                       salt: str = "") -> None:
    """Split-partitioned corpus sink (``split=train/`` directories):
    materialize ``sharding.dataset_split``'s assignment as the
    physical layout, so every downstream consumer reads exactly its
    split as a pruned scan — the trainer never enumerates eval files
    and vice versa (the leakage story made physical). The derived
    partition key rides the same zero-shuffle projection as the
    operator; partitionBy splits files within each task, no exchange.
    """
    from parallel_svms_spark.operators.sharding import dataset_split
    (dataset_split(documents, fractions=fractions, salt=salt)
     .write.mode("overwrite").partitionBy("split").parquet(path))


def read_split(spark: SparkSession, path: str, split: str) -> DataFrame:
    """Read ONE split of a ``write_split_corpus`` lake: the equality
    predicate lands on the partition column, so Spark enumerates only
    the ``split=<name>/`` directory (PartitionFilters — plan-tested)
    and never opens the others. The partition column is dropped so the
    result schema matches the unpartitioned documents table."""
    return (spark.read.parquet(path)
            .filter(F.col("split") == split).drop("split"))


def write_schema_generation(df: DataFrame, path: str, gen: int) -> None:
    """Append one schema GENERATION to an evolving parquet dataset:
    each generation lands in its own ``gen=<n>/`` directory, so a
    dataset whose producers added/dropped columns over time coexists
    as differently-schemaed parquet footers under one root — the
    situation every long-lived lake table is in after a schema
    migration."""
    df.write.mode("overwrite").parquet(f"{path}/gen={int(gen)}")


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read an evolving parquet dataset with SCHEMA MERGING: Spark
    reconciles the per-file footers into the union schema
    (``mergeSchema=true``) and fills columns a generation never wrote
    with NULL — ``unionByName(allowMissingColumns)`` semantics applied
    at the STORAGE layer, where the reader (not the writer) absorbs
    the migration.

    Scale note: mergeSchema's footer reconciliation is a parallel
    job over file footers (not data), paid once per read — the
    standard advice holds: bake the merged schema into the catalog
    after a migration settles and pass it explicitly; this reader is
    the migration-window path. Column pruning and predicate pushdown
    still apply per-file against whatever subset of the merged schema
    the file physically has."""
    return (spark.read.option("mergeSchema", "true").parquet(path)
            .drop("gen"))
