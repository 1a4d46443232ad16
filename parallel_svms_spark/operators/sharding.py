"""Training-shard assembly operators for LLM-data pipelines
(SURVEY §2.8 extension surface: what sits between "deduped corpus"
and "tokenizer-ready shards").

- ``pack_shards``: assign documents to fixed-token-budget training
  shards in a deterministic global order. Implemented as a SCALABLE
  two-pass prefix sum (per-range partial sums + driver offsets), not
  a single-partition window — but numerically identical to the
  textbook ``SUM() OVER (ORDER BY ...)`` formulation, which is
  exactly what the DuckDB oracle runs against it.
- ``stratified_sample``: deterministic per-label sample (eval-set
  carving) via md5-ranked row_number — reproducible across engines
  and runs, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def pack_shards(documents: DataFrame, budget_tokens: int = 4096,
                id_col: str = "doc_id",
                text_col: str = "text",
                order: str = "id", tokenizer: str = "ws",
                merges: list[tuple[str, str]] | None = None) -> DataFrame:
    """Greedy sequential shard packing: walk docs in a deterministic
    total order, cut a new shard whenever the running token total
    would pass a multiple of ``budget_tokens``. Returns
    (id, n_tokens, shard).

    ``order='id'`` (default) walks in ``id_col`` order — the original
    layout. ``order='hash'`` walks in ``(md5(id), id)`` order: a
    seedless DETERMINISTIC PSEUDO-SHUFFLE, the "shuffle the corpus
    before packing" step training pipelines perform so adjacent
    documents in a shard are decorrelated (same md5 coin as the
    sampling family, so the order — and therefore every shard
    assignment — is engine-reproducible and the DuckDB oracle
    hash-matches). Identical machinery either way: only the range
    key changes.

    shard = floor(prefix_tokens_before_this_doc / budget) — the
    standard "concatenate then split every N tokens" layout used to
    build LLM training shards, expressed so every engine agrees:
    a document's shard depends only on the EXACT prefix sum before it.

    Scale shape: the naive formulation is a global-ORDER-BY window —
    one partition, one task, dead at 100 TB. This implementation is
    the classic two-pass distributed prefix sum instead:

    1. range-partition by id (``repartitionByRange`` — Spark samples
       range bounds; P parallel partitions, each internally sorted);
    2. per-partition partial token sums → driver (P longs);
    3. broadcast the P exclusive offsets back; each partition computes
       its local running sum + offset in one Arrow pass.

    Wall-clock is two narrow passes + one range exchange; no stage
    sees more than its partition. The DuckDB oracle recomputes the
    single-threaded window formulation and must hash-match exactly —
    locking in that the distributed decomposition is value-identical.

    ``tokenizer='ws'`` (default, the oracled qkey) budgets whitespace
    tokens; ``tokenizer='bpe'`` budgets REAL subword counts under a
    broadcast merge table (``bpe.bpe_token_count``; pass ``merges``
    from the committed vocabulary — trained on ``documents``' own
    sample when omitted), so shard sizes line up with what the model
    actually consumes (VERDICT r6 #5's third budget consumer). Only
    the counter changes — the walk order, prefix sum and shard rule
    are byte-identical either way (serial-model equivalence pinned in
    tests/test_bpe.py).
    """
    import pandas as pd

    spark = documents.sparkSession
    id_type = dict(documents.dtypes)[id_col]
    if order == "id":
        ordc = F.col(id_col)
    elif order == "hash":
        ordc = F.md5(F.col(id_col).cast("string"))
    else:
        raise ValueError(f"unknown order: {order!r}")
    if tokenizer == "bpe":
        from parallel_svms_spark.operators import bpe as B
        if merges is None:
            merges = B.bpe_train_merges(documents, text_col=text_col,
                                        id_col=id_col)
        toks = (B.bpe_token_count(documents, merges, text_col=text_col,
                                  id_col=id_col)
                .select(F.col(id_col), ordc.alias("__ord"), "n_tokens"))
    elif tokenizer == "ws":
        toks = documents.select(
            F.col(id_col), ordc.alias("__ord"),
            F.size(F.split(F.col(text_col), " ")).cast("long")
            .alias("n_tokens"))
    else:
        raise ValueError(f"unknown tokenizer: {tokenizer!r}")
    n_part = max(2, spark.sparkContext.defaultParallelism)
    # materialize the ranged layout ONCE: repartitionByRange samples
    # its bounds per execution, and the two passes below must see the
    # SAME partition→rows mapping (the checkpointed frame is ≤48 B/doc
    # — ids, order key and counts, never text)
    ranged = (toks.repartitionByRange(n_part, F.col("__ord"),
                                      F.col(id_col))
              .sortWithinPartitions("__ord", id_col)
              .localCheckpoint())

    # pass 1: per-partition (partition_id, partial_sum, min_ord) —
    # spark_partition_id() is the RDD-free partition index
    parts = (ranged
             .groupBy(F.spark_partition_id().alias("pid"))
             .agg(F.sum("n_tokens").alias("psum"),
                  F.min(F.struct("__ord", id_col)).alias("min_ord"))
             .collect())
    # driver: exclusive prefix offsets in walk order (P rows — tiny).
    # order by min_ord, not pid: range partitions are order-key-ranged
    # but nothing guarantees pid numbering follows the range order
    parts.sort(key=lambda r: (r["min_ord"]["__ord"],
                              r["min_ord"][id_col]))
    offsets: dict[int, int] = {}
    acc = 0
    for r in parts:
        offsets[r["pid"]] = acc
        acc += int(r["psum"])
    bc = spark.sparkContext.broadcast(offsets)
    budget = int(budget_tokens)

    # pass 2: local running sum + broadcast offset, one Arrow batch
    # stream per partition (mapInPandas batches within a partition are
    # sequential, so carrying the running total across batches is safe)
    def assign(it):
        offs = bc.value
        running = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if running is None:
                running = offs.get(int(pdf["pid"].iloc[0]), 0)
            pdf = pdf.sort_values(["__ord", id_col], kind="mergesort")
            csum = pdf["n_tokens"].cumsum() - pdf["n_tokens"] + running
            running += int(pdf["n_tokens"].sum())
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_tokens": pdf["n_tokens"],
                "shard": (csum // budget).astype("int64"),
            })

    return (ranged.withColumn("pid", F.spark_partition_id())
            .mapInPandas(assign,
                         schema=f"{id_col} {id_type}, n_tokens long, "
                                f"shard long"))


def write_corpus_shards(documents: DataFrame, path: str,
                        budget_tokens: int = 4096,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Materialize the packed corpus: ``pack_shards`` assignment joined
    back to the full rows and written as ``partitionBy('shard')``
    parquet — the on-disk layout a training job actually consumes
    (each shard directory is one token-budgeted unit of work, so the
    trainer's reader maps shard → input split with no further shuffle).

    Scale notes: the assignment table is (id, shard) longs, so the
    attach join never moves text; rows are ``repartition('shard')``-ed
    before the write so each shard directory is produced by one task —
    without it every task appends a file into every shard directory
    and a 10k-shard corpus becomes a 320k-small-file listing problem.
    Returns the (id, n_tokens, shard) assignment for verification.
    """
    packed = pack_shards(documents, budget_tokens, id_col, text_col)
    out = documents.join(packed.select(id_col, "shard"), id_col)
    (out.repartition(F.col("shard"))
        .write.partitionBy("shard").mode("overwrite").parquet(path))
    return packed


def mixture_sample(df: DataFrame, rates: dict[str, float] | None = None,
                   default_rate: float = 0.1,
                   id_col: str = "doc_id",
                   group_col: str = "source") -> DataFrame:
    """Deterministic source-weighted mixture sampling — the "data
    mixing" step that assembles a training corpus from per-source
    sampling rates (the publicly documented recipe behind e.g. the
    Pile / Llama data mixtures: each source contributes a chosen
    fraction, reproducibly).

    Per group g, keeps the ``ceil(rate(g) · |g|)`` rows with the
    smallest md5(id-string) — the same engine-portable total order as
    ``stratified_sample``/the IVF centroid draw, so the DuckDB oracle
    reproduces the exact row set and re-runs are stable (adding rows
    to one source never changes another source's sample).

    Scale shape: per-group counts are a map-side-partial hash agg
    producing |sources| rows, broadcast back; the rank is one window
    keyed by the group column.  Nothing driver-side, no RNG state.

    SCALE CAVEAT: the exact-quota rank is a per-group window — one
    sort task per source. Fine while each source fits a task (eval
    carves, sampled corpora); for billion-row sources use
    ``mixture_sample_hash`` (same determinism, no window, no sort —
    sample size becomes Binomial(n, rate) instead of exactly
    ceil(rate·n)).
    """
    rates = rates or {}

    # quota arithmetic is DECIMAL, not double: ceil(0.07 · 100) must be
    # 7, but the double product is 7.000000000000001 → ceil 8 — decimal
    # keeps the quota exact and agrees with SQL engines' decimal
    # literal semantics
    def _dec(r: float) -> F.Column:
        return F.expr(f"CAST('{float(r)!r}' AS DECIMAL(21,10))")

    rate = _dec(default_rate)
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, _dec(r)).otherwise(rate)
    # null-safe count attach: a NULL group must stay eligible (sampled
    # at default_rate, same fall-through as mixture_sample_hash's CASE)
    cnt = (df.groupBy(group_col).agg(F.count("*").alias("n_grp"))
           .withColumnRenamed(group_col, "__grp"))
    h = F.md5(F.col(id_col).cast("string"))
    rn = F.row_number().over(
        W.partitionBy(group_col).orderBy(h, F.col(id_col)))
    return (df.join(F.broadcast(cnt),
                    F.col(group_col).eqNullSafe(F.col("__grp")))
            .select(F.col(id_col), F.col(group_col), rn.alias("rn"),
                    F.ceil(rate * F.col("n_grp")).cast("long").alias("want"))
            .filter(F.col("rn") <= F.col("want"))
            .select(id_col, group_col))


def _rate_threshold_hex(rate: float) -> str:
    """First-8-hex-chars md5 threshold for a sampling rate: keep a row
    iff substring(md5, 1, 8) < this string. Lexicographic order over
    fixed-length lowercase hex IS numeric order, so the comparison is
    a plain string compare in every engine."""
    return format(min(int(float(rate) * 16 ** 8), 16 ** 8 - 1), "08x")


def mixture_sample_hash(df: DataFrame, rates: dict[str, float] | None = None,
                        default_rate: float = 0.1,
                        id_col: str = "doc_id",
                        group_col: str = "source") -> DataFrame:
    """The 100 TB mixture sampler: hash-threshold (a.k.a. hash-mod)
    sampling — keep a row iff the first 8 hex chars of md5(id-string)
    fall below the group's rate threshold. One narrow codegen'd
    filter: no window, no sort, no per-group count, no exchange at
    all. Sample size is Binomial(n, rate) (±O(√n) of the quota) — the
    standard trade production data mixers make for a shuffle-free
    plan; use ``mixture_sample`` when the count must be exact.

    Same determinism contract as everything else in this family:
    membership depends only on (id, rate), so re-runs, engines, and
    incremental extensions of OTHER sources never change a row's fate.
    """
    return (df.filter(mixture_keep_col(rates, default_rate,
                                       id_col, group_col))
            .select(id_col, group_col))


def mixture_keep_col(rates: dict[str, float] | None = None,
                     default_rate: float = 0.1,
                     id_col: str = "doc_id",
                     group_col: str = "source") -> Column:
    """``mixture_sample_hash``'s keep predicate as a reusable Column
    (r10, guide §1.2 step 1): membership is a pure per-row function of
    (id, group), so a pipeline that already HOLDS the frame being
    sampled can apply the predicate directly instead of semi-joining
    against ``mixture_sample_hash``'s output — a self-semi-join whose
    right side re-derives the entire upstream subtree.

    REQUIREMENT (not just rationale — ADVICE r10): the filter ≡
    semi-join identity holds only when ``id_col`` is UNIQUE in the
    filtered frame. With duplicate ids the semi-join keeps EVERY row
    sharing a passing id while the filter decides per row; callers
    replacing a semi-join must filter a deduplicated frame (both
    committed pipelines do — precondition asserted in
    tests/test_pipeline_rewrites.py). Row set
    identical by construction (same expression, unique ids);
    ``mixture_sample_hash`` itself delegates here."""
    rates = rates or {}
    thr = F.lit(_rate_threshold_hex(default_rate))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group_col) == g,
                     F.lit(_rate_threshold_hex(r))).otherwise(thr)
    h8 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return h8 < thr


def mixture_sample_temperature(documents: DataFrame,
                               alpha: float = 0.3,
                               target_frac: float = 0.5,
                               source_col: str = "source",
                               id_col: str = "doc_id",
                               text_col: str = "text") -> DataFrame:
    """Temperature-scaled mixture sampling — the multilingual-LM
    re-balancing scheme (publicly documented in XLM-R / mC4 /
    unigram-LM sampling: draw from source ``i`` with probability
    ``p_i ∝ m_i^α``) turned into a deterministic corpus filter.

    ``m_i`` is the source's TOKEN mass (not its document count:
    mixtures are specified in tokens, and equal doc counts with
    unequal doc lengths would silently skew a count-based rate).
    With temperature ``α < 1`` small sources are up-weighted and
    dominant sources damped; ``α = 1`` reproduces natural
    proportions; ``α = 0`` is uniform-over-sources. The per-source
    keep rate that realizes ``target_frac`` of the corpus in
    expectation is

        rate_i = min(1, target_frac · M · p_i / m_i),
        p_i = m_i^α / Σ_j m_j^α,   M = Σ_j m_j

    and membership is the family's hash-threshold rule (keep iff the
    first 8 hex chars of md5(id) fall under ``rate_i``), so the row
    set is reproducible across engines/runs and extending one source
    never changes another source's sample. Rows whose rate clamps at
    1 are kept outright (no hash draw can express rate = 1 exactly).

    Float parity with SQL oracles: ``pow`` is the one libm call, and
    its result is rounded to 6 dp BEFORE any further arithmetic —
    after that every operation runs on bit-identical doubles/ints in
    any IEEE-754 engine, so the derived thresholds match exactly.

    Scale shape: one map-side-combinable token-mass aggregation down
    to |sources| rows, a 1-row total, a broadcast join of the
    |sources|-row rate table back onto the corpus, and a codegen'd
    hash-threshold filter — no window, no sort, no wide exchange of
    corpus rows at any point. NULL-text docs are excluded (family
    convention); a NULL source forms its own mass group and is
    matched null-safely, staying eligible like every other group.
    """
    a = float(alpha)
    tf = float(target_frac)
    n_t = F.size(F.split(F.col(text_col), " ")).cast("long")
    mass = (documents
            .filter(F.col(text_col).isNotNull())
            .groupBy(source_col)
            .agg(F.sum(n_t).alias("m"))
            .withColumn("w", F.round(F.pow(F.col("m").cast("double"),
                                           F.lit(a)), 6)))
    tot = mass.agg(F.sum("w").alias("z"),
                   F.sum("m").cast("double").alias("mm"))
    rates = (mass.crossJoin(F.broadcast(tot))
             .select(F.col(source_col).alias("__src"),
                     F.round(F.least(F.lit(1.0),
                                     F.lit(tf) * F.col("mm") * F.col("w")
                                     / (F.col("m").cast("double")
                                        * F.col("z"))), 6).alias("rate")))
    h8 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    thr = F.format_string(
        "%08x", F.floor(F.col("rate") * F.lit(4294967296.0)).cast("long"))
    return (documents
            .filter(F.col(text_col).isNotNull())
            .join(F.broadcast(rates),
                  F.col(source_col).eqNullSafe(F.col("__src")))
            .filter((F.col("rate") >= 1.0) | (h8 < thr))
            .select(id_col, source_col, "rate"))


def stratified_sample(df: DataFrame, n_per_label: int = 10,
                      id_col: str = "vec_id",
                      label_col: str = "label") -> DataFrame:
    """Deterministic per-label sample: the ``n_per_label`` rows with
    the smallest md5(id-string) per label (md5 is engine-portable, so
    the DuckDB oracle reproduces the exact row set — same trick as the
    IVF centroid sample). The eval-set carve for training pipelines:
    reproducible across runs/engines, no RNG state, uniform within
    each label.

    Scale shape: one hash-partitioned window keyed by label —
    rank-within-group over (C labels × rows/label). Skewed labels are
    the only hazard; at extreme skew swap the window for a per-label
    TakeOrdered (the md5 order is a total order, so top-n per group
    composes)."""
    h = F.md5(F.col(id_col).cast("string"))
    rn = F.row_number().over(
        W.partitionBy(label_col).orderBy(h, F.col(id_col)))
    return (df.select(id_col, label_col, rn.alias("rn"))
            .filter(F.col("rn") <= int(n_per_label))
            .drop("rn"))


def uniform_sample_exact(df: DataFrame, k: int = 100,
                         id_col: str = "doc_id") -> DataFrame:
    """Deterministic global exact-k uniform sample: the ``k`` rows
    with the smallest ``md5(id-string)`` — a seedless reservoir
    sample. md5 of the id is a fixed uniform draw per row, so the
    selection is a true uniform k-subset, identical across runs and
    engines (the DuckDB oracle reproduces the exact row set), and
    STABLE under corpus growth: adding rows can only displace old
    picks, never reshuffle survivors — the property eval-set carves
    need.

    Plan shape: sort+limit fuses into ``TakeOrderedAndProject`` —
    each task keeps a local top-k heap and the driver merges P·k
    candidates. No full sort, no exchange of the data. The driver
    merge bounds k: fine through k ~ 10⁵ on thousands of tasks; for
    larger carves switch to ``mixture_sample_hash`` at rate ≈ k/n
    (same hash order, no driver merge, Binomial-sized)."""
    h = F.md5(F.col(id_col).cast("string"))
    return (df.withColumn("__h", h)
            .orderBy("__h", F.col(id_col))
            .limit(int(k))
            .drop("__h"))


def weighted_sample(df: DataFrame, weight: Column,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic importance sampling: keep each row independently
    with probability ``min(weight, 1)`` — the quality-weighted corpus
    draw (upsample high-quality sources, downsample boilerplate)
    production data mixers run, made reproducible.

    Same seedless coin as ``mixture_sample_hash``, generalized from a
    per-GROUP constant rate to a per-ROW weight expression: row kept
    iff the first 8 hex chars of md5(id) fall below the weight scaled
    onto [0, 16⁸) and rendered as zero-padded lowercase hex
    (fixed-width hex compares lexicographically = numerically, and
    md5/hex/lpad are engine-portable, so the DuckDB oracle reproduces
    the exact row set). One narrow codegen'd filter: no window, no
    exchange, no RNG state; membership depends only on (id, weight),
    so re-runs and growth of the rest of the corpus never flip a row.

    Exact keep probability (boundary contract, tested in
    tests/test_edge_cases.py): ``P(keep) = floor(clamp(w,0,1) ·
    (2³²−1)) / 2³²`` under the uniform md5 coin — the comparison is
    STRICT ``<``, so a row whose h8 equals the threshold drops; at
    w=1 the threshold renders ``'ffffffff'`` and a row drops only if
    its md5 prefix is exactly that (P = 2⁻³²). NULL/NaN/negative
    weights clamp to 0 (drop)."""
    return df.filter(weighted_keep_col(weight, id_col))


def weighted_keep_col(weight: Column, id_col: str = "doc_id") -> Column:
    """``weighted_sample``'s keep predicate as a reusable Column (r10,
    guide §1.2 step 1 — the ``mixture_keep_col`` rationale applied to
    the per-row weight coin): a pipeline holding the frame being
    sampled can filter directly instead of semi-joining against the
    sampler's output. ``weighted_sample`` delegates here, so the
    clamp/threshold semantics (and their tests) stay single-sourced.
    Same REQUIREMENT as ``mixture_keep_col``: replacing a semi-join
    with this filter is row-identical only over a unique-``id_col``
    frame (see that docstring; asserted for the committed pipelines
    in tests/test_pipeline_rewrites.py)."""
    u32 = float(16 ** 8 - 1)
    # clamp to [0, 1] BEFORE hex: a negative weight would hex to a
    # 16-char two's-complement string that lpad TRUNCATES to
    # 'ffffffff' — keep-everything, the opposite of the intent.
    # NULL and NaN weights must clamp explicitly too: Spark's
    # least/greatest SKIP null arguments (least(NULL, 1.0) = 1.0) and
    # order NaN ABOVE every double (least(NaN, 1.0) = 1.0) — both
    # would silently sample at rate 1; map them to 0 (drop) instead
    w = weight.cast("double")
    w01 = F.when(w.isNull() | F.isnan(w), F.lit(0.0)).otherwise(
        F.greatest(F.least(w, F.lit(1.0)), F.lit(0.0)))
    thr = F.lower(F.lpad(F.hex(
        F.floor(w01 * F.lit(u32)).cast("bigint")), 8, "0"))
    h8 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return h8 < thr


def pack_sequences(documents: DataFrame, budget_tokens: int = 4096,
                   id_col: str = "doc_id", text_col: str = "text",
                   sep: str = "\n\n", order: str = "id",
                   tokenizer: str = "ws",
                   merges: list[tuple[str, str]] | None = None,
                   vocab: dict | None = None) -> DataFrame:
    """Sequence packing — the step AFTER ``pack_shards``: concatenate
    each shard's documents (in id order, ``sep``-joined) into one
    training sequence. Returns (shard, n_docs, n_tokens, text): the
    rows a tokenizer+trainer consumes directly.

    Scale shape: the only exchange beyond pack_shards' range exchange
    is the shard-keyed aggregation, and a shard is ≤ budget_tokens +
    one document by construction — so every group is bounded and the
    concat state per reducer is one sequence, never a corpus
    concatenation. Ordering inside a sequence must be deterministic to
    be reproducible (and oracle-checkable): sort_array over
    (id, text) structs pins it, matching the oracle's
    ``string_agg(... ORDER BY id)`` exactly.

    The doc→shard assignment is ``pack_shards``' exact prefix-sum
    layout (shared code, shared oracle semantics); texts join back by
    id AFTER assignment so the prefix-sum passes never carry text.
    ``order='hash'`` threads the pseudo-shuffle through BOTH the
    assignment and the within-sequence concatenation order, so a
    sequence is a contiguous slice of the shuffled stream (pinned in
    pytest against the serial recurrence).

    ``tokenizer='bpe'`` produces what a trainer ACTUALLY loads
    (VERDICT r7 #2): shard assignment budgets real subword counts
    (``pack_shards(tokenizer='bpe')``) and the output column is
    ``ids ARRAY<INT>`` — each shard's documents' ``bpe_encode_ids``
    sequences concatenated in the same deterministic order — instead
    of ``sep``-joined text. Pass ``vocab`` (a ``bpe_train`` /
    ``bpe_load_vocab`` artifact) to encode under a committed
    vocabulary; trained on ``documents``' own sample when omitted
    (``merges`` alone also accepted for count compatibility).
    ``size(ids) == n_tokens`` per shard by construction (pinned in
    tests/test_bpe.py).
    """
    if tokenizer == "bpe":
        from parallel_svms_spark.operators import bpe as B
        if vocab is None:
            vocab = B.bpe_train(documents, text_col=text_col,
                                id_col=id_col)
            if merges is not None:
                vocab["merges"] = merges
        assign = pack_shards(documents, budget_tokens, id_col,
                             text_col, order=order, tokenizer="bpe",
                             merges=vocab["merges"])
        ids = B.bpe_encode_ids(documents, vocab, text_col=text_col,
                               id_col=id_col)
        joined = assign.join(ids, id_col)
        if order == "id":
            skey = F.struct(F.col(id_col).alias("i"),
                            F.col("ids").alias("t"))
        else:
            skey = F.struct(
                F.md5(F.col(id_col).cast("string")).alias("o"),
                F.col(id_col).alias("i"), F.col("ids").alias("t"))
        return (joined
                .groupBy("shard")
                .agg(F.count("*").alias("n_docs"),
                     F.sum("n_tokens").alias("n_tokens"),
                     F.flatten(
                         F.transform(F.array_sort(F.collect_list(skey)),
                                     lambda s: s["t"])).alias("ids")))
    if tokenizer != "ws":
        raise ValueError(f"unknown tokenizer: {tokenizer!r}")
    assign = pack_shards(documents, budget_tokens, id_col, text_col,
                         order=order)
    joined = assign.join(documents.select(id_col, text_col), id_col)
    if order == "id":
        skey = F.struct(F.col(id_col).alias("i"),
                        F.col(text_col).alias("t"))
    else:  # hash walk: concatenate in the SAME (md5, id) order the
        # shard assignment walked, so a sequence is a contiguous
        # slice of the shuffled stream
        skey = F.struct(F.md5(F.col(id_col).cast("string")).alias("o"),
                        F.col(id_col).alias("i"),
                        F.col(text_col).alias("t"))
    return (joined
            .groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.array_join(
                     F.transform(F.array_sort(F.collect_list(skey)),
                                 lambda s: s["t"]),
                     sep).alias("text")))


def dataset_split(df: DataFrame,
                  fractions: list[tuple[str, float]] | None = None,
                  id_col: str = "doc_id",
                  salt: str = "") -> DataFrame:
    """Deterministic train/valid/test assignment: every row gets a
    ``split`` label from its md5 hash coin — the carve every training
    pipeline performs before anything else touches the corpus.
    ``fractions`` is an ORDERED list of (name, fraction) laying the
    splits end-to-end on [0, 1); a row lands in the split whose
    cumulative interval contains the first 8 hex chars of
    md5(salt‖id) (fixed-width lowercase hex compares
    lexicographically = numerically — the ``mixture_sample_hash``
    coin). The last split absorbs the residual, so the assignment is
    a PARTITION: disjoint and exhaustive by construction (tested).

    The contracts that make this the right shape at 100 TB:
    membership depends only on (salt, id, fractions), so re-runs,
    engines (the DuckDB oracle reproduces the exact assignment), and
    corpus GROWTH never flip an existing row — new documents join a
    split without re-dealing the old ones (the leakage disaster
    hash-splits exist to prevent). ``salt`` rotates the whole deal
    when an intentional re-split is wanted. Plan shape: one narrow
    codegen'd projection — no window, no exchange, no RNG state; at
    any scale this is a zero-shuffle map over the scan.
    """
    fractions = fractions or [("train", 0.9), ("valid", 0.05),
                              ("test", 0.05)]
    assert len(fractions) >= 1
    # the LAST split absorbs the residual, so its fraction is
    # informational — but the preceding ones must carve a valid
    # sub-unit prefix or later splits (incl. the residual) silently
    # starve at the 'ffffffff' clamp (r6 advice)
    lead = [float(f) for _, f in fractions[:-1]]
    if any(f < 0 for f in lead) or float(fractions[-1][1]) < 0:
        raise ValueError(f"dataset_split: negative fraction in "
                         f"{fractions}")
    if sum(lead) >= 1.0:
        raise ValueError(
            f"dataset_split: leading fractions sum to {sum(lead)} "
            f">= 1 — the last split's residual interval is empty")
    h8 = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8)
    cum = 0.0
    expr = F.lit(fractions[-1][0])  # last split absorbs the residual
    cases: list[tuple[str, str]] = []
    for name, frac in fractions[:-1]:
        cum += float(frac)
        cases.append((name, _rate_threshold_hex(cum)))
    for name, thr in reversed(cases):
        expr = F.when(h8 < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def split_by_cluster(documents: DataFrame,
                     fractions: list[tuple[str, float]] | None = None,
                     k: int = 3, threshold: float = 0.5,
                     max_doc_freq: int | None = 1000,
                     salt: str = "",
                     reps: DataFrame | None = None) -> DataFrame:
    """Leakage-safe train/valid/test carve: hash the SPLIT COIN on
    the near-dup cluster representative instead of the document id,
    so every member of a near-duplicate cluster lands in the same
    split — (doc_id, cluster_rep, split).

    The failure this prevents is the one ``dataset_split`` alone
    cannot: a test document's near-duplicate sitting in train. A
    per-doc hash coin deals cluster members INDEPENDENTLY, so a
    near-dup cluster of size m straddles splits with probability
    1 − Σ fᵢ^m — near-certain for any real duplicate cluster — and
    the eval split then scores memorization, not generalization
    (the train/test overlap pathology documented in Lee et al., ACL
    2022, "Deduplicating Training Data Makes Language Models
    Better" §6: models are measurably better on seen-in-train
    near-dups). Group-aware splitting closes it BY CONSTRUCTION:
    members share the rep, the rep is the only hash input, so a
    cluster cannot straddle (pytest-pinned, with the straddle
    demonstrated for the plain per-doc coin on the same fixture).

    Composition, not new machinery: ``dedup_clusters`` (min-label
    propagation over jaccard-≥-threshold edges — its scale story and
    convergence witness apply unchanged) feeds ``dataset_split``
    keyed on ``cluster_rep`` (the same ordered-interval md5 coin, so
    all of its contracts carry over: disjoint-exhaustive partition,
    engine-reproducible, growth-stable — a NEW document that joins an
    EXISTING cluster inherits that cluster's standing split rather
    than re-dealing it, exactly the day-N property a frozen eval set
    needs; a genuinely new singleton deals its own coin). Beyond the
    propagation's own joins this adds zero exchange: the coin is a
    narrow codegen'd projection on the (doc_id, cluster_rep) rows.

    DuckDB oracle: the recursive-CTE reachability oracle of
    ``dedup_clusters`` with the split CASE applied to its
    ``cluster_rep`` — both stages' oracles composed verbatim.

    ``reps``: pass a precomputed (doc_id, cluster_rep) assignment to
    skip the propagation — the suite-scoped sharing hook (r10): two
    cluster-keyed carves over the same corpus need the clusters once,
    not once each. Must be ``dedup_clusters`` output over the same
    documents/params for the no-straddle contract to hold.
    """
    from parallel_svms_spark.operators.dedup import dedup_clusters

    if reps is None:
        reps = dedup_clusters(documents, k=k, threshold=threshold,
                              max_doc_freq=max_doc_freq)
    return dataset_split(reps, fractions, id_col="cluster_rep",
                         salt=salt)


def chunk_documents(documents: DataFrame, chunk_chars: int = 256,
                    overlap: int = 32, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Overlapping fixed-width character chunking — the "split long
    documents into model-sized windows" step every pretraining / RAG
    corpus build runs before tokenization. Chunk c starts at offset
    c·(chunk_chars − overlap) and spans ``chunk_chars`` characters;
    consecutive chunks share ``overlap`` characters so no sentence is
    cut without a copy surviving in a neighbor. Returns
    (id, chunk_ix, chunk_start, chunk_text, n_chunk_chars); a chunk
    exists iff its start offset is inside the text, so empty documents
    yield zero chunks (documented contract, tested).

    Scale shape: a pure narrow transformation — ``sequence`` +
    ``explode`` + ``substring`` inside whole-stage codegen, zero
    exchange at any corpus size. Output amplification is
    ≈ n_chars / stride rows per document (bounded by the fixture's
    max doc length / stride); the text column is never shuffled, just
    scanned and sliced. The DuckDB oracle is the identical
    generate_series formulation, so the chunk boundaries — not just
    counts — are pinned engine-portably.
    """
    stride = int(chunk_chars) - int(overlap)
    assert stride > 0, "overlap must be smaller than chunk_chars"
    n = F.length(F.col(text_col))
    # inclusive-stop sequence = DuckDB generate_series; the start<n
    # filter drops both the empty-doc [0] row and any overrun
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)),
                        F.lit(stride))
    return (documents
            .select(id_col, text_col,
                    F.explode(starts).alias("chunk_start"))
            .filter(F.col("chunk_start") < F.length(F.col(text_col)))
            .select(
                id_col,
                (F.col("chunk_start") / stride).cast("long")
                .alias("chunk_ix"),
                F.col("chunk_start").cast("long").alias("chunk_start"),
                F.col(text_col).substr(
                    F.col("chunk_start") + 1,
                    F.lit(int(chunk_chars))).alias("chunk_text"))
            .withColumn("n_chunk_chars", F.length("chunk_text")
                        .cast("long")))


def kfold_assign(df: DataFrame, k: int = 5, id_col: str = "vec_id",
                 salt: str = "") -> DataFrame:
    """Deterministic k-fold assignment: fold i gets the rows whose
    md5(salt‖id) 8-hex-char prefix lands in [i/k, (i+1)/k) — the
    ``dataset_split`` hash-interval coin with k equal fractions and an
    integer fold id. The cross-validation carve the reference's
    cascade driver performs (cascade_svm/Driver.java:37-102 runs
    k-validation rounds); here it is a zero-shuffle codegen'd
    projection whose assignment is stable under corpus growth and
    engine-portable (the DuckDB oracle reproduces every fold id).
    """
    k = int(k)
    assert k >= 2
    h8 = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8)
    expr = F.lit(k - 1)  # last fold absorbs the residual interval
    for i in range(k - 1, 0, -1):
        expr = F.when(h8 < F.lit(_rate_threshold_hex(i / k)),
                      F.lit(i - 1)).otherwise(expr)
    return df.withColumn("fold", expr.cast("long"))


def fold_balance(df: DataFrame, k: int = 5, id_col: str = "vec_id",
                 label_col: str = "label", salt: str = "") -> DataFrame:
    """Per-(fold, label) row counts over a ``kfold_assign`` carve —
    the class-balance audit run before trusting a cross-validation
    estimate (a fold that lost a class entirely invalidates the run;
    the reference's k-validation assumes balanced folds without ever
    checking). Output is k·|labels| rows.

    Scale shape: narrow fold projection + one map-side-partial hash
    aggregation on (fold, label) — the same plan as any groupBy count;
    no window, no driver work.
    """
    return (kfold_assign(df, k, id_col, salt)
            .groupBy("fold", label_col)
            .agg(F.count("*").alias("n_rows")))


def padding_stats(documents: DataFrame, context_len: int = 128,
                  bucket: int = 32, text_col: str = "text",
                  tokenizer: str = "ws",
                  merges: list[tuple[str, str]] | None = None,
                  id_col: str = "doc_id") -> DataFrame:
    """Padding-waste accounting for batch assembly: bucket documents
    by whitespace-token length (bucket b = lengths [b·bucket,
    (b+1)·bucket)) and report, per bucket, the padding cost of the two
    standard batching strategies — pad-to-fixed-context
    (``pad_fixed`` = Σ max(context_len − n_tok, 0); docs longer than
    the context cost 0 because they truncate/split instead) and
    length-bucketed batching (``pad_bucketed`` = bucket_max·n_docs −
    Σ n_tok, the waste when each batch pads only to its bucket's
    longest member). The gap between the two columns IS the measured
    value of length-bucketed batching — the efficiency audit run
    before choosing a packing strategy (sequence packing,
    ``pack_sequences``, is the third option and wastes ~0).

    Scale shape: one narrow tokenize+project, one hash aggregation on
    the bucket id (≈ max_len/bucket groups). ``tokenizer='ws'``
    (default, the oracled qkey) counts the same whitespace
    ``tokens_col`` split as ``token_count`` — shared semantics, shared
    oracle algebra (DuckDB ``string_split``). ``tokenizer='bpe'``
    counts REAL subword tokens under a broadcast merge table
    (``bpe.bpe_token_count``; pass ``merges`` from
    ``bpe.bpe_train_merges`` — trained on ``documents``' own sample
    when omitted), making the padding audit model-accurate (VERDICT
    r6 #5); equivalence vs a serial BPE is pinned in tests/test_bpe.py.
    ``id_col`` (bpe mode only) names the document key the BPE helpers
    sample/carry by — ADVICE r7: a frame keyed differently than
    ``doc_id`` previously failed with an unresolved-column error.
    """
    if tokenizer == "bpe":
        from parallel_svms_spark.operators import bpe as B
        if merges is None:
            merges = B.bpe_train_merges(documents, text_col=text_col,
                                        id_col=id_col)
        per = B.bpe_token_count(documents, merges, text_col=text_col,
                                id_col=id_col)
        per_doc = per.select(
            F.col("n_tokens").alias("n_tok"),
            F.floor(F.col("n_tokens") / int(bucket)).cast("long")
            .alias("len_bucket"))
    elif tokenizer == "ws":
        from parallel_svms_spark.operators.dedup import tokens_col
        n_tok = F.size(tokens_col(text_col)).cast("long")
        per_doc = documents.select(
            n_tok.alias("n_tok"),
            F.floor(n_tok / int(bucket)).cast("long").alias("len_bucket"))
    else:
        raise ValueError(f"unknown tokenizer: {tokenizer!r}")
    ctx = int(context_len)
    return (per_doc.groupBy("len_bucket")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tok").alias("sum_tokens"),
                 F.max("n_tok").alias("max_tokens"),
                 F.sum(F.greatest(F.lit(ctx) - F.col("n_tok"),
                                  F.lit(0))).alias("pad_fixed"))
            .withColumn("pad_bucketed",
                        (F.col("max_tokens") * F.col("n_docs")
                         - F.col("sum_tokens")).cast("long"))
            .select("len_bucket", "n_docs", "sum_tokens", "max_tokens",
                    "pad_bucketed", "pad_fixed"))


def pack_chunks(documents: DataFrame, chunk_chars: int = 256,
                overlap: int = 32, budget_tokens: int = 512,
                id_col: str = "doc_id", text_col: str = "text",
                chunk_factor: int = 1000) -> DataFrame:
    """Chunk-then-pack composition: split documents into overlapping
    fixed-width chunks (``chunk_documents``) and pack THE CHUNKS into
    token-budget training shards (``pack_shards``) — the long-document
    pipeline where a 500-page manual must not land in one shard.
    Returns (chunk_id, n_tokens, shard) where ``chunk_id = doc_id ·
    chunk_factor + chunk_ix`` (default factor 1000 bounds docs to
    1000 chunks ≈ 224k chars at the defaults; raise ``chunk_factor``
    for longer corpora — it only has to keep the walk order equal to
    (doc, chunk) lexicographic order). The bound is ENFORCED, not
    just documented: a document with ``chunk_ix >= chunk_factor``
    raises at execution time (JVM ``raise_error`` inside the id
    projection — zero cost on the happy path) instead of silently
    colliding/mis-ordering chunk ids.

    Scale shape: the chunk explode is narrow; packing adds exactly
    pack_shards' one range exchange over (chunk_id) — the composition
    introduces no new shuffle class. The walk order is (doc, chunk),
    so a document's chunks stay consecutive: a shard is a contiguous
    window of the chunk stream, the layout sequence-trainers expect.
    """
    factor = int(chunk_factor)
    chunks = chunk_documents(documents, chunk_chars, overlap,
                             id_col=id_col, text_col=text_col)
    keyed = chunks.select(
        F.when(F.col("chunk_ix") < F.lit(factor),
               F.col(id_col) * factor + F.col("chunk_ix"))
        .otherwise(F.raise_error(F.format_string(
            "pack_chunks: chunk_ix %s exceeds chunk_factor "
            f"{factor} for {id_col} %s — raise chunk_factor",
            F.col("chunk_ix"), F.col(id_col))))
        .alias("chunk_id"),
        F.col("chunk_text"))
    return pack_shards(keyed, budget_tokens=budget_tokens,
                       id_col="chunk_id", text_col="chunk_text")


def mixture_sample_tokens(documents: DataFrame,
                          budget_tokens: int = 1500,
                          source_col: str = "source",
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          salt: str = "") -> DataFrame:
    """Token-budget mixture sampling: from each source, keep documents
    along a deterministic pseudo-shuffled walk until the source has
    contributed ``budget_tokens`` — the way pretraining mixtures are
    actually specified ("10 B tokens of web, 2 B of code"), where
    ``mixture_sample``'s per-source DOC quotas misallocate whenever
    sources' document lengths differ. A document is kept iff the
    exact sum of tokens WALKED BEFORE IT within its source is under
    the budget, so each source overshoots by at most one document and
    membership is reproducible in any engine (the rule depends only
    on exact integer prefix sums over the md5 walk order, no floats,
    no RNG).

    Returns (id, source, n_tokens) — the sampled corpus keys; join
    back by id for text (the sampling family convention: the decision
    pass never carries text).

    Scale shape: the naive form is a per-source ORDER-BY window — a
    mega-source serializes one task. This is ``pack_shards``' two-pass
    distributed prefix sum GENERALIZED TO GROUPS: range-partition by
    (source, md5(salt‖id), id) so each partition holds a contiguous
    slice of one-or-more sources' walks; pass 1 reduces per
    (partition, source) partials (P×|sources| tiny rows to the
    driver); the driver lays per-source exclusive offsets along each
    walk; pass 2 is one Arrow pass per partition computing local
    per-source running sums + broadcast offsets. No stage ever holds
    more than its partition, regardless of how skewed one source is.
    The DuckDB oracle recomputes the serial
    ``SUM() OVER (PARTITION BY source ORDER BY md5, id)`` window and
    must hash-match exactly — the distributed decomposition is
    value-identical. NULL-text docs are excluded (family convention).
    """
    import pandas as pd

    spark = documents.sparkSession
    id_type = dict(documents.dtypes)[id_col]
    ordc = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    toks = (documents
            .filter(F.col(text_col).isNotNull())
            .select(F.col(id_col), F.col(source_col).alias("__src"),
                    ordc.alias("__ord"),
                    F.size(F.split(F.col(text_col), " ")).cast("long")
                    .alias("n_tokens")))
    n_part = max(2, spark.sparkContext.defaultParallelism)
    ranged = (toks.repartitionByRange(n_part, F.col("__src"),
                                      F.col("__ord"), F.col(id_col))
              .sortWithinPartitions("__src", "__ord", id_col)
              .localCheckpoint())
    parts = (ranged
             .groupBy(F.spark_partition_id().alias("pid"), "__src")
             .agg(F.sum("n_tokens").alias("psum"),
                  F.min(F.struct("__ord", id_col)).alias("min_ord"))
             .collect())
    # driver: per-source exclusive offsets along each source's walk
    # (P × |sources| rows — tiny); order by min_ord, never pid
    by_src: dict[str, list] = {}
    for r in parts:
        by_src.setdefault(r["__src"], []).append(r)
    offsets: dict[tuple[int, str], int] = {}
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (r["min_ord"]["__ord"],
                                 r["min_ord"][id_col]))
        acc = 0
        for r in rows:
            offsets[(int(r["pid"]), src)] = acc
            acc += int(r["psum"])
    bc = spark.sparkContext.broadcast(offsets)
    budget = int(budget_tokens)

    def sample(it):
        offs = bc.value
        running: dict[str, int] = {}
        pid = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["pid"].iloc[0])
            pdf = pdf.sort_values(["__src", "__ord", id_col],
                                  kind="mergesort")
            prefixes = []
            for src, nt in zip(pdf["__src"], pdf["n_tokens"]):
                base = running.setdefault(src, offs.get((pid, src), 0))
                prefixes.append(base)
                running[src] = base + int(nt)
            keep = pd.Series(prefixes).values < budget
            out = pdf[keep.tolist()]
            yield pd.DataFrame({
                id_col: out[id_col],
                "source": out["__src"],
                "n_tokens": out["n_tokens"],
            })

    return (ranged.withColumn("pid", F.spark_partition_id())
            .mapInPandas(sample,
                         schema=f"{id_col} {id_type}, source string, "
                                f"n_tokens long"))


def kfold_by_cluster(documents: DataFrame, k: int = 5,
                     dedup_k: int = 3, threshold: float = 0.5,
                     max_doc_freq: int | None = 1000,
                     salt: str = "",
                     reps: DataFrame | None = None) -> DataFrame:
    """Leakage-safe cross-validation carve: ``kfold_assign``'s
    hash-interval coin keyed on the NEAR-DUP CLUSTER REPRESENTATIVE
    — (doc_id, cluster_rep, fold) — so a validation fold never scores
    a near-duplicate of a training fold's document (the CV estimate
    inflation twin of the ``split_by_cluster`` train/test leak; a
    per-doc coin deals cluster members independently and a size-m
    cluster crosses folds with probability 1 − k·(1/k)^m).

    All of ``split_by_cluster``'s contracts carry over verbatim:
    no-straddle by construction, day-N members inherit their
    cluster's standing fold, singletons keep their own-coin fate,
    zero exchange beyond the propagation. Oracle = the reachability
    CTE with the kfold CASE on ``cluster_rep``. ``reps`` as in
    ``split_by_cluster`` (the suite-scoped sharing hook).
    """
    from parallel_svms_spark.operators.dedup import dedup_clusters

    if reps is None:
        reps = dedup_clusters(documents, k=dedup_k, threshold=threshold,
                              max_doc_freq=max_doc_freq)
    return kfold_assign(reps, k, id_col="cluster_rep", salt=salt)
