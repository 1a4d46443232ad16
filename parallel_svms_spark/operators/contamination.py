"""Benchmark decontamination for training corpora (SURVEY §2.8
extension surface: the standard pre-training hygiene pass that removes
training documents overlapping an evaluation/benchmark set).

Semantics (the publicly documented n-gram-overlap rule used by GPT-3
appendix C / PaLM / Llama data cards): a training doc is contaminated
when it shares at least ``min_overlap`` distinct word ``k``-shingles
with ANY benchmark document.  ``decontaminate`` returns the corpus
with contaminated docs removed.

Scale shape — the asymmetry is the whole design: the benchmark side is
small by nature (eval sets are thousands of docs, the corpus is
billions), so its distinct shingle set is BROADCAST and the corpus
side never shuffles at all: explode(shingles) → broadcast-hash
semi-join → distinct ids → broadcast anti-join back.  The corpus is
read once, in place, with no exchange — the plan-shape test pins this
(no SortMergeJoin, no corpus-side Exchange).  For a benchmark too big
to broadcast, pass ``broadcast_benchmark=False`` to fall back to a
hash-partitioned semi-join on the shingle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallel_svms_spark.operators.dedup import shingles_col


def benchmark_shingles(benchmark: DataFrame, k: int = 3,
                       text_col: str = "text") -> DataFrame:
    """Distinct word k-shingles over the benchmark set — the (small)
    build side of the contamination join."""
    return (benchmark
            .select(F.explode(F.array_distinct(
                shingles_col(text_col, k))).alias("shingle"))
            .distinct())


def contaminated_ids(corpus: DataFrame, benchmark: DataFrame,
                     k: int = 3, min_overlap: int = 1,
                     id_col: str = "doc_id", text_col: str = "text",
                     broadcast_benchmark: bool = True) -> DataFrame:
    """Ids of corpus docs sharing ≥ ``min_overlap`` distinct
    k-shingles with the benchmark.

    ``min_overlap == 1`` is a pure semi-join (no counting state);
    higher thresholds count matched shingles per doc first — the agg
    state is one long per (doc, matched-shingle), bounded by doc size.
    """
    bsh = benchmark_shingles(benchmark, k, text_col)
    if broadcast_benchmark:
        bsh = F.broadcast(bsh)
    csh = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_col(text_col, k)))
        .alias("shingle"))
    if min_overlap <= 1:
        return (csh.join(bsh, "shingle", "left_semi")
                .select(id_col).distinct())
    return (csh.join(bsh, "shingle")
            .groupBy(id_col).agg(F.count("*").alias("n_hits"))
            .filter(F.col("n_hits") >= int(min_overlap))
            .select(id_col))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  k: int = 3, min_overlap: int = 1,
                  id_col: str = "doc_id", text_col: str = "text",
                  broadcast_benchmark: bool = True) -> DataFrame:
    """The corpus minus contaminated docs (all columns preserved).

    ``broadcast_benchmark`` gates BOTH joins: the shingle semi-join
    (build side = benchmark shingles) and the final anti-join (build
    side = contaminated ids). The id set is usually benchmark-bounded
    — eval sets touch a sliver of the corpus — so the default
    broadcasts it and the corpus never exchanges. If contamination can
    be a large FRACTION of the corpus (e.g. decontaminating against a
    huge held-out split), pass ``broadcast_benchmark=False``: both
    joins fall back to hash-partitioned and nothing driver-sized is
    materialized.
    """
    bad = contaminated_ids(corpus, benchmark, k, min_overlap,
                           id_col, text_col, broadcast_benchmark)
    if broadcast_benchmark:
        bad = F.broadcast(bad)
    return corpus.join(bad, id_col, "left_anti")


def decontaminate_hashed(corpus: DataFrame, benchmark: DataFrame,
                         k: int = 3, min_overlap: int = 1,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         broadcast_ids: bool = True) -> DataFrame:
    """``decontaminate`` with a hashed-shingle prefilter — the
    bounded-broadcast 100 TB path, value-identical to the exact
    operator (same DuckDB oracle).

    Why: ``decontaminate`` broadcasts the benchmark's distinct shingle
    STRINGS (tens of bytes each). At a large benchmark (say 10M
    distinct shingles) that broadcast hash map is GBs per executor.
    This variant broadcasts only ``xxhash64(shingle)`` — 8 bytes per
    entry, ~5-10× smaller, cheaper to probe — and the corpus-side
    prefilter is the same no-corpus-exchange broadcast semi-join, now
    keyed on a long. A 64-bit hash makes false positives vanishingly
    rare but not impossible, so the surviving sliver (prefilter hits —
    benchmark-bounded, a sliver of the corpus by the same asymmetry
    argument as ``decontaminate``) is exact-confirmed against the
    shingle strings before the id set is built: only the sliver ever
    carries strings across a join, and AQE sizes that join at runtime.
    Exactness is therefore guaranteed by construction, not by hash
    luck — the qkey shares ``decontaminate``'s oracle.

    ``broadcast_ids`` gates the final anti-join's build side, exactly
    like ``decontaminate``'s ``broadcast_benchmark`` does: the id set
    scales with the CONTAMINATION FRACTION, not the benchmark, so when
    decontaminating against a huge held-out split pass False and the
    anti-join falls back to hash-partitioned. The 8-byte hash
    broadcast (``bh``) stays — bounding it is this variant's purpose.
    """
    bsh = benchmark_shingles(benchmark, k, text_col)
    bh = bsh.select(F.xxhash64("shingle").alias("h")).distinct()
    csh = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_col(text_col, k)))
        .alias("shingle"))
    pre = csh.join(F.broadcast(bh),
                   F.xxhash64(F.col("shingle")) == F.col("h"),
                   "left_semi")
    confirmed = pre.join(bsh, "shingle", "left_semi")
    if min_overlap <= 1:
        bad = confirmed.select(id_col).distinct()
    else:
        bad = (confirmed.groupBy(id_col)
               .agg(F.count("*").alias("n_hits"))
               .filter(F.col("n_hits") >= int(min_overlap))
               .select(id_col))
    if broadcast_ids:
        bad = F.broadcast(bad)
    return corpus.join(bad, id_col, "left_anti")


def decontaminate_splits(documents: DataFrame,
                         fractions: list[tuple[str, float]] | None = None,
                         train_split: str = "train",
                         k: int = 3, min_overlap: int = 1,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """The eval-leakage firewall as ONE composed dataflow: hash-split
    the corpus (``sharding.dataset_split``), then remove from the
    TRAIN split every doc sharing ≥ ``min_overlap`` k-shingles with
    the held-out splits — so a near-copy of an eval document can never
    be trained on. This is `decontaminate` with the benchmark DERIVED
    from the corpus itself rather than an external eval set; run it
    after the carve, before anything else sees the train split.

    Scale shape: the split is a zero-exchange projection, and the
    held-out side here is a constant FRACTION of the corpus (not a
    benchmark-sized sliver), so the composition passes
    ``broadcast_benchmark=False`` — both contamination joins
    hash-partition and nothing corpus-fraction-sized is broadcast
    (decontaminate's own docstring contract for exactly this regime).
    The two split branches share the one split projection subtree.
    """
    from parallel_svms_spark.operators.sharding import dataset_split

    s = dataset_split(documents, fractions=fractions, id_col=id_col)
    train = s.filter(F.col("split") == train_split).drop("split")
    held = s.filter(F.col("split") != train_split).drop("split")
    return decontaminate(train, held, k=k, min_overlap=min_overlap,
                         id_col=id_col, text_col=text_col,
                         broadcast_benchmark=False)


def decontaminate_surgical(corpus: DataFrame, benchmark: DataFrame,
                           k: int = 5, id_col: str = "doc_id",
                           text_col: str = "text",
                           broadcast_benchmark: bool = True) -> DataFrame:
    """Span-level (surgical) decontamination: instead of DROPPING a
    training document that overlaps the benchmark (``decontaminate``),
    CUT exactly the overlapping token runs and keep the rest — the
    minimal-removal variant used when whole-doc removal would throw
    away a long document over one quoted benchmark sentence. A token
    is removed iff some word k-gram covering it appears verbatim in
    the benchmark set; everything else survives. The mechanism is the
    substring-dedup rewrite (``dedup.scrub_repeated_spans``) with the
    cut witnesses coming from a benchmark membership join instead of
    a corpus self-count.

    Returns (doc_id, clean_text, n_removed_tokens) for every
    non-NULL-text corpus document — a doc with no benchmark overlap
    passes through verbatim with 0, so the output is a full
    replacement corpus (the filter form is ``decontaminate``; the
    audit form is ``contaminated_ids``).

    Scale shape — the decontamination asymmetry, span-granular: the
    benchmark's distinct gram hashes are tiny (eval sets, not
    corpora) and BROADCAST, so finding cut witnesses is a broadcast
    semi-join against the corpus's zero-exchange gram projection —
    the corpus text reaches only the shared one-id-keyed-join rewrite
    tail, never a wide shuffle. ``broadcast_benchmark=False`` falls
    back to a hash-partitioned semi-join for an oversized benchmark.
    Gram identity is xxhash64 on both sides (collision ⇒ over-cut, the
    conservative direction); the DuckDB oracle joins gram strings and
    reproduces every clean_text on the fixtures. Docs (and benchmark
    entries) shorter than k tokens emit no k-grams: a sub-k benchmark
    fragment cannot anchor a cut — choose k accordingly.
    """
    from parallel_svms_spark.operators.dedup import (_gram_positions,
                                                     _rewrite_without,
                                                     shingles_col)
    k = int(k)
    assert k >= 2
    bench = (benchmark
             .filter(F.col(text_col).isNotNull())
             .filter(F.size(F.split(F.col(text_col), " ")) >= k)
             .select(F.explode(F.array_distinct(
                 shingles_col(text_col, k))).alias("shingle"))
             .select(F.xxhash64("shingle").alias("g"))
             .distinct())
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    witnesses = (_gram_positions(corpus, k, id_col, text_col)
                 .join(bench, "g", "left_semi")
                 .select("doc_id", "pos"))
    return _rewrite_without(corpus, witnesses, k, id_col, text_col)


def corpus_shingle_source_counts(corpus: DataFrame, k: int = 3,
                                 id_col: str = "doc_id",
                                 text_col: str = "text",
                                 source_col: str = "source"
                                 ) -> DataFrame:
    """(shingle, source, n_cdocs): the corpus side of BOTH leakage
    audits, pre-collapsed to one row per (shingle, source) with a
    distinct-doc count — map-side-combinable, bounded by |shingle
    vocabulary| × |sources|. ``contamination_sources`` consumes it
    as-is; ``contamination_report``'s per-shingle counts are this
    rollup summed over sources (every corpus doc carries exactly one
    source, so the per-source distinct-doc sets are disjoint and
    their counts add). Factored out (r10) so one suite/session can
    compute the rollup once for both audits."""
    k = int(k)
    return (corpus
            .filter(F.col(text_col).isNotNull())
            .select(F.col(source_col).alias("source"),
                    F.col(id_col).alias("cdoc"),
                    F.explode(F.array_distinct(
                        shingles_col(text_col, k))).alias("shingle"))
            .groupBy("shingle", "source")
            .agg(F.countDistinct("cdoc").alias("n_cdocs")))


def contamination_sources(corpus: DataFrame, benchmark: DataFrame,
                          k: int = 3, id_col: str = "doc_id",
                          text_col: str = "text",
                          source_col: str = "source",
                          source_rollup: DataFrame | None = None
                          ) -> DataFrame:
    """Source-attributed leakage audit (r10 — VERDICT r9 #3): for
    each (benchmark doc, corpus SOURCE) pair, how much of the eval
    item leaks from THAT source — the number that decides mixture
    surgery ("drop the source") vs eval surgery ("drop the item"),
    which ``contamination_report``'s corpus-wide rollup cannot: one
    eval item at leak_ppm 900k from a single crawl dump is a
    drop-the-source case; the same ppm spread evenly over every
    source is a drop-the-item case.

    Output: (doc_id, source, n_shingles, n_leaked, leak_ppm,
    corpus_doc_hits) — one row per (benchmark doc, source) with at
    least one leaked shingle (clean combinations are absent: emitting
    |bench| × |sources| explicit zeros buys nothing the absent-row
    convention doesn't); ``n_shingles`` is the benchmark doc's
    distinct-shingle count (per-doc constant, repeated per source so
    every row is self-contained), ``leak_ppm`` the exact LONG ppm of
    them appearing in that source, ``corpus_doc_hits`` the
    (shingle × source-doc) incidence volume.

    Scale shape: the corpus side is pre-collapsed to one row per
    (shingle, source) carrying a distinct-doc count — a map-side-
    combinable aggregation bounded by |shingle vocabulary| ×
    |sources| — before anything joins; the benchmark side is small
    by definition. The join therefore carries the per-source shingle
    vocabulary, never documents — ``contamination_report``'s shape
    with one extra grouping column (and the same no-corpus-broadcast
    rule). ``source_rollup``: pass a precomputed
    ``corpus_shingle_source_counts`` frame (same corpus/k) to skip
    the corpus pass — the suite-scoped sharing hook (r10)."""
    k = int(k)
    bsh = (benchmark
           .filter(F.col(text_col).isNotNull())
           .select(F.col(id_col).alias("doc_id"),
                   F.explode(F.array_distinct(
                       shingles_col(text_col, k))).alias("shingle")))
    csh = source_rollup if source_rollup is not None else \
        corpus_shingle_source_counts(corpus, k, id_col, text_col,
                                     source_col)
    sizes = bsh.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"))
    hits = (bsh.join(csh, "shingle")
            .groupBy("doc_id", "source")
            .agg(F.count("*").alias("n_leaked"),
                 F.sum("n_cdocs").alias("hits")))
    return (hits.join(sizes, "doc_id")
            .select("doc_id", "source",
                    F.col("n_shingles").cast("long").alias("n_shingles"),
                    F.col("n_leaked").cast("long").alias("n_leaked"),
                    F.expr("n_leaked * 1000000 DIV n_shingles")
                    .cast("long").alias("leak_ppm"),
                    F.col("hits").cast("long")
                    .alias("corpus_doc_hits")))


def contamination_report(corpus: DataFrame, benchmark: DataFrame,
                         k: int = 3, id_col: str = "doc_id",
                         text_col: str = "text",
                         source_rollup: DataFrame | None = None
                         ) -> DataFrame:
    """Per-BENCHMARK-item leakage audit (r9) — the reverse direction
    of ``decontaminate``: instead of asking "which corpus docs are
    tainted" it asks "which EVAL ITEMS are compromised, and how
    badly" — the number an evaluation-integrity report publishes
    before anyone trusts a benchmark score on a model trained on this
    corpus. For each benchmark doc: how many of its distinct
    k-shingles appear anywhere in the corpus, in exact LONG ppm
    (the ``ratio_ppm`` convention), plus the total (shingle ×
    corpus-doc) incidence count — a volume signal: one viral quote
    reads high incidence at low leak_ppm, verbatim leakage reads
    high leak_ppm. (Distinct-corpus-doc counting would need a
    per-(bench-doc, corpus-doc) pair expansion — deliberately NOT
    done; incidences come free from the per-shingle rollup.)

    Output: (doc_id, n_shingles, n_leaked, leak_ppm, corpus_doc_hits)
    — one row per non-NULL-text benchmark doc, zeros when clean, so
    the column is directly filterable (e.g. drop eval items with
    leak_ppm > threshold instead of scrubbing the corpus).

    Scale shape: the benchmark side is small by definition — its
    distinct (doc, shingle) pairs build one side of a hash join; the
    corpus side is the same zero-exchange distinct-shingle projection
    every decontaminate variant uses, reduced FIRST to one row per
    (shingle, corpus-doc) and then to per-shingle corpus-doc counts
    (map-side-combinable), so the join carries |corpus shingle
    vocabulary| rows at most once, never documents. No broadcast of
    the corpus side is ever attempted.

    ``source_rollup``: pass a precomputed
    ``corpus_shingle_source_counts`` frame (same corpus/k) to derive
    the per-shingle counts by one sum over sources instead of
    re-scanning the corpus — exact because every corpus doc carries
    one source, so per-source distinct-doc counts add (the
    suite-scoped sharing hook, r10).
    """
    k = int(k)
    bsh = (benchmark
           .filter(F.col(text_col).isNotNull())
           .select(F.col(id_col).alias("doc_id"),
                   F.explode(F.array_distinct(
                       shingles_col(text_col, k))).alias("shingle")))
    if source_rollup is not None:
        csh = (source_rollup.groupBy("shingle")
               .agg(F.sum("n_cdocs").alias("n_cdocs")))
    else:
        csh = (corpus
               .filter(F.col(text_col).isNotNull())
               .select(F.col(id_col).alias("cdoc"),
                       F.explode(F.array_distinct(
                           shingles_col(text_col, k))).alias("shingle"))
               .groupBy("shingle")
               .agg(F.countDistinct("cdoc").alias("n_cdocs")))
    joined = (bsh.join(csh, "shingle", "left")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_shingles"),
                   F.sum(F.when(F.col("n_cdocs").isNotNull(), 1)
                         .otherwise(0)).alias("n_leaked"),
                   F.sum(F.coalesce("n_cdocs", F.lit(0)))
                   .alias("hits")))
    return joined.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_leaked").cast("long").alias("n_leaked"),
        F.expr("n_leaked * 1000000 DIV n_shingles").cast("long")
        .alias("leak_ppm"),
        F.col("hits").cast("long").alias("corpus_doc_hits"))
