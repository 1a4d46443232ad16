"""Text analysis operators for training-data pipelines (SURVEY §2.8 E4).

Language-ID, quality scoring, token statistics and document
fingerprinting — all pure JVM-side expressions (split/filter/aggregate
on arrays) so they run inside whole-stage codegen: at 100 TB these are
single narrow map stages plus one small aggregation, nothing leaves
the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallel_svms_spark.io.sources import ensure_parallelism, let_col

from parallel_svms_spark.operators.dedup import shingles_col, tokens_col

# tiny deterministic stopword sets per language for the n-gram/stopword
# heuristic language scorer (public-knowledge word lists)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "und", "das", "ist", "von", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "les"],
    "zh": ["de", "shi", "le", "bu", "wo", "zai", "you", "he"],
}

STOPWORDS = LANG_MARKERS["en"]


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-(lang, source) token statistics rollup."""
    toks = tokens_col("text")
    per_doc = documents.select(
        "lang", "source",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_text"),
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"),
             F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
             F.round(F.avg("n_chars_text"), 6).alias("avg_chars"))
    )


def token_count(documents: DataFrame, bpe_like: bool = False) -> DataFrame:
    """Per-doc token counts: whitespace tokens and a BPE-ish proxy
    (≈ chars/4 + wordpiece splits on non-alpha boundaries) — the
    standard pre-tokenizer estimate for budget planning."""
    toks = tokens_col("text")
    ws = F.size(toks)
    # BPE-ish: every ~4 chars is a subword token, min one per word
    bpe = F.greatest(ws, F.ceil(F.length("text") / 4)).cast("long")
    return documents.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_est_tokens"))


def quality_cols(text_col: str = "text"):
    """The quality heuristic as reusable JVM expressions
    (n_tokens, mean_token_len, stopword_ratio, quality) — shared by
    ``quality_score``, ``quality_filter`` and the streaming screen
    (streaming/windows.streaming_quality_screen) so the batch and
    stream paths compute the IDENTICAL score by construction.

    score = 0.4·len_ok + 0.3·stopword_component + 0.3·token_len_ok
    """
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, sw))  # distinct-marker hits
    stop_ratio = F.round(n_stop / F.lit(float(len(STOPWORDS))), 6)
    mean_tok_len = (F.length(text_col) - n_tok + 1) / n_tok
    len_ok = ((n_tok >= 10) & (n_tok <= 100000)).cast("double")
    tok_len_ok = ((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)).cast("double")
    score = F.round(0.4 * len_ok + 0.3 * stop_ratio + 0.3 * tok_len_ok, 6)
    return n_tok, mean_tok_len, stop_ratio, score


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic doc quality: length band + stopword ratio + mean
    token length (the C4/Gopher-style filter family, deterministic).
    """
    n_tok, mean_tok_len, stop_ratio, score = quality_cols("text")
    return documents.select(
        "doc_id", n_tok.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"))


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language scorer: argmax over per-language hit
    counts; ties resolve to the alphabetically first language,
    zero evidence → 'und'. Deterministic and fully JVM-side
    (greatest over per-lang scores)."""
    toks = F.array_distinct(tokens_col("text"))
    scores = {
        lang: F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # iterate in reverse alpha order so earlier langs win ties via the
    # final when() chain (deterministic)
    for lang in sorted(scores, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return documents.select("doc_id", "lang",
                            pred.alias("pred_lang"), best.alias("evidence"))


def doc_fingerprint(documents: DataFrame, k: int = 3) -> DataFrame:
    """Content fingerprint: min-of-hashed-shingles (winnowing-style,
    one value per doc). Engine-portable digest (md5) so the DuckDB
    oracle can reproduce it exactly."""
    sh = shingles_col("text", k)
    fp = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return ensure_parallelism(documents).select("doc_id", fp.alias("fingerprint"))


def winnow_fingerprints(documents: DataFrame, k: int = 3,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting scheme, r9): slide a
    w-window over the k-shingle md5 stream and keep each window's
    MINIMUM hash; the distinct minima are the document's fingerprint
    set. The paper's guarantee: any shared run of ≥ w + k − 1 tokens
    between two documents produces at least one SHARED fingerprint,
    at ~2/(w+1) of the shingle count stored — the LOCAL match signal
    ``doc_fingerprint``'s single global min cannot give (one
    boilerplate paragraph inside otherwise-different documents is
    invisible to a whole-doc min but guaranteed-caught here).
    Matching downstream is one equi-join on ``fp``.

    Scale shape: the shingle+md5 stream is the linear zip_with chain
    (``shingles_col``); window minima cost O(w) per position with the
    hash array LET-BOUND (an inline reference inside the transform
    lambda would recompute the whole stream per window —
    ``let_col``); output (doc_id, fp) rows are ~40 B each and ≤ the
    shingle count. The md5 HEX STRING is the fingerprint — no int
    conversion, identical lexicographic min in Spark and DuckDB (the
    ``doc_fingerprint`` precedent). Docs shorter than w + k − 1
    tokens fall back to their single global min (one fingerprint),
    so every non-NULL doc is representable."""
    k, w = int(k), int(w)
    assert k >= 1 and w >= 1
    hs = F.transform(shingles_col("text", k), lambda s: F.md5(s))
    mins = let_col(hs, lambda h: F.when(
        F.size(h) >= w, F.transform(
            F.sequence(F.lit(0), F.size(h) - w),
            lambda i: F.array_min(F.slice(h, i + 1, w))))
        .otherwise(F.array(F.array_min(h))))
    return (ensure_parallelism(documents)
            .filter(F.col("text").isNotNull())
            .select("doc_id",
                    F.explode(F.array_distinct(mins)).alias("fp")))


def vocab_topk(documents: DataFrame, top_n: int = 100) -> DataFrame:
    """Corpus vocabulary: the ``top_n`` most frequent whitespace
    tokens with deterministic (count DESC, token ASC) tie-break.

    Scale shape: explode → hash-partitioned count with MAP-SIDE
    partial aggregation (token cardinality ≪ token occurrences, so
    the exchange carries one row per distinct token per task, not one
    per occurrence); the top-N cut is orderBy+limit = TakeOrdered —
    per-partition heaps + a driver merge of N rows, never a global
    sort. The standard vocab-building pass before tokenizer training.
    """
    return (ensure_parallelism(documents)
            .select(F.explode(tokens_col("text")).alias("token"))
            .groupBy("token").agg(F.count("*").alias("freq"))
            .orderBy(F.col("freq").desc(), "token")
            .limit(int(top_n)))


def ngram_topk(documents: DataFrame, n: int = 2,
               top_n: int = 100) -> DataFrame:
    """Corpus-wide n-gram frequencies, top ``top_n`` with the same
    deterministic tie-break as ``vocab_topk``. Same scale shape —
    shingling is a narrow JVM map, the count is map-side partial.
    (Shingles shorter than ``n`` tokens fall back to the whole text,
    matching ``shingles_col``'s contract everywhere else.)"""
    return (ensure_parallelism(documents)
            .select(F.explode(shingles_col("text", n)).alias("ngram"))
            .groupBy("ngram").agg(F.count("*").alias("freq"))
            .orderBy(F.col("freq").desc(), "ngram")
            .limit(int(top_n)))


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Per-doc repetition signals — the Gopher-rule family (Rae et
    al. 2021, §A1.1: "fraction of duplicate content") expressed over
    token counts:

    - ``dup_token_ratio``: 1 − distinct/total tokens (how much of the
      doc is repeated words at all);
    - ``top_token_ratio``: occurrences of the single most frequent
      token / total (degenerate-repetition spike detector);
    - ``top_bigram_ratio``: same for word bigrams (catches "foo bar
      foo bar ..." loops that unigrams miss).

    Scale shape: ONE exchange total — the corpus is hash-repartitioned
    on doc_id up front, and because HashPartitioning(doc_id) satisfies
    every downstream clustering requirement here (groupBy(doc_id, g),
    groupBy(doc_id), the final doc_id join), both gram branches
    aggregate entirely locally and the join needs no shuffle; the two
    branches share the same exchange subtree (ReusedExchange). The
    plan-shape test pins this: token-level rows never enter an
    exchange. No Python anywhere.
    """
    by_doc = documents.repartition(F.col("doc_id"))

    def _per_gram(col: F.Column, out: str) -> DataFrame:
        return (by_doc
                .select("doc_id", F.explode(col).alias("g"))
                .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
                .groupBy("doc_id")
                .agg(F.sum("c").alias(f"n_{out}"),
                     F.count("*").alias(f"n_distinct_{out}"),
                     F.max("c").alias(f"top_{out}")))

    uni = _per_gram(tokens_col("text"), "tok")
    big = _per_gram(shingles_col("text", 2), "big")
    return (uni.join(big, "doc_id")
            .select(
                "doc_id",
                F.col("n_tok").alias("n_tokens"),
                F.round(1.0 - F.col("n_distinct_tok") / F.col("n_tok"), 6)
                .alias("dup_token_ratio"),
                F.round(F.col("top_tok") / F.col("n_tok"), 6)
                .alias("top_token_ratio"),
                F.round(F.col("top_big") / F.col("n_big"), 6)
                .alias("top_bigram_ratio")))


def tfidf_topk(documents: DataFrame, top_n: int = 5) -> DataFrame:
    """Per-doc top-``top_n`` terms by tf·idf (idf = ln(N/df), the
    textbook smooth-free variant), deterministic tie-break on token.
    The keyword-extraction / dedup-feature pass of a corpus pipeline.

    Scale shape: the corpus is hash-repartitioned on doc_id ONCE;
    HashPartitioning(doc_id) satisfies the (doc_id, token) tf
    aggregation, so it runs with no exchange of token-level rows, and
    the top-k window (also keyed doc_id) runs directly on the join
    output with no exchange either — Spark even plans a partial
    WindowGroupLimit so non-top-k rows die before any sort.  df = a
    second agg over the ALREADY-distinct (doc, token) rows (its
    exchange carries vocabulary-sized partials) broadcast back.
    Ordering uses the ROUNDED score (both engines round identically
    at 6 dp) so the oracle's ROW_NUMBER agrees.
    """
    n_docs = float(documents.count())
    tf = (documents.repartition(F.col("doc_id"))
          .select("doc_id", F.explode(tokens_col("text")).alias("token"))
          .groupBy("doc_id", "token").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    score = F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 6)
    from pyspark.sql import Window as W
    scored = (tf.join(F.broadcast(dfreq), "token")
              .select("doc_id", "token", "tf", score.alias("tfidf")))
    rn = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token"))
    return (scored.withColumn("rank", rn)
            .filter(F.col("rank") <= int(top_n)))


def length_profile(documents: DataFrame,
                   approx: bool = False) -> DataFrame:
    """Per-language corpus length profile: doc count plus p50/p90 of
    ``n_chars`` — the distribution snapshot every curation run records
    before/after filtering.

    ``approx=False`` (default, the verification twin) uses Spark's
    exact ``percentile`` — linear interpolation, matching DuckDB's
    ``quantile_cont`` bit-for-bit, which is what makes this
    oracle-checkable; its agg state is the per-group value multiset,
    fine up to millions of docs per group.  ``approx=True`` switches
    to ``approx_percentile`` (t-digest, bounded state) — the 100 TB
    path, same schema, accuracy traded for constant memory.
    """
    fn = "approx_percentile" if approx else "percentile"
    return (documents.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.expr(f"{fn}(n_chars, 0.5)"), 6).alias("p50_chars"),
        F.round(F.expr(f"{fn}(n_chars, 0.9)"), 6).alias("p90_chars")))


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """Corpus-LM quality proxy (the CCNet recipe, Wenzek et al. 2020:
    score each doc under a language model and filter on the score —
    here the LM is the corpus's own unigram distribution, the
    dependency-free variant): per doc, the mean negative log
    probability of its tokens, p(tok) = corpus_count(tok) / total.
    Low score ⇒ common-word text; high score ⇒ rare-token outliers
    (gibberish, boilerplate codes, wrong-language fragments).
    Returns (doc_id, n_tokens, nll) with nll rounded at 6 dp.

    Scale shape: one map-side-partial count keyed on token
    (vocabulary-bounded state, same exchange as ``vocab_topk``), the
    frequency table broadcast back (vocabulary ≪ corpus by Heaps'
    law), then a per-doc rollup whose partial aggregation collapses
    token rows map-side — token-level rows cross the wire once, in
    the count.
    """
    toks = (ensure_parallelism(documents)
            .select("doc_id", F.explode(tokens_col("text")).alias("token")))
    freq = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    # the corpus token total rides along as a broadcast ONE-ROW
    # aggregate (term_postings' scalar-reattach pattern) — NOT a
    # driver .collect(): the whole operator stays one lazy DAG with
    # zero eager jobs (pinned by a job-count test), and the total
    # branch reuses freq's exchange under AQE
    total = freq.agg(F.sum("cnt").alias("__total"))
    freq = freq.crossJoin(F.broadcast(total))
    nll = -F.log(F.col("cnt") / F.col("__total"))
    return (toks.join(F.broadcast(freq), "token")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.avg(nll), 6).alias("nll")))


def bigram_logprob(documents: DataFrame) -> DataFrame:
    """Order-sensitive corpus-LM quality proxy: per doc, the mean
    negative log CONDITIONAL probability of its adjacent token pairs,
    p(w2|w1) = corpus_count(w1,w2) / corpus_count(w1,·). The bigram
    upgrade of ``unigram_logprob``: scrambled or templated text that
    fools a unigram model (common words, wrong order) scores badly
    here. Scoring the corpus under itself means every observed bigram
    has count ≥ 1, so no smoothing term is needed.

    Scale shape: bigram extraction is pure JVM (``zip_with`` of two
    array slices — no self-join, no Python); the context-count table is
    two chained partial aggregations keyed on (w1,w2) then w1; the
    probability join is an equi-join on (w1,w2) that AQE broadcasts
    when the bigram vocabulary fits and shuffles otherwise (bigram
    vocab grows ~quadratically in unigram vocab, so unlike
    ``unigram_logprob`` it is NOT unconditionally broadcast); the
    per-doc rollup partial-aggregates bigram rows map-side.
    """
    toks = tokens_col("text")
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(F.slice(toks, 1, n), F.slice(toks, 2, n),
                       lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    bg = (ensure_parallelism(documents)
          .select("doc_id", F.explode(pairs).alias("b"))
          .select("doc_id", F.col("b.w1").alias("w1"),
                  F.col("b.w2").alias("w2")))
    cnt2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    cnt1 = cnt2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    nll = -F.log(F.col("c2") / F.col("c1"))
    return (bg.join(cnt2.join(cnt1, "w1"), ["w1", "w2"])
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.avg(nll), 6).alias("nll2")))


def quality_filter(documents: DataFrame, keep_frac: float = 0.5) -> DataFrame:
    """Per-source quality carving: keep each source's top
    ``keep_frac`` fraction of documents by the heuristic
    ``quality_score`` (ties broken by doc_id so the cut is
    deterministic and engine-reproducible). The classifier-threshold
    filtering step of a curation pipeline, quota'd per source so one
    high-scoring source can't crowd out the mixture.

    Exact per-group quota = the same rank-vs-count shape as
    ``mixture_sample``: per-source counts broadcast back, one window
    keyed on source. Same SCALE CAVEAT too — the rank sorts each
    source in one task; for billion-row sources switch the rank to a
    percentile threshold on the score distribution (approx_percentile
    per source, then a narrow filter) at the cost of a Binomial-sized
    cut.
    """
    from pyspark.sql import Window as W
    q = quality_score(documents).select("doc_id", "quality")
    scored = documents.select("doc_id", "source").join(q, "doc_id")
    cnt = (scored.groupBy("source").agg(F.count("*").alias("n_grp"))
           .withColumnRenamed("source", "__src"))
    rn = F.row_number().over(
        W.partitionBy("source").orderBy(F.col("quality").desc(), "doc_id"))
    want = F.ceil(F.expr(f"CAST('{float(keep_frac)!r}' AS DECIMAL(21,10))")
                  * F.col("n_grp")).cast("long")
    return (scored
            .join(F.broadcast(cnt),
                  F.col("source").eqNullSafe(F.col("__src")))
            .select("doc_id", "source", "quality", rn.alias("rn"),
                    want.alias("want"))
            .filter(F.col("rn") <= F.col("want"))
            .select("doc_id", "source", "quality"))


def boilerplate_score(documents: DataFrame, n: int = 3,
                      min_docs: int = 4,
                      broadcast_common: bool = True) -> DataFrame:
    """Cross-document boilerplate signal: per doc, the fraction of its
    DISTINCT word n-grams that recur in ≥ ``min_docs`` documents — the
    corpus-internal twin of ``decontaminate`` (C4-style repeated-span
    detection: navboxes, licence blocks, templated headers score high).
    Returns (doc_id, n_ngrams, n_common, boilerplate_frac).

    Scale shape: shingling is a narrow JVM map; the doc-frequency count
    is a hash aggregation with map-side partials whose state is one row
    per distinct n-gram (vocabulary-bounded, not corpus-bounded). The
    ≥min_docs survivors — the actual boilerplate set, tiny relative to
    the corpus — are broadcast for the membership mark, so the
    n-gram-level rows are exchanged exactly ONCE (for the count); the
    per-doc rollup re-uses the doc-local explode, never a second
    shuffle of gram rows.  If the common set outgrows broadcast (a
    pathologically templated corpus), ``broadcast_common=False`` falls
    back to a shuffle join keyed on the n-gram.
    """
    ex = (ensure_parallelism(documents)
          .select("doc_id",
                  F.explode(F.array_distinct(shingles_col("text", n)))
                  .alias("ng")))
    common = (ex.groupBy("ng").agg(F.count("*").alias("df"))
              .filter(F.col("df") >= int(min_docs))
              .select("ng", F.lit(1).alias("is_common")))
    if broadcast_common:
        common = F.broadcast(common)
    marked = ex.join(common, "ng", "left")
    frac = F.round(F.col("n_common") / F.col("n_ngrams"), 6)
    return (marked.groupBy("doc_id")
            .agg(F.count("*").alias("n_ngrams"),
                 F.sum(F.coalesce(F.col("is_common"), F.lit(0)))
                 .cast("long").alias("n_common"))
            .select("doc_id", "n_ngrams", "n_common",
                    frac.alias("boilerplate_frac")))


def clean_text_col(text_col: str = "text"):
    """The scrub normalization as a reusable Column expression —
    THE single definition shared by ``scrub_text``, the normalized
    dedup family and its streaming twin, so the normalization can
    never drift between them (each consumer's oracle re-states the
    same regex subset)."""
    email = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]+"
    out = F.lower(F.col(text_col))
    out = F.regexp_replace(out, email, "<email>")
    out = F.regexp_replace(out, r"[0-9]+", "<num>")
    out = F.regexp_replace(out, r" +", " ")
    return out


def scrub_text(documents: DataFrame) -> DataFrame:
    """Normalization/redaction pass: lowercase, mask emails →
    ``<email>``, mask digit runs → ``<num>``, collapse whitespace
    runs. One narrow codegen'd map — the cheap always-on hygiene
    stage of an ingest pipeline.

    Patterns deliberately stay in the regex subset with identical
    semantics in Java regex (Spark) and RE2 (DuckDB oracle): character
    classes, ``+`` quantifiers — no backrefs, no lookaround."""
    out = clean_text_col("text")
    return documents.select(
        "doc_id", out.alias("clean_text"),
        F.length(out).alias("clean_chars"))


def quality_deciles(documents: DataFrame, k: int = 10) -> DataFrame:
    """Corpus-wide quality decile per document: NTILE(k) over
    (quality, doc_id) — the binning step behind "train on the top-3
    deciles" curation policies.

    Uses partitioning.global_ntile's two-pass distributed rank, NOT a
    global window: an un-partitioned NTILE sorts the corpus in one
    task. The DuckDB oracle runs the literal NTILE window over the
    shared quality CTE and must hash-match — the distributed
    decomposition is value-identical (the quality score is rounded to
    6 dp before ordering, and doc_id breaks ties, so the order is
    total and engine-reproducible).
    """
    from parallel_svms_spark.operators.partitioning import global_ntile
    q = quality_score(documents).select("doc_id", "quality")
    return (global_ntile(q, ["quality", "doc_id"], k=k, out_col="decile")
            .select("doc_id", "quality", "decile"))


def compression_signals(documents: DataFrame, level: int = 6,
                        carry: tuple[str, ...] = ()) -> DataFrame:
    """Per-document zlib compressibility: ``(doc_id, [carry...],
    n_chars, comp_len, ratio)`` where ``comp_len =
    len(zlib.compress(utf8, level))`` and ``ratio = comp_len /
    n_chars`` (6 dp). The classic corpus-quality signal the JVM
    expression library cannot express: highly repetitive
    machine-generated boilerplate compresses far below prose, so a
    low ratio is a strong junk flag (the deflate-ratio screen
    described for MassiveText, Rae et al. 2021 §A.1.1) and a ratio
    near 1.0 marks random/encrypted bytes. zlib is a PURE function of
    the bytes, so the output is deterministic across runs, sessions
    and partitionings — which is what lets the per-source rollup pin
    a golden-literal oracle.

    The one justified Python hop in the text family: DEFLATE has no
    Catalyst expression, so this is an Arrow-batched ``mapInPandas``
    (never a row-at-a-time UDF) doing one C-speed zlib call per doc.
    Plan shape: a stateless narrow map over the scan — zero shuffle,
    zero state, embarrassingly parallel at any scale; ``carry``
    columns ride along inside the same Arrow batch so no join is
    needed to reattach metadata. Output is fixed-width, so return
    batches stay small even for MB-scale docs.
    """
    import zlib

    lvl = int(level)
    carry = tuple(carry)

    def run(it):
        import pandas as pd
        for pdf in it:
            if len(pdf) == 0:
                continue
            texts = pdf["text"]
            out = {"doc_id": pdf["doc_id"]}
            for c in carry:
                out[c] = pdf[c]
            out["n_chars"] = pd.Series([len(t) for t in texts],
                                       dtype="int64")
            out["comp_len"] = pd.Series(
                [len(zlib.compress(t.encode("utf-8"), lvl))
                 for t in texts], dtype="int64")
            yield pd.DataFrame(out)

    carry_schema = "".join(f", {c} string" for c in carry)
    out = (documents.select("doc_id", *carry, "text")
           .mapInPandas(run, schema=(f"doc_id long{carry_schema}, "
                                     "n_chars long, comp_len long")))
    return out.withColumn(
        "ratio", F.round(F.col("comp_len")
                         / F.greatest(F.col("n_chars"), F.lit(1)), 6))


def compression_profile(documents: DataFrame,
                        level: int = 6) -> DataFrame:
    """Per-source compressibility rollup — the monitoring view a
    corpus-quality dashboard actually shows: ``(source, n_docs,
    sum_chars, sum_comp, ratio_ppm)`` with ``ratio_ppm =
    floor(sum_comp · 10⁶ / sum_chars)`` in exact LONG arithmetic, so
    every column is integer and the result is FP-noise-free under any
    partitioning/merge order. One map-side-combinable group-by on top
    of the ``compression_signals`` map (shuffle ≤ |sources| partial
    rows; source rides the Arrow batch, no reattach join). The
    per-doc contract is pinned in pytest against direct zlib
    computation; the rollup pins a golden-literal oracle (zlib output
    is deterministic — verified across independent sessions at
    recording time, tools/record_goldens.py)."""
    sig = compression_signals(documents, level=level, carry=("source",))
    return (sig.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.sum("comp_len").alias("sum_comp"))
            .select("source", "n_docs", "sum_chars", "sum_comp",
                    # Integer DIV, not floor(double /): long/long in
                    # Spark is DOUBLE division, which loses exactness
                    # past 2^53 — at the 100 TB regime a source's
                    # sum_comp*1e6 exceeds that and the ppm could flip
                    # from FP rounding. DIV keeps the whole expression
                    # in exact LONG arithmetic; the product overflows
                    # BIGINT only past ~9.2 PB compressed per source.
                    F.expr("(sum_comp * CAST(1000000 AS BIGINT)) "
                           "DIV sum_chars").alias("ratio_ppm")))


def compression_screen(documents: DataFrame, min_ratio: float = 0.25,
                       level: int = 6) -> DataFrame:
    """The deflate-ratio junk GATE: keep only documents whose zlib
    ratio (see ``compression_signals``) is at least ``min_ratio`` —
    dropping the highly-repetitive machine-generated boilerplate that
    compresses far below prose. Passes every input column through
    unchanged (the filter decision is made INSIDE the Arrow batch, so
    no signal join / reattach is needed), which also makes it
    streaming-safe verbatim: stateless, each doc's fate depends only
    on its own bytes — ``streaming/windows.streaming_compression_screen``
    IS this function applied to an unbounded frame (equivalence-tested
    across micro-batch boundaries).
    """
    import zlib

    lvl = int(level)
    thr = float(min_ratio)
    schema = documents.schema

    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            keep = [
                len(zlib.compress(t.encode("utf-8"), lvl))
                / max(len(t), 1) >= thr
                for t in pdf["text"]
            ]
            out = pdf[keep]
            if len(out):
                yield out

    return documents.mapInPandas(run, schema=schema)


def quality_quantile_norm(documents: DataFrame) -> DataFrame:
    """Cross-source quality normalization: each document's quality
    score re-expressed as its PERCENTILE WITHIN ITS SOURCE
    (percent_rank over (quality, doc_id) — the doc_id tiebreak makes
    the rank, and therefore the oracle hash, deterministic). The
    mixture-building step that makes "top 30% of every source"
    meaningful when sources have incomparable raw score
    distributions (a web crawl's 0.6 is not a reference corpus's
    0.6) — rank-normalize first, THEN threshold or weight.

    Scale shape: one hash exchange on source + per-source sort —
    sources are the partition key, so parallelism = |sources| and the
    sort is per-source. SCALE CAVEAT (same as mixture_sample's): a
    billion-row source makes a single sort task; at that size trade
    exactness for the two-pass distributed histogram
    (``partitioning.grouped_deciles``'s machinery at finer bins) —
    rank from bin counts, error ≤ bin width.
    """
    from pyspark.sql import Window as W
    _, _, _, score = quality_cols("text")
    return (documents
            .select("doc_id", "source", score.alias("quality"))
            .withColumn("q_norm", F.round(
                F.percent_rank().over(
                    W.partitionBy("source")
                    .orderBy(F.col("quality").asc(), F.col("doc_id"))),
                6)))


def term_postings(documents: DataFrame, max_doc_freq: int | None = None,
                  max_df_frac: float | None = 0.2,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Inverted-index postings: one row per (token, document) with the
    occurrence count and first position — the IR primitive behind
    span-level contamination lookup, keyword search and collocation
    mining. Hot tokens are dropped — the stopword-posting cap every
    practical index applies (a token in every doc contributes |docs|
    rows and no selectivity; same default-on skew-guard contract as
    ``ngram_jaccard_pairs``' hot-shingle cap). The default cap is
    RELATIVE (``max_df_frac``: document frequency ≤ 20% of the
    corpus — the classic max-df rule), so the semantics survive
    corpus growth where any absolute cap eventually drops everything;
    ``max_doc_freq`` adds an absolute ceiling when both are set. The
    corpus size enters as a broadcast one-row count, not a driver
    action.

    Scale shape: posexplode is a narrow per-doc expansion; the
    (token, doc) aggregation is the one corpus-sized exchange
    (shuffles (token, doc_id, pos) triples — positions as ints, text
    never moves); the doc-frequency filter is a second, much smaller
    aggregation over the postings themselves plus a semi-join back.
    Postings are ≈ distinct-terms-per-doc rows/doc (~100 at 4 KB docs
    → 2.5 T posting rows at 25 B docs — partition by token hash and
    this is a boring linear shuffle, no task sees more than its hash
    range).

    DuckDB oracle: UNNEST ... WITH ORDINALITY reproduces positions.
    """
    toks = tokens_col(text_col)
    per = (documents
           .select(F.col(id_col),
                   F.posexplode(toks).alias("pos", "token"))
           .groupBy("token", id_col)
           .agg(F.count("*").alias("n_occ"),
                F.min("pos").cast("long").alias("first_pos")))
    dfreq = per.groupBy("token").agg(F.count("*").alias("df"))
    if max_doc_freq is not None:
        dfreq = dfreq.filter(F.col("df") <= int(max_doc_freq))
    if max_df_frac is not None:
        # scalar reattach: the corpus total is a ONE-ROW aggregate
        # broadcast over the df table (plans BroadcastNestedLoop —
        # benign at |build| = 1; heavy_keys' audited pattern, pinned
        # by a plan test + the SCALAR_REATTACH_OK audit exemption)
        total = documents.agg(F.count("*").alias("__n"))
        dfreq = (dfreq.crossJoin(F.broadcast(total))
                 .filter(F.col("df")
                         <= F.col("__n") * float(max_df_frac)))
    return (per.join(dfreq.select("token"), "token", "left_semi")
            .select("token", id_col, F.col("n_occ").cast("long")
                    .alias("n_occ"), "first_pos"))


def lang_confusion(documents: DataFrame) -> DataFrame:
    """Confusion matrix of the marker-word language scorer against the
    corpus's LABELED language column: (lang, pred_lang, n_docs) — the
    audit run before trusting ``lang_id`` as a routing/filter signal
    (a pipeline that drops non-English by prediction needs to know the
    per-language miss rate first; ``eval_confusion`` is the same
    methodology on the SVM side). One map-side-combinable aggregation
    over the zero-exchange scorer projection; output bounded by
    |langs|·(|langs|+1), never corpus rows.
    """
    return (lang_id(documents)
            .groupBy("lang", "pred_lang")
            .agg(F.count("*").alias("n_docs")))
