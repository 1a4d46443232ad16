"""Unit tests for the corpus-assembly operators added in r3:
decontamination, repetition stats, tf-idf, mixture sampling, and the
canonical-doc dedup output. Hand-computed expectations on crafted
micro-fixtures (the sf0.01 oracle comparison runs in selfcheck)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from parallel_svms_spark.operators import contamination as C
from parallel_svms_spark.operators import dedup as D
from parallel_svms_spark.operators import sharding as SH
from parallel_svms_spark.operators import text as TX


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon", "en", "bench"),
        (1, "alpha beta gamma delta something else entirely", "en", "web"),
        (2, "completely different words here nothing shared", "en", "web"),
        (3, "alpha beta gamma delta epsilon zeta", "en", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string, source string")


def test_decontaminate_removes_overlapping_docs(tiny_docs):
    bench = tiny_docs.filter("source = 'bench'")
    corpus = tiny_docs.filter("source = 'web'")
    kept = sorted(r.doc_id for r in
                  C.decontaminate(corpus, bench, k=4).collect())
    # docs 1 and 3 share the 4-shingle "alpha beta gamma delta"
    assert kept == [2]


def test_decontaminate_min_overlap_threshold(tiny_docs):
    bench = tiny_docs.filter("source = 'bench'")
    corpus = tiny_docs.filter("source = 'web'")
    # doc 1 shares one distinct 4-shingle with the benchmark; doc 3
    # shares two ("alpha beta gamma delta", "beta gamma delta epsilon")
    # — at min_overlap=2 only doc 3 is contaminated
    kept = sorted(r.doc_id for r in
                  C.decontaminate(corpus, bench, k=4,
                                  min_overlap=2).collect())
    assert kept == [1, 2]


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame([(7, "x x x y")], "doc_id long, text string")
    row = TX.repetition_stats(df).collect()[0]
    assert row.n_tokens == 4
    assert row.dup_token_ratio == pytest.approx(0.5)        # 1 - 2/4
    assert row.top_token_ratio == pytest.approx(0.75)       # x: 3/4
    # bigrams: "x x", "x x", "x y" → top 2 of 3
    assert row.top_bigram_ratio == pytest.approx(round(2 / 3, 6))


def test_tfidf_topk_hand_computed(spark):
    df = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry")],
        "doc_id long, text string")
    out = {(r.doc_id, r.token): (r.tf, r.tfidf, r.rank)
           for r in TX.tfidf_topk(df, top_n=2).collect()}
    ln2 = math.log(2.0)
    # banana appears in both docs → idf = ln(2/2) = 0 → score 0
    assert out[(0, "apple")] == (2, round(2 * ln2, 6), 1)
    assert out[(0, "banana")][1] == 0.0
    assert out[(1, "cherry")] == (1, round(ln2, 6), 1)
    assert out[(1, "banana")] == (1, 0.0, 2)


def test_mixture_sample_sizes_and_determinism(spark, sf_dir):
    from parallel_svms_spark.io.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    rates = {"src0": 0.5, "src1": 0.25}
    got = SH.mixture_sample(docs, rates=rates, default_rate=0.1)
    sizes = {r.source: r.n for r in
             got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    base = {r.source: r.n for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in base.items():
        want = math.ceil(rates.get(src, 0.1) * n)
        assert sizes.get(src, 0) == want, src
    # deterministic: same rows on a second run
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, SH.mixture_sample(
        docs, rates=rates, default_rate=0.1).collect()))
    assert a == b


def test_keep_canonical_reps_and_singletons(spark):
    rows = [(i, "unique words only doc %d distinct tokens" % i)
            for i in range(4)]
    # docs 10 and 11 are near-identical → one survivor (10)
    rows += [(10, "the quick brown fox jumps over the lazy dog today"),
             (11, "the quick brown fox jumps over the lazy dog tonight")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in
                  D.keep_canonical(df, k=3, threshold=0.5).collect())
    assert kept == [0, 1, 2, 3, 10]


def test_new_ops_empty_and_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, "
                                      "lang string, source string")
    one = spark.createDataFrame(
        [(0, "solo doc text here", "en", "web")],
        "doc_id long, text string, lang string, source string")
    # empty benchmark → nothing contaminated, corpus unchanged
    assert C.decontaminate(one, empty, k=4).count() == 1
    # empty corpus → empty out, no crash on either side
    assert C.decontaminate(empty, one, k=4).count() == 0
    assert TX.tfidf_topk(empty).count() == 0
    assert TX.repetition_stats(empty).count() == 0
    assert D.keep_canonical(empty).count() == 0
    # rate > 1 keeps every row (row_number never exceeds group size)
    assert SH.mixture_sample(one, rates={"web": 1.5}).count() == 1


def test_scrub_text_idempotent(spark, sf_dir):
    from pyspark.sql import functions as F2
    from parallel_svms_spark.io.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    once = TX.scrub_text(docs)
    twice = TX.scrub_text(once.select(
        "doc_id", F2.col("clean_text").alias("text")))
    joined = (once.alias("a").join(twice.alias("b"), "doc_id")
              .filter(F2.col("a.clean_text") != F2.col("b.clean_text")))
    assert joined.count() == 0


def test_mixture_sample_hash_rate_and_no_shuffle(spark, sf_dir):
    from parallel_svms_spark.io.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    got = SH.mixture_sample_hash(docs, rates={"src0": 1.0},
                                 default_rate=0.0)
    # rate 1.0 keeps (almost) everything in the group, 0.0 nothing else
    n_src0 = docs.filter("source = 'src0'").count()
    assert got.filter("source <> 'src0'").count() == 0
    assert got.count() >= n_src0 - 1  # 1.0 threshold is ffffffff-capped
    # the whole sampler must be a narrow filter: zero exchanges
    p = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p
    # membership of a row is independent of other sources' rates
    a = {r.doc_id for r in SH.mixture_sample_hash(
        docs, rates={"src0": 0.3}).filter("source = 'src0'").collect()}
    b = {r.doc_id for r in SH.mixture_sample_hash(
        docs, rates={"src0": 0.3, "src9": 0.9})
        .filter("source = 'src0'").collect()}
    assert a == b


def test_weighted_sample_extremes_monotone_no_shuffle(spark, sf_dir):
    from pyspark.sql import functions as F

    from parallel_svms_spark.io.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    # weight 0 keeps nothing; weight ≥ 1 keeps everything but the
    # ffffffff cap sliver
    assert SH.weighted_sample(docs, F.lit(0.0)).count() == 0
    assert SH.weighted_sample(docs, F.lit(5.0)).count() >= n - 1
    # per-row monotonicity: a row kept at weight w stays kept at 2w
    lo = {r.doc_id for r in SH.weighted_sample(
        docs, F.col("n_chars") / 4000.0).select("doc_id").collect()}
    hi = {r.doc_id for r in SH.weighted_sample(
        docs, F.col("n_chars") / 2000.0).select("doc_id").collect()}
    assert lo <= hi
    # the sampler must stay a narrow codegen'd filter: zero exchanges
    p = (SH.weighted_sample(docs, F.col("n_chars") / 2000.0)
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in p, p


def test_length_profile_approx_variant_same_schema(spark, sf_dir):
    from parallel_svms_spark.io.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    exact = TX.length_profile(docs, approx=False)
    approx = TX.length_profile(docs, approx=True)
    assert exact.columns == approx.columns
    e = {r.lang: r.p50_chars for r in exact.collect()}
    a = {r.lang: r.p50_chars for r in approx.collect()}
    # t-digest medians stay close to exact on the fixture
    for lang in e:
        assert abs(e[lang] - a[lang]) <= max(5.0, 0.05 * e[lang]), lang


# --- r10: temperature-scaled mixture sampling ---------------------------

def test_mixture_temperature_alpha_one_is_natural(spark, sf_dir):
    # α = 1 → p_i ∝ m_i → rate_i = target_frac for EVERY source (the
    # natural distribution needs no re-balancing)
    from parallel_svms_spark.io.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    out = SH.mixture_sample_temperature(docs, alpha=1.0, target_frac=0.5)
    rates = {r.rate for r in out.select("rate").distinct().collect()}
    assert rates == {0.5}


def test_mixture_temperature_upweights_small_sources(spark):
    # one dominant source, one tiny one: α < 1 must give the tiny
    # source a HIGHER keep-rate than the dominant one
    rows = [(i, "w " * 20, "big") for i in range(400)]
    rows += [(1000 + i, "w " * 20, "small") for i in range(20)]
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows],
        "doc_id long, text string, source string")
    out = SH.mixture_sample_temperature(df, alpha=0.3, target_frac=0.5)
    rates = {r.source: r.rate for r in
             out.select("source", "rate").distinct().collect()}
    assert rates["small"] > rates["big"]
    # extreme temperature α=0 equalizes EXPECTED TOKENS per source:
    # rate_small/rate_big = m_big/m_small = 20 (clamped at 1)
    out0 = SH.mixture_sample_temperature(df, alpha=0.0, target_frac=0.2)
    r0 = {r.source: r.rate for r in
          out0.select("source", "rate").distinct().collect()}
    assert r0["small"] == 1.0  # 0.2·420·20/(2·20) = 42 tokens/20 → clamp
    assert r0["big"] < 0.25


def test_mixture_temperature_deterministic_and_null_safe(spark, sf_dir):
    from parallel_svms_spark.io.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, SH.mixture_sample_temperature(
        docs, alpha=0.3, target_frac=0.9).collect()))
    b = sorted(map(tuple, SH.mixture_sample_temperature(
        docs, alpha=0.3, target_frac=0.9).collect()))
    assert a == b and len(a) > 0
    # NULL text rows are excluded; NULL source forms its own group
    df = spark.createDataFrame(
        [(1, None, "s"), (2, "a b c", None), (3, "a b", "s")],
        "doc_id long, text string, source string")
    got = {r.doc_id for r in SH.mixture_sample_temperature(
        df, alpha=0.5, target_frac=1.0).collect()}
    assert 1 not in got and got == {2, 3}  # frac=1 keeps all non-null


def test_mixture_temperature_no_window_no_wide_exchange(spark, sf_dir):
    # the scale contract: corpus rows never ride a wide exchange —
    # only the |sources|-row mass agg shuffles; the rate join is
    # broadcast and the membership filter is a codegen'd projection
    from parallel_svms_spark.io.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    p = (SH.mixture_sample_temperature(docs, alpha=0.3, target_frac=0.9)
         ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert "Python" not in p and "Pandas" not in p
    # the only nested-loop is the (Z, M) totals reattach — a one-row
    # build side over the |sources|-row rate table (never the corpus;
    # the SCALAR_REATTACH_OK claim in tools/plan_audit.py)
    if "BroadcastNestedLoopJoin" in p:
        assert "sum(w" in p and "CartesianProduct" not in p
