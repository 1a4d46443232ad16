"""Surgical (span-level) decontamination — r8."""

from __future__ import annotations

import pytest

from parallel_svms_spark.io.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")



def test_decontaminate_surgical_hand_case(spark):
    """Cuts exactly the benchmark-overlapping run, keeps the rest;
    clean docs pass through verbatim; NULL text excluded."""
    from parallel_svms_spark.operators import contamination as C
    bench = spark.createDataFrame(
        [(1, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(10, "intro words then the secret benchmark answer is"
              " forty two exactly and a tail"),
         (11, "totally unrelated training document with many words"),
         (12, None)],
        "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_removed_tokens)
           for r in C.decontaminate_surgical(corpus, bench).collect()}
    assert set(got) == {10, 11}
    assert got[10] == ("intro words then and a tail", 8)
    assert got[11][1] == 0 and got[11][0].startswith("totally")


def test_decontaminate_surgical_vs_whole_doc(spark, docs):
    """On the fixture at the same k: the docs surgical cuts anything
    from are EXACTLY the docs whole-doc decontamination would drop
    (both anchor on shared k-grams; every fixture doc is >= k tokens
    so the <k shingle fallback never diverges), and surgical always
    keeps strictly more tokens than dropping."""
    from pyspark.sql import functions as F

    from parallel_svms_spark.operators import contamination as C
    corpus = docs.filter("source <> 'src0'")
    bench = docs.filter("source = 'src0'")
    assert corpus.filter(F.size(F.split("text", " ")) < 5).count() == 0
    sur = C.decontaminate_surgical(corpus, bench)
    cut_ids = {r.doc_id for r in
               sur.filter("n_removed_tokens > 0").collect()}
    dropped = {r.doc_id for r in
               C.contaminated_ids(corpus, bench, k=5).collect()}
    assert cut_ids == dropped and cut_ids
    # tokens kept by surgery on contaminated docs > 0 somewhere
    # (whole-doc dropping would lose them all)
    kept = (sur.filter("n_removed_tokens > 0")
            .agg(F.sum(F.when(F.col("clean_text") == "", 0)
                       .otherwise(F.size(F.split("clean_text", " "))))
                 .alias("s")).first().s)
    assert kept > 0


def test_contamination_report_hand_computed(spark):
    """r9 audit twin: fully-leaked item reads 10^6 ppm, clean item 0,
    partial in between; incidence counts corpus copies, a row per
    benchmark doc either way."""
    from parallel_svms_spark.operators import contamination as CN

    leaked = "a1 a2 a3 a4 a5"      # 3 shingles at k=3
    corpus = spark.createDataFrame(
        [(1, leaked + " corpus tail"),
         (2, leaked + " another copy"),
         (3, "completely unrelated corpus words here")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(10, leaked),                            # fully leaked
         (11, "b1 b2 b3 " + "a1 a2 a3"),          # partial: 1 of 4
         (12, "c1 c2 c3 c4 c5")],                 # clean
        "doc_id long, text string")
    got = {r.doc_id: (r.n_shingles, r.n_leaked, r.leak_ppm,
                      r.corpus_doc_hits)
           for r in CN.contamination_report(corpus, bench).collect()}
    # doc 10: 3 shingles all leaked; each appears in corpus docs 1+2
    assert got[10] == (3, 3, 1_000_000, 6)
    # doc 11: shingles {b1 b2 b3, b2 b3 a1, b3 a1 a2, a1 a2 a3} —
    # only "a1 a2 a3" leaks (2 corpus copies)
    assert got[11] == (4, 1, 250_000, 2)
    assert got[12] == (3, 0, 0, 0)


def test_contamination_sources_hand_computed(spark):
    """r10 source attribution: the per-source split of the report —
    a leak concentrated in one source (mixture surgery) reads
    differently from the same ppm spread across sources (eval
    surgery). Hand-computed on a planted corpus."""
    from parallel_svms_spark.operators import contamination as CN

    leaked = "a1 a2 a3 a4 a5"      # 3 shingles at k=3
    corpus = spark.createDataFrame(
        [(1, "crawlA", leaked + " corpus tail"),
         (2, "crawlA", leaked + " another copy"),
         (3, "crawlB", "completely unrelated corpus words here"),
         (4, "crawlB", "b1 b2 b3 x9")],
        "doc_id long, source string, text string")
    bench = spark.createDataFrame(
        [(10, leaked),                            # all from crawlA
         (11, "b1 b2 b3 " + "a1 a2 a3"),          # split sources
         (12, "c1 c2 c3 c4 c5")],                 # clean
        "doc_id long, text string")
    got = {(r.doc_id, r.source): (r.n_shingles, r.n_leaked,
                                  r.leak_ppm, r.corpus_doc_hits)
           for r in CN.contamination_sources(corpus, bench).collect()}
    # doc 10: 3 shingles, all in crawlA only (2 docs each)
    # doc 11: shingles {b1 b2 b3, b2 b3 a1, b3 a1 a2, a1 a2 a3} —
    #   "a1 a2 a3" in crawlA (2 docs), "b1 b2 b3" in crawlB (1 doc)
    assert got == {(10, "crawlA"): (3, 3, 1_000_000, 6),
                   (11, "crawlA"): (4, 1, 250_000, 2),
                   (11, "crawlB"): (4, 1, 250_000, 1)}
    # consistency with the corpus-wide report: per-doc leaked counts
    # are NOT additive across sources (a shingle may leak from many)
    # but hits are
    rep = {r.doc_id: r.corpus_doc_hits
           for r in CN.contamination_report(corpus, bench).collect()}
    import collections
    hits = collections.Counter()
    for (d, _s), (_, _, _, h) in got.items():
        hits[d] += h
    assert all(rep[d] == hits.get(d, 0) for d in rep)


def test_report_and_sources_from_shared_rollup_equivalent(spark, docs):
    """r10 sharing hook: contamination_report derived from the
    per-(shingle, source) rollup (sum over sources) must equal the
    direct per-shingle computation row-for-row, and
    contamination_sources fed the precomputed rollup must equal its
    self-computed form — the exactness argument (one source per
    corpus doc => per-source distinct-doc counts add) checked on the
    real fixture, not argued."""
    from parallel_svms_spark.operators import contamination as C
    corpus = docs.filter("source <> 'src0'")
    bench = docs.filter("source = 'src0'")
    rollup = C.corpus_shingle_source_counts(corpus, k=3)
    direct_r = C.contamination_report(corpus, bench)
    shared_r = C.contamination_report(corpus, bench,
                                      source_rollup=rollup)
    assert direct_r.exceptAll(shared_r).count() == 0
    assert shared_r.exceptAll(direct_r).count() == 0
    direct_s = C.contamination_sources(corpus, bench)
    shared_s = C.contamination_sources(corpus, bench,
                                       source_rollup=rollup)
    assert direct_s.exceptAll(shared_s).count() == 0
    assert shared_s.exceptAll(direct_s).count() == 0
