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
